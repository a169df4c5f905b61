"""Pins for the URL/domain curation pair (operators/pipeline.py,
r13 VERDICT item 5): `domain_mix_report` and `domain_cap_docs`.

A 100-document fixture with doc_id 0..99 hits every `_DOMAIN_HOSTS`
bucket exactly at its designed share, so host/domain populations,
shares, ranks, and cap survivors are all hand-computable.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_to_parquet_spark.operators.pipeline import (
    _DOMAIN_CAP,
    _DOMAIN_HOSTS,
    _domain_frame,
    domain_cap_docs,
    domain_mix_report,
)


@pytest.fixture(scope="module")
def url_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("urldocs")
    # doc_id 0..99 covers each doc_id%100 bucket once; token count
    # varies 1..3 so token mass is not proportional to doc mass
    docs = pd.DataFrame(
        {
            "doc_id": range(100),
            "text": [" ".join(["tok"] * (i % 3 + 1)) for i in range(100)],
            "lang": ["en"] * 100,
            "source": ["web"] * 100,
            "n_chars": [3 * (i % 3 + 1) for i in range(100)],
        }
    )
    docs.to_parquet(root / "documents.parquet")
    return str(root)


def _bucket_host(i: int) -> str:
    for ub, host in _DOMAIN_HOSTS:
        if i % 100 < ub:
            return host
    raise AssertionError


def test_host_and_domain_extraction(spark, url_docs_dir):
    rows = _domain_frame(spark, url_docs_dir).collect()
    assert len(rows) == 100
    for r in rows:
        host = _bucket_host(r["doc_id"])
        assert r["host"] == host
        assert r["domain"] == ".".join(host.split(".")[-2:])
        assert r["n_tok"] == r["doc_id"] % 3 + 1


def test_mix_report_hand_computed(spark, url_docs_dir):
    rows = {r["domain"]: r for r in domain_mix_report(spark, url_docs_dir).collect()}
    # 12 hosts collapse to 11 registrable domains: shop. and reviews.
    # both roll into products.example
    assert len(rows) == 11
    assert rows["products.example"]["n_hosts"] == 2
    assert rows["products.example"]["n_docs"] == 2  # doc_id 97, 98
    # commoncrawl.example: doc_id 0..29 -> 30 docs, tokens 1+2+3 per
    # triple * 10 = 60
    cc = rows["commoncrawl.example"]
    assert (cc["n_hosts"], cc["n_docs"], cc["n_tokens"]) == (1, 30, 60)
    assert cc["doc_share"] == 30 / 100
    total_tok = sum(r["n_tokens"] for r in rows.values())
    assert cc["token_share"] == 60 / total_tok
    assert cc["token_rank"] == 1
    # shares sum to 1 exactly-ish and ranks are a permutation
    assert sorted(r["token_rank"] for r in rows.values()) == list(range(1, 12))
    assert abs(sum(r["doc_share"] for r in rows.values()) - 1.0) < 1e-12


def test_cap_keeps_first_k_by_doc_id(spark, url_docs_dir):
    out = domain_cap_docs(spark, url_docs_dir)
    kept = {r["doc_id"]: r for r in out.collect()}
    # commoncrawl.example holds doc_id 0..29; the cap keeps the 25
    # smallest ids with ranks 1..25
    assert all(i in kept for i in range(_DOMAIN_CAP))
    assert all(i not in kept for i in range(_DOMAIN_CAP, 30))
    assert kept[0]["rank_in_domain"] == 1
    assert kept[24]["rank_in_domain"] == 25
    # under-cap domains keep everything (products.example: 2 docs)
    assert kept[97]["domain"] == "products.example"
    assert kept[98]["domain"] == "products.example"
    # no domain exceeds the cap
    over = (
        out.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > _DOMAIN_CAP)
        .count()
    )
    assert over == 0


def test_cap_on_shipped_corpus(spark, sf_dir):
    out = domain_cap_docs(spark, sf_dir)
    assert out.count() > 0
    assert (
        out.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > _DOMAIN_CAP)
        .count()
        == 0
    )
