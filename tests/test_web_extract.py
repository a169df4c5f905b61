"""Pins for the r15 web-pipeline additions (operators/pipeline.py):

- `url_denylist_filter`: priority-ordered regex deny rules over the
  synthesized URL, first match wins — hand-computed rule assignment on
  a fixture that hits every rule arm, share conservation, and the
  first-match-wins precedence pins;
- `html_boilerplate_extract`: deterministic markup synthesis + the
  strip-boilerplate/strip-tags extraction — fully hand-computed
  metrics on the no-arm document, arm coverage (ads / related-links),
  and corpus invariants.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_to_parquet_spark.operators.pipeline import (
    _URL_DENY_RULES,
    html_boilerplate_extract,
    url_denylist_filter,
)


def _docs(ids_texts):
    return pd.DataFrame(
        {
            "doc_id": [i for i, _ in ids_texts],
            "text": [t for _, t in ids_texts],
            "lang": ["en"] * len(ids_texts),
            "source": ["s"] * len(ids_texts),
            "n_chars": [len(t) for _, t in ids_texts],
        }
    )


# -- url_denylist_filter -----------------------------------------------------


@pytest.fixture(scope="module")
def deny_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("denydocs")
    # doc_id -> host arm (doc_id % 100 against _DOMAIN_HOSTS' cumulative
    # bounds): <30 pages.commoncrawl, [50,62) forum.discussions,
    # [97,98) shop.products, [98,99) reviews.products
    _docs(
        [
            (0, "two tokens"),      # commoncrawl, no 7 -> kept
            (12, "one two three"),  # commoncrawl -> kept
            (117, "a b"),           # commoncrawl host, /doc/117 -> spam
            (55, "x"),              # forum -> forum_hosts
            (57, "y z"),            # forum AND ends-in-7: forum wins
            (97, "buy this"),       # shop.products AND ends-in-7:
            #                         commerce (priority 1) wins
            (198, "cheap deal"),    # 198%100=98 -> reviews.products
        ]
    ).to_parquet(root / "documents.parquet")
    return str(root)


def test_denylist_hand_computed(spark, deny_docs_dir):
    rows = {
        r["rule"]: r for r in url_denylist_filter(spark, deny_docs_dir).collect()
    }
    # kept: 0 (2 tok) + 12 (3 tok) = 2 docs, 5 tokens
    assert rows["kept"]["n_docs"] == 2
    assert rows["kept"]["n_tokens"] == 5
    assert rows["kept"]["priority"] == 0 and rows["kept"]["dropped"] == 0
    # commerce: 97 shop.products (2 tok; ends in 7 but commerce has
    # priority over spam_path_ids) + 198 reviews.products (2 tok)
    assert rows["commerce_domains"]["n_docs"] == 2
    assert rows["commerce_domains"]["n_tokens"] == 4
    assert rows["commerce_domains"]["priority"] == 1
    assert rows["commerce_domains"]["dropped"] == 1
    # forum: 55 + 57 — doc 57 ends in 7 but the FORUM rule has higher
    # priority than spam_path_ids: first match wins
    assert rows["forum_hosts"]["n_docs"] == 2
    assert rows["forum_hosts"]["n_tokens"] == 3
    # spam path: only 117 (commoncrawl host, id ends in 7)
    assert rows["spam_path_ids"]["n_docs"] == 1
    assert rows["spam_path_ids"]["n_tokens"] == 2
    # shares sum to exactly 1 (first-match-wins partitions the corpus)
    assert sum(r["doc_share"] for r in rows.values()) == pytest.approx(1.0)
    assert rows["kept"]["doc_share"] == 2 / 7


def test_denylist_rule_table_is_priority_ordered():
    # the registered priorities must follow list order, 1-based
    names = [n for n, _ in _URL_DENY_RULES]
    assert names == ["commerce_domains", "forum_hosts", "spam_path_ids"]


def test_denylist_every_rule_fires_on_shipped_corpus(spark, sf_dir):
    rows = {r["rule"]: r for r in url_denylist_filter(spark, sf_dir).collect()}
    # the rules were chosen to hit every arm on any doc_id-dense corpus
    assert set(rows) == {n for n, _ in _URL_DENY_RULES} | {"kept"}
    assert all(r["n_docs"] > 0 for r in rows.values())
    # kept must dominate: the deny rules target ~7% of hosts + 1/10 ids
    total = sum(r["n_docs"] for r in rows.values())
    assert rows["kept"]["n_docs"] > total * 0.7


# -- html_boilerplate_extract ------------------------------------------------


def _synth_html(doc_id: int, text: str) -> str:
    """Python mirror of `_html_synth_sql` (the test's reference
    implementation, the `_reference_fold` precedent)."""
    ads = (
        '<div class="ads"><a href="/buy">buy now</a>'
        '<a href="/deal">deal</a></div>'
        if doc_id % 5 == 0
        else ""
    )
    rel = (
        f'<p>See <a href="/doc/{doc_id + 1}">next</a> and '
        f'<a href="/doc/{doc_id + 2}">related</a>.</p>'
        if doc_id % 3 == 0
        else ""
    )
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        f"<script>var docId={doc_id};track();</script></head><body>"
        '<nav><a href="/">home</a><a href="/about">about</a></nav>'
        f"{ads}<p>{text}</p>{rel}"
        '<footer><a href="/terms">terms</a></footer></body></html>'
    )


@pytest.fixture(scope="module")
def html_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("htmldocs")
    _docs(
        [
            (1, "hello world"),       # no arms
            (3, "alpha beta gamma"),  # related-links arm only
            (5, "short text"),        # ads arm only
            (15, "both arms here"),   # ads AND related
        ]
    ).to_parquet(root / "documents.parquet")
    return str(root)


def test_html_extract_hand_computed_no_arms(spark, html_docs_dir):
    rows = {
        r["doc_id"]: r
        for r in html_boilerplate_extract(spark, html_docs_dir).collect()
    }
    r1 = rows[1]
    # doc 1: nav(2) + footer(1) links, no ads, no related paragraph
    assert r1["html_chars"] == len(_synth_html(1, "hello world"))
    assert r1["n_links_total"] == 3
    assert r1["n_links_main"] == 0
    # main text after boilerplate+tag strip: title text survives
    # ("Doc 1"), script body does not: Doc, 1, hello, world
    assert r1["n_main_tokens"] == 4
    assert r1["main_alnum_chars"] == len("doc1helloworld")
    assert r1["has_ads_block"] == 0
    assert r1["markup_fraction"] == (
        r1["html_chars"] - r1["main_alnum_chars"]
    ) / r1["html_chars"]
    assert r1["link_density"] == 0.0


def test_html_extract_arm_coverage(spark, html_docs_dir):
    rows = {
        r["doc_id"]: r
        for r in html_boilerplate_extract(spark, html_docs_dir).collect()
    }
    # ads arm: +2 links total, still boilerplate (not main)
    assert rows[5]["n_links_total"] == 5
    assert rows[5]["n_links_main"] == 0
    assert rows[5]["has_ads_block"] == 1
    # related arm: +2 links that ARE main content
    assert rows[3]["n_links_total"] == 5
    assert rows[3]["n_links_main"] == 2
    assert rows[3]["has_ads_block"] == 0
    # doc 3 main tokens: Doc,3,alpha,beta,gamma,See,next,and,related
    assert rows[3]["n_main_tokens"] == 9
    assert rows[3]["link_density"] == 2 / 9
    # both arms stack
    assert rows[15]["n_links_total"] == 7
    assert rows[15]["n_links_main"] == 2
    assert rows[15]["has_ads_block"] == 1


def test_html_extract_corpus_invariants(spark, sf_dir):
    out = html_boilerplate_extract(spark, sf_dir)
    n = out.count()
    assert n > 0
    bad = out.filter(
        (F.col("n_links_main") > F.col("n_links_total"))
        | (F.col("main_alnum_chars") > F.col("html_chars"))
        | (F.col("markup_fraction") < 0)
        | (F.col("markup_fraction") > 1)
        | (F.col("has_ads_block") != (F.col("doc_id") % 5 == 0).cast("long"))
    )
    assert bad.count() == 0
    # every doc carries nav+footer markup: the fraction is never tiny
    assert out.agg(F.min("markup_fraction")).first()[0] > 0.1


# -- html_outlink_graph ------------------------------------------------------


def test_outlink_graph_hand_computed(spark, html_docs_dir):
    from data_to_parquet_spark.operators.pipeline import html_outlink_graph

    rows = {
        r["doc_id"]: r
        for r in html_outlink_graph(spark, html_docs_dir).collect()
    }
    # fixture docs: 1, 3, 5, 15 — the %3 docs (3, 15) each link to
    # doc_id+1 / doc_id+2; every target here is ABSENT from the corpus
    # (4, 16, 17) or present (5 <- 3+2), so dangling links are covered
    assert rows[1]["outdegree"] == 0 and rows[1]["indegree"] == 0
    assert rows[3]["outdegree"] == 2 and rows[3]["indegree"] == 0
    assert rows[15]["outdegree"] == 2 and rows[15]["indegree"] == 0
    # doc 5 is linked by doc 3 (3+2); doc 4 / 16 / 17 don't exist, so
    # those links are dangling (counted in outdegree only)
    assert rows[5]["outdegree"] == 0 and rows[5]["indegree"] == 1


def test_outlink_graph_corpus_structure(spark, sf_dir):
    """On the dense shipped corpus the synthesized structure is exact:
    outdegree 2 iff doc_id % 3 == 0; indegree 1 iff doc_id % 3 != 0
    (each non-arm doc is the +1 or +2 target of exactly one arm doc),
    except where the source would be negative. Edge conservation:
    sum(outdegree) - sum(indegree) = dangling links past the tail."""
    from data_to_parquet_spark.operators.pipeline import html_outlink_graph

    out = html_outlink_graph(spark, sf_dir)
    bad = out.filter(
        (F.col("outdegree") != F.when(F.col("doc_id") % 3 == 0, 2).otherwise(0))
        | (
            F.col("indegree")
            != F.when(F.col("doc_id") % 3 == 0, 0).otherwise(1)
        )
    )
    assert bad.count() == 0
    tot = out.agg(
        F.sum("outdegree").alias("o"), F.sum("indegree").alias("i")
    ).first()
    n = out.count()
    # docs are 0..n-1 dense; the last arm doc is n-2 if (n-2)%3==0 etc.
    dangling = sum(
        1
        for s in range(n - 2, n)
        if s >= 0 and s % 3 == 0
        for t in (s + 1, s + 2)
        if t >= n
    )
    assert tot["o"] - tot["i"] == dangling and tot["o"] == 2 * ((n + 2) // 3)


# -- adversarial-text cross-engine fuzz --------------------------------------
# The driver's hash gate only ever sees the shipped corpus, whose texts
# are clean prose. The html/url operators interpolate `text` into
# markup and then regex it back out, so the latent oracle risk is a
# text that the two engines' regex/concat semantics treat differently
# (angle brackets that eat into tags, pipes, quotes, backslashes,
# unicode, emoji). This fixture runs the REGISTERED oracle SQL against
# the Spark build on exactly those texts — a divergence here is a
# future driver red caught early.

_NASTY_TEXTS = [
    "plain words here",
    "angle <brackets> inside",        # fake tag swallowed by strip
    "a <script>not real</script> b",  # fake script block
    "lt < alone and gt > alone",
    'quotes "double" and \'single\'',
    "pipe | and double || pipes",
    "back\\slash and slash/forward",
    "unicode café naïve über",
    "emoji \U0001f600 and cjk 漢字",
    "ends with open angle <",
    "> starts with close angle",
    "",                               # empty text
    "a" * 500,                        # one long token
]


@pytest.fixture(scope="module")
def nasty_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("nastydocs")
    # doc_ids 0..N-1: dense so every synthesis arm occurs
    _docs(list(enumerate(_NASTY_TEXTS))).to_parquet(
        root / "documents.parquet"
    )
    return str(root)


@pytest.mark.parametrize(
    "qname",
    ["html_boilerplate_extract", "html_outlink_graph", "url_denylist_filter"],
)
def test_web_ops_cross_engine_on_adversarial_texts(
    spark, nasty_docs_dir, qname
):
    import duckdb

    import __spark_entry__ as entry_mod

    sdf = entry_mod.queries()[qname](spark, nasty_docs_dir)
    cols = sorted(sdf.columns)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{nasty_docs_dir}/documents.parquet'"
    )
    res = con.execute(entry_mod.oracle_sql()[qname])
    names = [d[0] for d in res.description]
    duck = sorted(
        tuple(row[names.index(c)] for c in cols) for row in res.fetchall()
    )
    con.close()
    got = sorted(tuple(r[c] for c in cols) for r in sdf.collect())
    assert got == duck
