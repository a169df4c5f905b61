"""Hand-computed pins for the round-11 session-2 additions.

- `t_closeness_audit` (operators/privacy.py): the ordered-value EMD is
  pinned on a synthetic corpus small enough to compute by hand, covering
  a moderate class (emd well under t), an extreme class (mass at the far
  band ends -> t violation), and the exact integer numerator.
- `attribution_last_touch` (operators/events.py): the (ts, event_id)
  tie rule (a touch at the purchase's exact timestamp counts only when
  its event_id is smaller), the 7-day lookback boundary, last-touch-wins
  over earlier touches, and the 'direct' fallback.
Both are additionally cross-checked against their DuckDB oracle SQL on
the same synthetic parquet (the oracle-parity harness only runs the
shipped corpus; these shapes are rarer there).
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

_ORACLES = entry_mod.oracle_sql()


def _write_nation(root):
    pd.DataFrame(
        {"n_nationkey": [0], "n_name": ["ALPHA"], "n_regionkey": [0]}
    ).to_parquet(root / "nation.parquet")


def _oracle_rows(sf_dir: str, name: str, order_cols: list[str]):
    con = duckdb.connect()
    for t in ("customer", "nation", "events"):
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except duckdb.IOException:
            pass  # fixture dirs only carry the tables their query reads
    df = con.execute(_ORACLES[name]).df()
    con.close()
    return df.sort_values(order_cols).to_dict("records")


@pytest.fixture(scope="module")
def tcloseness_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tclose")
    _write_nation(root)
    # class MID-A: 2 customers in band 0; class MID-B: 2 in band 1
    #   global: band0=2, band1=2 plus the extremes below
    # class EXTREME-LO: 1 customer in band -1; EXTREME-HI: 1 in band 9
    rows = [
        (1, "MIDA", 500.0),
        (2, "MIDA", 600.0),
        (3, "MIDB", 1500.0),
        (4, "MIDB", 1600.0),
        (5, "EXLO", -500.0),
        (6, "EXHI", 9500.0),
    ]
    pd.DataFrame(
        {
            "c_custkey": [r[0] for r in rows],
            "c_name": [f"Customer#{r[0]}" for r in rows],
            "c_nationkey": [0] * len(rows),
            "c_acctbal": [r[2] for r in rows],
            "c_mktsegment": [r[1] for r in rows],
        }
    ).to_parquet(root / "customer.parquet")
    return str(root)


def test_t_closeness_hand_computed(spark, tcloseness_dir):
    from data_to_parquet_spark.operators.privacy import t_closeness_audit

    rows = {
        r["c_mktsegment"]: r
        for r in t_closeness_audit(spark, tcloseness_dir).collect()
    }
    assert set(rows) == {"MIDA", "MIDB", "EXLO", "EXHI"}
    # N = 6, m - 1 = 10. Global band counts: {-1:1, 0:2, 1:2, 9:1}.
    # MIDA (n=2, all band 0): diffs cnt*6 - g*2 = {-1:-2, 0:+8, 1:-4, 9:-2}
    #   cums: -2, 6, 2, 2 (bands 2..8), 0  -> |sum| = 2 + 6 + 2*8 = 24
    assert rows["MIDA"]["class_n"] == 2
    assert rows["MIDA"]["emd_num"] == 24
    assert rows["MIDA"]["t_emd"] == pytest.approx(24 / (2 * 6 * 10), abs=0)
    assert rows["MIDA"]["t_violates"] == 0
    # EXLO (n=1, all band -1): diffs cnt*6 - g*1 = {-1:+5, 0:-2, 1:-2, 9:-1}
    #   cums: 5, 3, 1 (bands 1..8), 0 -> 5 + 3 + 1*8 = 16
    #   t_emd = 16/60 ~= 0.2667 > 0.2 -> violation
    assert rows["EXLO"]["emd_num"] == 16
    assert rows["EXLO"]["t_violates"] == 1
    # EXHI (n=1, all band 9): cums: -1,-3,-5,... all negative until band 9
    #   |cum| = 1 + 3 + 5*8 = 44; t_emd = 44/60 ~= 0.733 -> violation
    assert rows["EXHI"]["emd_num"] == 44
    assert rows["EXHI"]["t_violates"] == 1


def test_t_closeness_oracle_agrees_on_fixture(spark, tcloseness_dir):
    from data_to_parquet_spark.operators.privacy import t_closeness_audit

    got = sorted(
        (
            (r["c_mktsegment"], r["class_n"], r["emd_num"], r["t_emd"])
            for r in t_closeness_audit(spark, tcloseness_dir).collect()
        )
    )
    want = sorted(
        (r["c_mktsegment"], r["class_n"], r["emd_num"], r["t_emd"])
        for r in _oracle_rows(
            tcloseness_dir, "t_closeness_audit", ["c_mktsegment"]
        )
    )
    assert got == want


def test_t_closeness_out_of_domain_band_clamps_identically(
    spark, tmp_path_factory
):
    """r11 ADVICE: a c_acctbal outside [-999.99, 9999.99] used to be
    silently dropped from the Spark histogram (and n_total) while the
    oracle counted it. Both engines now CLAMP the band into the literal
    domain — this corpus has one balance in band 25 and one in band -5,
    which must land in the edge bands 9 / -1 and be counted everywhere,
    with the two engines in exact agreement."""
    root = tmp_path_factory.mktemp("tclose_oob")
    _write_nation(root)
    rows = [
        (1, "INDOM", 500.0),  # band 0
        (2, "INDOM", 1500.0),  # band 1
        (3, "OOBHI", 25000.0),  # band 25 -> clamps to 9
        (4, "OOBLO", -5000.0),  # band -5 -> clamps to -1
    ]
    pd.DataFrame(
        {
            "c_custkey": [r[0] for r in rows],
            "c_name": [f"c{r[0]}" for r in rows],
            "c_nationkey": [0] * len(rows),
            "c_acctbal": [r[2] for r in rows],
            "c_mktsegment": [r[1] for r in rows],
        }
    ).to_parquet(root / "customer.parquet")
    from data_to_parquet_spark.operators.privacy import t_closeness_audit

    got = {
        r["c_mktsegment"]: r
        for r in t_closeness_audit(spark, str(root)).collect()
    }
    # every row counted: class_n sums to 4 (nothing silently dropped)
    assert {k: v["class_n"] for k, v in got.items()} == {
        "INDOM": 2,
        "OOBHI": 1,
        "OOBLO": 1,
    }
    # N = 4, m - 1 = 10; global bands {-1:1, 0:1, 1:1, 9:1}.
    # OOBHI (n=1, mass at band 9): cum diffs -1,-2,-3,...,-3,0
    #   |cum| = 1 + 2 + 3*8 = 27
    assert got["OOBHI"]["emd_num"] == 27
    # OOBLO (n=1, mass at band -1): cum diffs +3,+2,+1,...,+1,0
    #   |cum| = 3 + 2 + 1*8 = 13
    assert got["OOBLO"]["emd_num"] == 13
    want = sorted(
        (r["c_mktsegment"], r["class_n"], r["emd_num"], r["t_emd"])
        for r in _oracle_rows(
            str(root), "t_closeness_audit", ["c_mktsegment"]
        )
    )
    assert want == sorted(
        (k, v["class_n"], v["emd_num"], v["t_emd"]) for k, v in got.items()
    )


def test_t_closeness_uniform_class_is_zero(spark, tmp_path_factory):
    # a class distributed exactly like the population has EMD 0
    root = tmp_path_factory.mktemp("tclose0")
    _write_nation(root)
    bals = [500.0, 1500.0]  # bands 0 and 1, one each, in BOTH classes
    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4],
            "c_name": ["a", "b", "c", "d"],
            "c_nationkey": [0] * 4,
            "c_acctbal": bals * 2,
            "c_mktsegment": ["S1", "S1", "S2", "S2"],
        }
    ).to_parquet(root / "customer.parquet")
    from data_to_parquet_spark.operators.privacy import t_closeness_audit

    for r in t_closeness_audit(spark, str(root)).collect():
        assert r["emd_num"] == 0
        assert r["t_emd"] == 0.0
        assert r["t_violates"] == 0


@pytest.fixture(scope="module")
def attribution_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("attrib")
    t0 = datetime.datetime(2024, 1, 10)

    def ev(eid, uid, kind, days, value=10.0):
        return {
            "event_id": eid,
            "ts": t0 + datetime.timedelta(days=days),
            "user_id": uid,
            "event_type": kind,
            "value": value,
            "props": "{}",
        }

    events = [
        # user 1: view d0, click d1, purchase d2 -> last touch = click
        ev(0, 1, "view", 0),
        ev(1, 1, "click", 1),
        ev(2, 1, "purchase", 2),
        # user 2: touch 8 days before purchase -> outside lookback, direct
        ev(10, 2, "view", 0),
        ev(11, 2, "purchase", 8),
        # user 3: touch exactly 7 days before -> inside (>= boundary)
        ev(20, 3, "click", 0),
        ev(21, 3, "purchase", 7),
        # user 4: purchase with no prior touch ever -> direct
        ev(30, 4, "purchase", 2),
        # user 5: tie timestamps — touch shares the purchase's ts;
        #   event_id 40 < 41 so the view counts (strictly precedes in the
        #   (ts, event_id) total order)
        ev(40, 5, "view", 3),
        ev(41, 5, "purchase", 3),
        # user 6: same shape but the touch's event_id is LARGER -> the
        #   purchase precedes it, so it must NOT be attributed
        ev(51, 6, "purchase", 3),
        ev(52, 6, "view", 3),
    ]
    pd.DataFrame(events).to_parquet(root / "events.parquet")
    return str(root)


def test_attribution_semantics(spark, attribution_dir):
    from data_to_parquet_spark.operators.events import attribution_last_touch

    rows = attribution_last_touch(spark, attribution_dir).collect()
    got = {(r["day"], r["touch_type"]): r["n_purchases"] for r in rows}
    assert got == {
        ("2024-01-12", "click"): 1,  # user 1 (click beats the earlier view)
        ("2024-01-18", "direct"): 1,  # user 2 (8 days > lookback)
        ("2024-01-17", "click"): 1,  # user 3 (exactly 7 days: inside)
        ("2024-01-12", "direct"): 1,  # user 4 (no touch at all)
        ("2024-01-13", "view"): 1,  # user 5 (tie ts, smaller event_id)
        ("2024-01-13", "direct"): 1,  # user 6 (tie ts, larger event_id)
    }
    vals = {(r["day"], r["touch_type"]): r["attributed_value"] for r in rows}
    assert all(v == 10.0 for v in vals.values())


def test_attribution_oracle_agrees_on_fixture(spark, attribution_dir):
    from data_to_parquet_spark.operators.events import attribution_last_touch

    got = sorted(
        (r["day"], r["touch_type"], r["n_purchases"], r["attributed_value"])
        for r in attribution_last_touch(spark, attribution_dir).collect()
    )
    want = sorted(
        (r["day"], r["touch_type"], r["n_purchases"], r["attributed_value"])
        for r in _oracle_rows(
            attribution_dir, "attribution_last_touch", ["day", "touch_type"]
        )
    )
    assert got == want


@pytest.fixture(scope="module")
def audio_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("audio")
    # doc 3 -> n = 4003: four full windows plus a 3-sample partial window
    pd.DataFrame(
        {
            "doc_id": [0, 3, 1501],
            "text": ["x", "y", "z"],
            "lang": ["en"] * 3,
            "source": ["s0"] * 3,
            "n_chars": [1] * 3,
        }
    ).to_parquet(root / "documents.parquet")
    return str(root)


def test_audio_energy_windows_matches_numpy_replay(spark, audio_docs_dir):
    """Replay the synthesis formula in numpy (no codec involved) and pin
    every window's energy/peak/count — proves the WAV encode->decode round
    trip and the reduceat windowing, including the partial tail window."""
    import numpy as np

    from data_to_parquet_spark.operators.multimodal import (
        _AUDIO_WIN,
        audio_energy_windows,
    )

    got = {
        (r["doc_id"], r["window_idx"]): r
        for r in audio_energy_windows(spark, audio_docs_dir).collect()
    }
    n_rows = 0
    for doc_id in (0, 3, 1501):
        n = 4000 + doc_id % 4000
        i = np.arange(n, dtype=np.int64)
        s = (i * i * 7 + doc_id * 13) % 20001 - 10000
        for w in range((n + _AUDIO_WIN - 1) // _AUDIO_WIN):
            seg = s[w * _AUDIO_WIN : (w + 1) * _AUDIO_WIN]
            r = got[(doc_id, w)]
            n_rows += 1
            assert r["n_in_window"] == len(seg)
            assert r["energy"] == int((seg * seg).sum())
            assert r["peak"] == int(np.abs(seg).max())
            assert r["rms"] == pytest.approx(
                float(np.sqrt((seg * seg).sum() / len(seg))), abs=0
            )
    assert n_rows == len(got)
    # the partial tail: doc 3 has 4003 samples -> last window holds 3
    assert got[(3, 4)]["n_in_window"] == 3


def test_shard_manifest_detects_membership_drift(spark, audio_docs_dir):
    """The manifest's consumer contract: a reader re-deriving a shard's
    members recomputes every manifest number — and a dropped document
    changes the checksum, not just the count. Verified by an independent
    pure-Python re-derivation on a tiny corpus."""
    import hashlib

    from data_to_parquet_spark.operators.pipeline import (
        _SHARD_N,
        training_shard_manifest,
    )

    got = {
        r["shard_id"]: r
        for r in training_shard_manifest(spark, audio_docs_dir).collect()
    }

    def h8(v: int) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    shards: dict[int, list[int]] = {}
    for doc_id in (0, 3, 1501):
        shards.setdefault(h8(doc_id) % _SHARD_N, []).append(doc_id)
    assert set(got) == set(shards)
    for sid, members in shards.items():
        r = got[sid]
        assert r["n_docs"] == len(members)
        assert r["checksum"] == sum(h8(d) for d in members)
        assert r["min_doc_id"] == min(members)
        assert r["max_doc_id"] == max(members)
        # dropping any member changes the checksum (h8 is never 0)
        for d in members:
            assert r["checksum"] != sum(h8(x) for x in members if x != d)


@pytest.fixture(scope="module")
def chain_docs_dir(tmp_path_factory):
    """A 9-doc transitive near-dup CHAIN: doc i holds the 20-token window
    [i, i+20) over a 28-token sequence, so adjacent docs share 19 of 21
    distinct tokens (Jaccard ~0.905 >= 0.9) while skip-pairs fall to
    18/22 (~0.818 < 0.9) — one cluster whose members sit 1..8 hops from
    the canonical doc 0."""
    root = tmp_path_factory.mktemp("chain")
    toks = [f"tok{i:02d}" for i in range(28)]
    texts = [" ".join(toks[i : i + 20]) for i in range(9)]
    pd.DataFrame(
        {
            "doc_id": range(9),
            "text": texts,
            "lang": ["en"] * 9,
            "source": ["s0"] * 9,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(root / "documents.parquet")
    return str(root)


def test_chain_depth_levels_and_beyond_cap(spark, chain_docs_dir):
    from data_to_parquet_spark.operators.dedup import (
        _CHAIN_MAX_HOPS,
        dedup_chain_depth_report,
    )

    rows = {
        r["level"]: r
        for r in dedup_chain_depth_report(spark, chain_docs_dir).collect()
    }
    # canonical doc 0 at level 0; docs 1..6 at their chain distance;
    # docs 7 and 8 exceed the 6-hop cap -> the -1 bucket
    assert set(rows) == set(range(0, _CHAIN_MAX_HOPS + 1)) | {-1}
    for lvl in range(0, _CHAIN_MAX_HOPS + 1):
        r = rows[lvl]
        assert (r["n_docs"], r["min_doc_id"], r["max_doc_id"]) == (1, lvl, lvl)
    assert (
        rows[-1]["n_docs"],
        rows[-1]["min_doc_id"],
        rows[-1]["max_doc_id"],
    ) == (2, _CHAIN_MAX_HOPS + 1, _CHAIN_MAX_HOPS + 2)


def test_chain_depth_oracle_agrees_on_fixture(spark, chain_docs_dir):
    import duckdb as _dd

    from data_to_parquet_spark.operators.dedup import dedup_chain_depth_report

    got = sorted(
        (r["level"], r["n_docs"], r["min_doc_id"], r["max_doc_id"])
        for r in dedup_chain_depth_report(spark, chain_docs_dir).collect()
    )
    con = _dd.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{chain_docs_dir}/documents.parquet'"
    )
    want = sorted(
        (r[0], r[1], r[2], r[3])
        for r in con.execute(_ORACLES["dedup_chain_depth_report"]).fetchall()
    )
    con.close()
    assert got == want


def test_chain_depth_no_edges_all_canonical(spark, tmp_path):
    # zero near-dup pairs -> every doc is its own canonical at level 0,
    # no deeper levels, no -1 bucket
    from data_to_parquet_spark.operators.dedup import dedup_chain_depth_report

    pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [f"tok{i}a tok{i}b tok{i}c" for i in range(8)],
            "lang": ["en"] * 8,
            "source": ["s0"] * 8,
            "n_chars": [17] * 8,
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = dedup_chain_depth_report(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["level"] == 0
    assert rows[0]["n_docs"] == 8


def test_t_closeness_matches_bruteforce_on_random_corpus(
    spark, tmp_path_factory
):
    """Randomized pin: a seeded 300-customer corpus, EMD recomputed by a
    pure-Python brute force over the literal band domain — every output
    column compared exactly (the int64 numerator makes exact equality
    meaningful; t_emd is one exact-operand IEEE division both sides)."""
    import numpy as np

    rng = np.random.default_rng(1137)
    n = 300
    nations = rng.integers(0, 3, n)
    segs = [f"SEG{j}" for j in rng.integers(0, 4, n)]
    bals = np.round(rng.uniform(-999.0, 9999.0, n), 2)
    root = tmp_path_factory.mktemp("tcl_rand")
    pd.DataFrame(
        {
            "n_nationkey": [0, 1, 2],
            "n_name": ["NA", "NB", "NC"],
            "n_regionkey": [0, 0, 0],
        }
    ).to_parquet(root / "nation.parquet")
    pd.DataFrame(
        {
            "c_custkey": range(n),
            "c_name": [f"c{i}" for i in range(n)],
            "c_nationkey": nations,
            "c_acctbal": bals,
            "c_mktsegment": segs,
        }
    ).to_parquet(root / "customer.parquet")

    from data_to_parquet_spark.operators.privacy import (
        _T_BANDS,
        _T_M1,
        t_closeness_audit,
    )

    name_of = {0: "NA", 1: "NB", 2: "NC"}
    band = [int(np.floor(b / 1000.0)) for b in bals]
    glob = {b: 0 for b in _T_BANDS}
    classes: dict = {}
    for i in range(n):
        key = (name_of[int(nations[i])], segs[i])
        cls = classes.setdefault(key, {b: 0 for b in _T_BANDS})
        cls[band[i]] += 1
        glob[band[i]] += 1
    expect = {}
    for key, cls in classes.items():
        cn = sum(cls.values())
        cum, acc = 0, 0
        for b in _T_BANDS:
            cum += cls[b] * n - glob[b] * cn
            acc += abs(cum)
        t_emd = acc / (float(cn) * float(n) * float(_T_M1))
        expect[key] = (cn, acc, t_emd, int(t_emd > 0.2))

    got = {
        (r["n_name"], r["c_mktsegment"]): (
            r["class_n"],
            r["emd_num"],
            r["t_emd"],
            r["t_violates"],
        )
        for r in t_closeness_audit(spark, str(root)).collect()
    }
    assert got == expect


def test_attribution_invariant_to_input_row_order(
    spark, attribution_dir, tmp_path_factory
):
    """The window's (ts, event_id) total order, not parquet row order,
    must decide attribution — rewrite the same events shuffled and
    demand identical output."""
    import numpy as np

    from data_to_parquet_spark.operators.events import attribution_last_touch

    base = sorted(
        (r["day"], r["touch_type"], r["n_purchases"], r["attributed_value"])
        for r in attribution_last_touch(spark, attribution_dir).collect()
    )
    df = pd.read_parquet(f"{attribution_dir}/events.parquet")
    shuffled_dir = tmp_path_factory.mktemp("attrib_shuffled")
    df.sample(frac=1.0, random_state=7).reset_index(drop=True).to_parquet(
        shuffled_dir / "events.parquet"
    )
    got = sorted(
        (r["day"], r["touch_type"], r["n_purchases"], r["attributed_value"])
        for r in attribution_last_touch(spark, str(shuffled_dir)).collect()
    )
    assert got == base


def test_chain_depth_conserves_docs_and_matches_cc(spark, sf_dir):
    """Cross-operator invariants on the real corpus: every document lands
    in exactly one level bucket (conservation), and the level-0 count
    equals the cluster count dedup_connected_components reports."""
    import duckdb as _dd

    from data_to_parquet_spark.operators.dedup import (
        dedup_chain_depth_report,
        dedup_connected_components,
    )

    rows = dedup_chain_depth_report(spark, sf_dir).collect()
    con = _dd.connect()
    n_docs = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    con.close()
    assert sum(r["n_docs"] for r in rows) == n_docs
    n_clusters = (
        dedup_connected_components(spark, sf_dir)
        .select("cluster_id")
        .distinct()
        .count()
    )
    level0 = {r["level"]: r["n_docs"] for r in rows}[0]
    assert level0 == n_clusters


def test_cluster_purity_on_chain_fixture(spark, chain_docs_dir):
    # the 9-doc chain is ONE within-source, within-lang cluster
    from data_to_parquet_spark.operators.dedup import neardup_cluster_purity

    rows = neardup_cluster_purity(spark, chain_docs_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["size_bucket"],
        r["cross_source"],
        r["cross_lang"],
        r["n_clusters"],
        r["n_docs"],
        r["max_cluster_size"],
    ) == (4, 0, 0, 1, 9, 9)


def test_cluster_purity_cross_source_and_singletons(spark, tmp_path):
    # docs 0/1: identical text from DIFFERENT sources -> one 2-member
    # cross-source cluster; docs 2/3: unique -> two singleton clusters
    texts = [
        "tok0 tok1 tok2 tok3 tok4",
        "tok0 tok1 tok2 tok3 tok4",
        "aaa bbb ccc ddd eee",
        "fff ggg hhh iii jjj",
    ]
    pd.DataFrame(
        {
            "doc_id": range(4),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["s0", "s1", "s0", "s0"],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from data_to_parquet_spark.operators.dedup import neardup_cluster_purity

    got = {
        (r["size_bucket"], r["cross_source"], r["cross_lang"]): (
            r["n_clusters"],
            r["n_docs"],
            r["max_cluster_size"],
        )
        for r in neardup_cluster_purity(spark, str(tmp_path)).collect()
    }
    assert got == {(2, 1, 0): (1, 2, 2), (1, 0, 0): (2, 2, 1)}
    # conservation against the oracle on the same fixture
    import duckdb as _dd

    con = _dd.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    want = {
        (r[0], r[1], r[2]): (r[3], r[4], r[5])
        for r in con.execute(
            _ORACLES["neardup_cluster_purity"]
        ).fetchall()
    }
    con.close()
    assert got == want


def test_cluster_purity_cross_lang_structurally_zero(spark, sf_dir):
    # the pair graph blocks on lang, so no cluster can span languages —
    # the cross_lang column must be 0 in every cell on any corpus
    from data_to_parquet_spark.operators.dedup import neardup_cluster_purity

    rows = neardup_cluster_purity(spark, sf_dir).collect()
    assert rows and all(r["cross_lang"] == 0 for r in rows)
    # conservation: every document lands in exactly one cell
    import duckdb as _dd

    con = _dd.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    con.close()
    assert sum(r["n_docs"] for r in rows) == n
