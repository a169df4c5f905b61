"""Tests for the parametrized operator library (ops.py) — exercised over
arbitrary column names, verifying it generalizes beyond the driver corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_to_parquet_spark import ops


def test_exact_dedup_keeps_min(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "id long, payload string"
    )
    out = ops.exact_dedup(df, ["payload"], keep_by="id")
    assert sorted((r["id"], r["payload"]) for r in out.collect()) == [
        (1, "x"),
        (3, "y"),
    ]


def test_neardup_jaccard_generic_columns(spark):
    df = spark.createDataFrame(
        [
            (1, "g", "the quick brown fox jumps"),
            (2, "g", "the quick brown fox leaps"),
            (3, "g", "completely different words entirely"),
        ],
        "pk long, grp string, body string",
    )
    pairs = ops.neardup_jaccard(
        df, "pk", "body", "grp", threshold=0.5, salt=4
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_neardup_jaccard_prefix_matches_blocked(spark):
    # the prefix-filter index join must produce the IDENTICAL pair set as
    # the blocked all-pairs form on the same input (it is exact, not
    # approximate) — including with no blocking column at all
    rows = [
        (1, "g", "the quick brown fox jumps over the lazy dog"),
        (2, "g", "the quick brown fox jumps over the lazy cat"),
        (3, "g", "completely different words entirely here now"),
        (4, "h", "the quick brown fox jumps over the lazy dog"),
        (5, "h", "lorem ipsum dolor sit amet consectetur"),
        (6, "h", "lorem ipsum dolor sit amet consectetuer"),
    ]
    df = spark.createDataFrame(rows, "pk long, grp string, body string")
    for thresh in (0.5, 0.8):
        blocked = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in ops.neardup_jaccard(
                df, "pk", "body", "grp", threshold=thresh, salt=4
            ).collect()
        }
        prefixed = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in ops.neardup_jaccard_prefix(
                df, "pk", "body", block_col="grp", threshold=thresh
            ).collect()
        }
        assert prefixed == blocked
    # unblocked: doc 4 now also pairs with 1 and 2 across former blocks
    global_pairs = {
        (r["id_a"], r["id_b"])
        for r in ops.neardup_jaccard_prefix(
            df, "pk", "body", threshold=0.8
        ).collect()
    }
    assert (1, 4) in global_pairs


def test_connected_components_two_clusters(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    out = {
        r["node"]: r["component"]
        for r in ops.connected_components(edges, "a", "b").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cosine_topk_generic(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
        ],
        "vid long, v array<double>",
    )
    out = ops.cosine_topk(
        df, df.filter(F.col("vid") == 0), "vid", "v", k=2
    ).collect()
    ranked = [(r["neighbor_id"], r["rank"]) for r in out]
    assert ranked == [(1, 1), (2, 2)]


def test_sessionize_generic(spark):
    df = spark.createDataFrame(
        [
            (7, "2024-01-01 00:00:00"),
            (7, "2024-01-01 00:10:00"),
            (7, "2024-01-01 02:00:00"),
        ],
        "uid long, t string",
    ).withColumn("t", F.to_timestamp("t"))
    out = ops.sessionize(df, "uid", "t", gap_minutes=30)
    sessions = [r["session_id"] for r in out.orderBy("t").collect()]
    assert sessions == [1, 1, 2]


def test_tumbling_agg_generic(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:01:00", "a", 1.0),
            ("2024-01-01 00:02:00", "a", 2.0),
            ("2024-01-01 00:07:00", "a", 5.0),
        ],
        "t string, k string, v double",
    ).withColumn("t", F.to_timestamp("t"))
    out = ops.tumbling_agg(
        df, "t", "5 minutes", ["k"], [F.sum("v").alias("s")]
    )
    got = sorted(r["s"] for r in out.collect())
    assert got == [3.0, 5.0]


def test_minhash_candidates_generic(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight nine"),
        ],
        "pk long, body string",
    )
    pairs = ops.minhash_candidates(
        docs, "pk", "body", est_threshold=0.3
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_asof_join_timestamp_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00")], "k long, t string"
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "old", "2024-01-01 05:00:00"),
            (1, "2024-01-01 00:00:00", "new", "2024-01-01 06:00:00"),
        ],
        "k long, rt string, tag string, updated string",
    ).withColumn("rt", F.to_timestamp("rt")).withColumn(
        "updated", F.to_timestamp("updated")
    )
    out = ops.asof_join(
        left, right, "k", "k", "t", "rt", ["tag"], tie_break="updated"
    ).collect()
    assert [r["tag"] for r in out] == ["new"]


def test_mask_pii_counts_on_progressively_masked_text(spark):
    # the email swallows the ipv4-looking substring; counting against the
    # progressively masked string must report n_ipv4s == 0, consistent with
    # the final output (counting on the original would say 1)
    df = spark.createDataFrame(
        [(1, "mail bob@10.0.0.1.example.com then ping 192.168.0.7")],
        "id long, body string",
    )
    row = ops.mask_pii(df, "body").collect()[0]
    assert row["n_emails"] == 1
    assert row["n_ipv4s"] == 1  # only the standalone ip survives the email mask
    assert row["masked"] == "mail [EMAIL] then ping [IP]"


def test_mask_pii_no_patterns_is_identity(spark):
    df = spark.createDataFrame([(1, "nothing here")], "id long, body string")
    row = ops.mask_pii(df, "body", patterns={}).collect()[0]
    assert row["masked"] == "nothing here"


def test_semdedup_derived_k_and_salt_exact(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vid long, emb array<double>")
    out = {
        r["vid"]: (r["cell"], r["keep"])
        for r in ops.semdedup(
            df, "vid", "emb", k=None, tau=0.2, cell_target=8, num_salts=3
        ).collect()
    }
    assert set(out) == set(range(60))
    # replay the greedy keep-first rule on the engine's own cells
    mat = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = mat @ mat.T
    cell = np.array([out[i][0] for i in range(60)])
    expected_drop = {
        b
        for b in range(60)
        if any(cell[a] == cell[b] and cos[a, b] >= 0.2 for a in range(b))
    }
    assert {i for i in range(60) if not out[i][1]} == expected_drop


def test_semdedup_small_input_clamps_k(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.01])],
        "vid long, emb array<double>",
    )
    out = {r["vid"]: r["keep"] for r in ops.semdedup(df, "vid", "emb", k=16, tau=0.9).collect()}
    assert len(out) == 3  # k clamped to 3 samples, no crash


def test_cap_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 2}", f"text {i}") for i in range(10)],
        "pk long, src string, body string",
    )
    out = ops.cap_per_group(df, "src", 3, hash_cols=["body"])
    rows = out.collect()
    assert len(rows) == 6
    by_src: dict[str, int] = {}
    for r in rows:
        by_src[r["src"]] = by_src.get(r["src"], 0) + 1
    assert by_src == {"s0": 3, "s1": 3}
    # deterministic across runs
    again = {r["pk"] for r in ops.cap_per_group(df, "src", 3, hash_cols=["body"]).collect()}
    assert again == {r["pk"] for r in rows}
    # explicit order override
    first2 = ops.cap_per_group(df, "src", 2, order_cols=["pk"]).collect()
    assert sorted(r["pk"] for r in first2) == [0, 1, 2, 3]


def test_cap_per_group_requires_order(spark):
    df = spark.createDataFrame([(1, "a")], "pk long, src string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ops.cap_per_group(df, "src", 1)


def test_incremental_neardup_asymmetric(spark):
    toks = F.array_distinct(F.split(F.lower(F.col("body")), " "))
    new = spark.createDataFrame(
        [
            (100, "g", "the quick brown fox jumps"),
            (101, "g", "nothing shared with anyone"),
        ],
        "pk long, grp string, body string",
    ).withColumn("toks", toks)
    corpus = spark.createDataFrame(
        [
            (1, "g", "the quick brown fox jumps"),
            (2, "g", "the quick brown fox leaps"),
            (3, "h", "the quick brown fox jumps"),  # other block
        ],
        "pk long, grp string, body string",
    ).withColumn("toks", toks)
    got = ops.incremental_neardup(
        new, corpus, "pk", "toks", block_col="grp", threshold=0.6
    ).collect()
    pairs = sorted((r["new_id"], r["corpus_id"]) for r in got)
    # 100 matches corpus 1 exactly (jac 1.0) and 2 at 4/6; 3 blocked out;
    # 101 matches nothing; corpus-vs-corpus pairs never emitted
    assert pairs == [(100, 1), (100, 2)]
    # no blocking: block 'h' twin now matches too
    got2 = ops.incremental_neardup(
        new, corpus, "pk", "toks", threshold=0.99
    ).collect()
    assert sorted((r["new_id"], r["corpus_id"]) for r in got2) == [
        (100, 1),
        (100, 3),
    ]


def test_transition_matrix_generic(spark):
    from data_to_parquet_spark.ops import transition_matrix

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (2, 1, "b"), (2, 2, "b")],
        "k long, t long, s string",
    )
    out = {
        (r["prev_state"], r["next_state"]): (r["n"], r["prob"])
        for r in transition_matrix(df, "k", ["t"], "s").collect()
    }
    assert out[("a", "b")] == (1, 1.0)
    assert out[("b", "a")][0] == 1 and abs(out[("b", "a")][1] - 0.5) < 1e-12
    assert out[("b", "b")][0] == 1 and abs(out[("b", "b")][1] - 0.5) < 1e-12


def test_mad_outliers_generic(spark):
    from data_to_parquet_spark.ops import mad_outliers

    rows = [("g", float(v)) for v in [10, 11, 12, 13, 14, 100]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["v"]: r["is_outlier"] for r in mad_outliers(df, "g", "v").collect()}
    assert out[100.0] is True
    assert all(not out[float(v)] for v in [10, 11, 12, 13, 14])


def test_snapshot_diff_generic(spark):
    from data_to_parquet_spark.ops import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, bal double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (4, 40.0)], "id long, bal double"
    )
    out = {
        r["id"]: (r["change_type"], r["old_bal"], r["new_bal"])
        for r in snapshot_diff(old, new, "id", ["bal"]).collect()
    }
    assert out == {
        2: ("changed", 20.0, 25.0),
        3: ("removed", 30.0, None),
        4: ("added", None, 40.0),
    }
    assert 1 not in out  # unchanged rows never surface


def test_clamped_fold_generic(spark):
    from data_to_parquet_spark.ops import clamped_fold

    df = spark.createDataFrame(
        [(1, 1, 5), (1, 2, -10), (1, 3, 4), (2, 1, -3)],
        "k long, t long, d long",
    )
    out = {
        r["k"]: (r["n_rows"], r["final_value"])
        for r in clamped_fold(df, "k", ["t"], "d").collect()
    }
    # key 1: 0+5=5 -> max(5-10,0)=0 -> 0+4=4; key 2: max(-3,0)=0
    assert out == {1: (3, 4), 2: (1, 0)}


def test_priority_window_names_are_registered():
    """Every name in the driver verify-window priority list must be a
    registered query — a typo would silently waste a verification slot."""
    import __spark_entry__ as entry_mod

    registered = set(entry_mod.queries())
    missing = [n for n in entry_mod._PRIORITY if n not in registered]
    assert not missing, f"_PRIORITY names not in queries(): {missing}"


def test_containment_prefix_finds_subset_pairs(spark):
    # doc 1 is a strict token subset of doc 2 (small Jaccard, containment
    # 1.0) — the pair symmetric Jaccard at 0.9 misses by construction
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumps over every lazy dog sleeping near"
            " the old wooden fence tonight"),
        (3, "completely unrelated words appear in this document only"),
    ]
    df = spark.createDataFrame(rows, "pk long, body string")
    out = ops.neardup_containment_prefix(
        df, "pk", "body", threshold=0.9, min_tokens=3
    ).collect()
    assert [(r["id_inner"], r["id_outer"]) for r in out] == [(1, 2)]
    assert out[0]["containment"] == 1.0
    assert out[0]["jaccard"] < 0.9
    # the same pair must NOT be reported by the symmetric join at 0.9
    sym = ops.neardup_jaccard_prefix(df, "pk", "body", threshold=0.9)
    assert sym.count() == 0


def test_containment_prefix_matches_naive(spark):
    # exactness: identical result set to the brute-force containment join
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h i j k l m n o p"),
        (3, "a b c d e f g x"),
        (4, "x y z w v u t s"),
        (5, "x y z w v u t s a b c d e f g h"),
    ]
    df = spark.createDataFrame(rows, "pk long, body string")
    t = 0.8
    got = sorted(
        (r["id_inner"], r["id_outer"], round(r["containment"], 9))
        for r in ops.neardup_containment_prefix(
            df, "pk", "body", threshold=t
        ).collect()
    )
    toks = {
        r["pk"]: set(r["body"].split()) for r in df.collect()
    }
    naive = sorted(
        (a, b, round(len(toks[a] & toks[b]) / len(toks[a]), 9))
        for a in toks
        for b in toks
        if a != b
        and (len(toks[a]) < len(toks[b])
             or (len(toks[a]) == len(toks[b]) and a < b))
        and len(toks[a] & toks[b]) / len(toks[a]) >= t
    )
    assert got == naive


def test_passage_dup_stats_sliding_stride(spark):
    # stride=1 catches a copied span that straddles the fixed-chunk
    # boundary; the chunked form misses it on the same input
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, "one two three " + shared + " four five six"),
        (2, "seven eight nine ten " + shared + " eleven twelve"),
    ]
    df = spark.createDataFrame(rows, "pk long, body string")
    sliding = {
        r["pk"]: r["n_dup_passages"]
        for r in ops.passage_dup_stats(
            df, "pk", "body", passage_tokens=6, stride=1
        ).collect()
    }
    assert sliding[1] >= 1 and sliding[2] >= 1
    chunked = {
        r["pk"]: r["n_dup_passages"]
        for r in ops.passage_dup_stats(
            df, "pk", "body", passage_tokens=6
        ).collect()
    }
    # the 6-token shared span is offset 3 in doc 1 and offset 4 in doc 2,
    # so no aligned 6-token chunk is shared
    assert chunked[1] == 0 and chunked[2] == 0


def test_lloyd_kmeans_generic_separates_obvious_clusters(spark):
    import numpy as np

    rows = []
    for i in range(20):
        base = [0.0, 0.0] if i % 2 == 0 else [10.0, 10.0]
        rows.append(
            (i, [base[0] + (i % 5) * 0.01, base[1] - (i % 3) * 0.01])
        )
    df = spark.createDataFrame(rows, "rid long, feat array<double>")
    out = ops.lloyd_kmeans(df, "rid", "feat", k=2, iterations=3).collect()
    assert len(out) == 20
    by_parity = {0: set(), 1: set()}
    for r in out:
        by_parity[r["rid"] % 2].add(r["cluster"])
    # the two point clouds are far apart: each parity class lands in ONE
    # cluster and the two classes in different ones
    assert len(by_parity[0]) == 1 and len(by_parity[1]) == 1
    assert by_parity[0] != by_parity[1]
    assert all(r["d2"] < 1.0 for r in out)


def test_dbscan_labels_generic_roles(spark):
    # triangle 1-2-3 (all core at min_neighbors=2), pendant 4 attached to
    # 3 (border), isolated 5 (noise)
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "nid long")
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
    )
    out = {
        r["nid"]: (r["role"], r["cluster_id"])
        for r in ops.dbscan_labels(
            nodes, "nid", edges, "a", "b", min_neighbors=2
        ).collect()
    }
    assert out[1] == ("core", 1)
    assert out[2] == ("core", 1)
    assert out[3] == ("core", 1)
    assert out[4] == ("border", 1)
    assert out[5] == ("noise", -1)
