"""Text-analysis operators over the ``documents`` table: quality scoring,
token counting, language-ID heuristic, and document fingerprinting — the
LLM-training-pipeline surface mandated by BASELINE.json.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd); the DuckDB oracles use the literal same regexes so
the driver's value-hash comparison holds.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.exprs import distinct_tokens, exploded_rows, tokens
from .base import Registry, load_table

TXT = Registry()

# English stopwords that actually occur in real corpora; kept tiny and listed
# verbatim in the oracles. (A production lang-ID would ship per-language
# profiles; the heuristic structure — stopword-hit ratio — is the operator.)
_EN_STOP = ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"]

# BPE-ish pre-tokenization: letter runs, single digits, or single
# non-alphanumeric-non-space marks (GPT-2-style pre-tokenizer shape).
_BPE_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


@TXT.register(
    "text_quality_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, n_chars,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks,
             length(text) AS text_len,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^ ]', '', 'g')) AS n_spaces
      FROM documents
    )
    SELECT doc_id, lang, n_chars,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
           CAST(n_punct AS DOUBLE) / text_len AS punct_ratio,
           CAST(text_len - n_spaces - n_punct AS DOUBLE) / len(toks) AS avg_token_len,
           CAST(len(list_filter(toks,
                t -> list_contains(['the','a','and','of','to','in','is','that','it','for'], t)))
                AS DOUBLE) / len(toks) AS stopword_ratio
    FROM tok WHERE len(toks) > 0
    """,
)
def text_quality_stats(spark, sf_dir):
    """Per-document quality signals: token counts, type-token ratio,
    punctuation ratio, average token length, stopword ratio.

    Scale: pure narrow map over documents — no shuffle at all.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    stop = F.array(*[F.lit(s) for s in _EN_STOP])
    t = d.select(
        "doc_id",
        "lang",
        "n_chars",
        toks.alias("toks"),
        F.length("text").alias("text_len"),
        F.length(F.regexp_replace("text", "[^.,;:!?]", "")).alias("n_punct"),
        F.length(F.regexp_replace("text", "[^ ]", "")).alias("n_spaces"),
    ).filter(F.size("toks") > 0)
    return t.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
        (
            F.size(F.array_distinct("toks")).cast("double") / F.size("toks")
        ).alias("ttr"),
        (F.col("n_punct").cast("double") / F.col("text_len")).alias(
            "punct_ratio"
        ),
        (
            (F.col("text_len") - F.col("n_spaces") - F.col("n_punct")).cast(
                "double"
            )
            / F.size("toks")
        ).alias("avg_token_len"),
        (
            F.size(
                F.filter("toks", lambda tk: F.array_contains(stop, tk))
            ).cast("double")
            / F.size("toks")
        ).alias("stopword_ratio"),
    )


@TXT.register(
    "token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_whitespace_tokens,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_bpe(spark, sf_dir):
    """Token counting two ways: whitespace tokens and a BPE-ish
    pre-tokenizer regex (letter runs / digits / punctuation marks)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+")).alias(
            "n_whitespace_tokens"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
    )


@TXT.register(
    "lang_id_stopword",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(toks,
                  t -> list_contains(['the','a','and','of','to','in','is','that','it','for'], t)))
                  AS DOUBLE) / len(toks) AS en_score
      FROM tok WHERE len(toks) > 0
    )
    SELECT doc_id, lang, en_score,
           CASE WHEN en_score >= 0.05 THEN 'en' ELSE 'unknown' END AS pred_lang
    FROM scored
    """,
)
def lang_id_stopword(spark, sf_dir):
    """Language-ID heuristic: stopword-hit ratio against an English profile.

    (The synthetic corpus shares one vocabulary across its `lang` labels, so
    the interesting output is the score itself; the operator structure —
    profile match ratio + threshold decision — is what scales to real
    per-language profiles.)
    """
    d = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in _EN_STOP])
    toks = tokens(F.col("text"))
    scored = (
        d.select("doc_id", "lang", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            "lang",
            (
                F.size(
                    F.filter("toks", lambda t: F.array_contains(stop, t))
                ).cast("double")
                / F.size("toks")
            ).alias("en_score"),
        )
    )
    return scored.withColumn(
        "pred_lang",
        F.when(F.col("en_score") >= 0.05, F.lit("en")).otherwise(
            F.lit("unknown")
        ),
    )


@TXT.register(
    "doc_fingerprint_md5",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> ''))), ' ')) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint_md5(spark, sf_dir):
    """Content-defined fingerprint: md5 over the sorted distinct token set.

    Documents with identical vocabulary (word-order-insensitive duplicates)
    collide — the cheap first stage of a near-dup pipeline.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(distinct_tokens(F.col("text"))), " ")
        ).alias("fingerprint"),
    )


@TXT.register(
    "regexp_parse_customer_names",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS id_digits,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS id_num,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_shape
    FROM customer
    """,
)
def regexp_parse_customer_names(spark, sf_dir):
    """Structured extraction from semi-structured strings via regex."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("id_digits"),
        F.regexp_extract("c_name", "([0-9]+)", 1)
        .cast("bigint")
        .alias("id_num"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_shape"),
    )


@TXT.register(
    "fuzzy_match_part_names",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           levenshtein(a.p_name, b.p_name) AS edit_distance
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 10
    """,
)
def fuzzy_match_part_names(spark, sf_dir):
    """Fuzzy string matching: blocked Levenshtein pairs.

    Scale: same blocked-pair shape as the dedup family — (brand, size)
    blocking bounds the quadratic term; the edit-distance is a JVM builtin.
    """
    p = load_table(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_size").alias("size_a"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_size").alias("size_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(
            b,
            (F.col("brand_a") == F.col("brand_b"))
            & (F.col("size_a") == F.col("size_b"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .select(
            "part_a",
            "part_b",
            F.levenshtein("name_a", "name_b").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 10)
    )


@TXT.register(
    "lang_id_ngram",
    oracle="""
    WITH doc_grams AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(length(text) - 1, 1)),
               i -> substring(lower(text), i, 2))) AS grams
      FROM documents
    ), counted AS (
      SELECT lang, g, COUNT(*) AS cnt
      FROM (SELECT lang, unnest(grams) AS g FROM doc_grams)
      GROUP BY lang, g
    ), ranked AS (
      SELECT lang, g,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, g) AS rn
      FROM counted
    ), profile AS (
      SELECT lang AS profile_lang, list(g) AS profile_grams
      FROM ranked WHERE rn <= 25 GROUP BY lang
    ), scored AS (
      SELECT d.doc_id, d.lang, p.profile_lang,
             len(list_intersect(d.grams, p.profile_grams)) AS overlap
      FROM doc_grams d CROSS JOIN profile p
    ), best AS (
      SELECT doc_id, lang, profile_lang, overlap,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY overlap DESC, profile_lang) AS rn
      FROM scored
    )
    SELECT doc_id, lang, profile_lang AS pred_lang, overlap
    FROM best WHERE rn = 1
    """,
)
def lang_id_ngram(spark, sf_dir):
    """Language-ID via character-n-gram profiles (the classic Cavnar-Trenkle
    shape): build per-language bigram profiles from labeled docs (top-25
    bigrams per lang), score every doc by profile overlap, predict argmax.

    Two phases, both distributed: profile building is one explode+groupBy
    over labeled data; scoring joins each doc's bigram set against the
    (broadcast) profiles. Upgraded from rows-only to a full value oracle in
    round 5 — the whole dataflow (profile build included) is expressible as
    one DuckDB query with window-function CTEs, so the driver value-checks
    profile construction, scoring, and the argmax tie-break.

    Overlapping bigrams come from one lookahead-regex pass
    (``(?s)(?=(..))`` — zero-width match, group 1 captures each 2-char
    window): the regex engine scans each string once, where the naive
    per-position ``substring(text, i, 2)`` lambda is O(len²) because UTF-8
    substring seeks from the byte start every call (measured 5.4 s → 1.0 s
    at sf0.1). The oracle keeps the positional-substring formulation — RE2
    has no lookahead — which is exactly equivalent. The grams table is
    localCheckpoint-shared by the profile build and the scoring join, so
    the extraction runs once, not twice.
    """
    d = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "if(length(text) < 2, array(substring(lower(text), 1, 2)),"
        "   regexp_extract_all(lower(text), '(?s)(?=(..))', 1))"
    )
    # (A pre-projection repartition like doc_winnow_fingerprints' was
    # A/B-tested here and LOST — bigram extraction is light enough that
    # the extra exchange + multi-partition checkpoint cost more than the
    # parallelism saves: median 1.60 s → 1.87 s at sf0.1.)
    doc_grams = d.select(
        "doc_id", "lang", F.array_distinct(bigrams).alias("grams")
    ).localCheckpoint(eager=False)
    profile = (
        doc_grams.select("lang", F.explode("grams").alias("g"))
        .groupBy("lang", "g")
        .count()
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("lang").orderBy(F.desc("count"), "g")
            ),
        )
        .filter(F.col("rn") <= 25)
        .groupBy("lang")
        .agg(F.collect_set("g").alias("profile_grams"))
        .withColumnRenamed("lang", "profile_lang")
    )
    scored = doc_grams.join(F.broadcast(profile)).select(
        "doc_id",
        "lang",
        "profile_lang",
        F.size(F.array_intersect("grams", "profile_grams")).alias("overlap"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("overlap"), "profile_lang")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("profile_lang").alias("pred_lang"), "overlap")
    )


@TXT.register(
    "doc_winnow_fingerprints",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(length(text) - 7, 1)),
               i -> CAST('0x' || substring(md5(substring(text, i, 8)), 1, 15)
                    AS BIGINT)) AS hs
      FROM documents
    )
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(hs) - 15, 1)),
             w -> list_min(hs[w:w+15])))) AS fingerprint
    FROM h
    """,
)
def doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (MOSS-style): hash every char 8-gram,
    keep the minimum hash in each sliding window of 16 — a position-robust
    fingerprint set whose collisions localize shared substrings.

    All JVM-side: substring shingles via sequence/transform and a
    min-over-sliding-window via transform over window starts. Output is the
    exploded distinct fingerprint set per doc. The 8-gram hash is the first
    60 bits of md5, which both engines compute identically — that upgrades
    this query from rows-only to a full value oracle (round-5 item; xxhash64
    does not exist in DuckDB). A production deployment hashing 100 TB would
    swap the md5 kernel for xxhash64 (same winnowing structure, ~2× cheaper
    per byte); the fingerprint VALUES change but every collision/containment
    property the operator exists for is hash-agnostic.
    """
    d = load_table(spark, sf_dir, "documents")
    k, win = 8, 16
    # Same lookahead-regex extraction as lang_id_ngram: one O(len) regex
    # pass per doc for all overlapping 8-grams, vs O(len²) per-position
    # UTF-8 substring seeks.
    hashes = F.expr(
        f"transform("
        f" if(length(text) < {k}, array(substring(text, 1, {k})),"
        f"    regexp_extract_all(text, '(?s)(?=(.{{{k}}}))', 1)),"
        f" g -> cast(conv(substring(md5(g), 1, 15), 16, 10) AS bigint))"
    )
    winnowed = F.expr(
        f"array_distinct(transform("
        f" sequence(1, greatest(size(__hashes) - {win - 1}, 1)),"
        f" w -> array_min(slice(__hashes, w, {win}))))"
    )
    # ~300 md5+conv calls per doc: the dominant cost is this projection,
    # and the single-file test scan otherwise runs it in ONE task (same
    # fix as the codec queries' payload stage). At 100 TB the scan arrives
    # already partitioned and this spread is a no-op shuffle of skinny
    # (doc_id, text) rows.
    return exploded_rows(
        d.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", hashes.alias("__hashes")),
        ["doc_id"],
        winnowed,
        "fingerprint",
    )


@TXT.register(
    "pipeline_curate_documents",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, n_chars, text,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ), quality AS (
      SELECT doc_id, lang, n_chars,
             md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp,
             len(toks) AS n_tokens,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
      FROM tok
      WHERE len(toks) >= 10 AND n_chars BETWEEN 50 AND 5000
    ), keepers AS (
      SELECT fp, MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups
      FROM quality GROUP BY fp
    )
    SELECT q.doc_id, q.lang, q.n_tokens, q.ttr, k.n_dups
    FROM quality q JOIN keepers k
      ON q.fp = k.fp AND q.doc_id = k.keeper_id
    """,
)
def pipeline_curate_documents(spark, sf_dir):
    """Capstone curation pipeline — the composed form of the operator
    family: quality gate (token count + length band) → vocabulary
    fingerprint → duplicate-group collapse keeping the smallest doc_id.

    One narrow map (tokenize + fingerprint) and one hash aggregation (the
    keeper groupBy) end to end — the shape that curates a 100 TB corpus in
    two shuffle-light passes.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    quality = (
        d.select("doc_id", "lang", "n_chars", toks.alias("toks"))
        .filter(
            (F.size("toks") >= 10) & F.col("n_chars").between(50, 5000)
        )
        .select(
            "doc_id",
            "lang",
            F.md5(
                F.array_join(F.array_sort(F.array_distinct("toks")), " ")
            ).alias("fp"),
            F.size("toks").alias("n_tokens"),
            (
                F.size(F.array_distinct("toks")).cast("double")
                / F.size("toks")
            ).alias("ttr"),
        )
    )
    keepers = quality.groupBy("fp").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    return (
        quality.join(
            keepers,
            (quality["fp"] == keepers["fp"])
            & (quality["doc_id"] == keepers["keeper_id"]),
        )
        .select("doc_id", "lang", "n_tokens", "ttr", "n_dups")
    )


@TXT.register(
    "split_train_val_test",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, lang,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN h2 < 'cd' THEN 'train'
                WHEN h2 < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM tagged
    """,
)
def split_train_val_test(spark, sf_dir):
    """Deterministic ~80/10/10 train/val/test assignment by content-stable
    hash (md5 of the id) — the split that never reshuffles when the corpus
    grows, because membership depends only on the row's own key.

    Scale: pure narrow map; no shuffle; adding data never moves existing
    rows across splits (the property random splits lack).
    """
    d = load_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        "lang",
        F.when(h2 < "cd", F.lit("train"))
        .when(h2 < "e6", F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@TXT.register(
    "stratified_sample_documents",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents
    )
    SELECT doc_id, lang FROM ranked
    WHERE rn <= CAST(ceil(n_lang * 0.1) AS BIGINT)
    """,
)
def stratified_sample_documents(spark, sf_dir):
    """Deterministic stratified 10% sample per language: hash-ordered
    row_number within each stratum (reproducible across runs and engines,
    unlike rand()-based sampling).

    Scale: one shuffle on the stratum key; per-stratum state is a counter.
    """
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")))
    wc = W.partitionBy("lang")
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_lang"),
        )
        .filter(
            F.col("rn") <= F.ceil(F.col("n_lang") * 0.1).cast("bigint")
        )
        .select("doc_id", "lang")
    )


_TFIDF_TOP = 3  # terms reported per document


@TXT.register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
               AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             round(tf.tf * ln((1.0 + n.n_docs) / (1.0 + df.df)), 9)
               AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rnk
      FROM scored
    ) t WHERE rnk <= {_TFIDF_TOP}
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Per-document keyword extraction: the top {3} terms by TF-IDF
    (smoothed idf = ln((1+N)/(1+df))) — the classic signal for topic
    tagging and source profiling over a training corpus.

    Scale: term frequencies are one (doc, term) aggregation; the document
    frequency table is a second aggregation over the FIRST one's output
    (already deduplicated per doc, no re-explode), joined back on ``term``
    with NO forced broadcast — a web-scale corpus has 10^8+ distinct
    terms, so the dictionary is unbounded and only AQE should decide to
    broadcast when it measures small. The join key is the term itself,
    which is skew-tolerant here because the left side is already one row
    per (doc, term). N arrives as a broadcast 1-row cross join, so nothing
    here collects to the driver.
    The score is rounded to 9 decimals on both engines so the ranking and
    the hash are insensitive to last-ulp libm skew in ``ln`` (same
    technique as `udaf_geometric_mean`); ties break on the term text.
    """
    d = load_table(spark, sf_dir, "documents")
    # checkpoint the (doc, term) frequency table: its three consumers (df,
    # N, the scoring join) otherwise each re-scan and re-explode the corpus
    # in the same plan (measured 3 parquet scans, no exchange reuse)
    tf = (
        exploded_rows(d, ["doc_id"], tokens(F.col("text")), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))),
                9,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_TOP)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


@TXT.register(
    "unigram_lm_quality",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
               AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ), corpus AS (
      SELECT term, SUM(tf) AS c FROM tf GROUP BY term
    ), n AS (
      SELECT SUM(c) AS total FROM corpus
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           round(SUM(tf.tf * ln(corpus.c / n.total)) / SUM(tf.tf), 9)
             AS avg_logprob
    FROM tf JOIN corpus USING (term) CROSS JOIN n
    GROUP BY tf.doc_id
    """,
)
def unigram_lm_quality(spark, sf_dir):
    """Language-model quality signal without a model: score every document
    by the average per-token log-probability under the corpus's own unigram
    distribution (the cheap stand-in for a KenLM perplexity filter —
    documents full of corpus-rare tokens score low and are filter
    candidates).

    Scale: one (doc, term) aggregation, one term aggregation over ITS
    output, a shuffle join back on term (no forced broadcast — the term
    dictionary is unbounded; AQE broadcasts when it measures small), and a
    final per-doc aggregation. All JVM-side; the ln is rounded to 9
    decimals on both engines only after the per-doc average.
    """
    d = load_table(spark, sf_dir, "documents")
    # checkpointed for the same reason as tfidf_top_terms' tf: the corpus
    # LM and the per-doc scoring join otherwise re-explode the corpus
    tf = (
        exploded_rows(d, ["doc_id"], tokens(F.col("text")), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    n = corpus.agg(F.sum("c").cast("double").alias("total"))
    return (
        tf.join(corpus, "term")
        .join(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * F.log(F.col("c") / F.col("total")))
                / F.sum("tf"),
                9,
            ).alias("avg_logprob"),
        )
    )


_ZIPF_TOP = 1000  # terms used for the log-log fit


@TXT.register(
    "corpus_zipf_stats",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
               AS term
      FROM documents
    ), freq AS (
      SELECT term, COUNT(*) AS c FROM tok GROUP BY term
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS rnk
      FROM freq
    ), top AS (
      SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM ranked WHERE rnk <= {_ZIPF_TOP}
    )
    -- degenerate guard: with fewer than 2 ranked terms the regression
    -- is undefined (zero x-variance; an empty corpus even divides the
    -- intercept by COUNT(*) = 0) -> NULL stats, not a division crash
    SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
           CASE WHEN COUNT(*) >= 2 THEN
             round((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                   / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6)
           END AS slope,
           CASE WHEN COUNT(*) >= 2 THEN
             round((SUM(y) - ((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                   / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))) * SUM(x))
                   / COUNT(*), 6)
           END AS intercept
    FROM top
    """,
)
def corpus_zipf_stats(spark, sf_dir):
    """Corpus health report: least-squares slope of ln(freq) vs ln(rank)
    over the top {1000} terms — natural text tracks Zipf's law (slope near
    -1); a synthetic or boilerplate-heavy corpus drifts, so the slope is a
    one-number drift alarm for an ingest pipeline.

    Scale: one term aggregation, one TakeOrderedAndProject-able top-k by
    frequency, then a single-row grand aggregate of the regression sums —
    nothing leaves the cluster until the 1-row result. Rounded to 6 (not
    9) decimals: the regression sums accumulate ~10^3 ln terms, so the
    9th decimal is inside cross-engine summation-order noise.
    """
    d = load_table(spark, sf_dir, "documents")
    freq = (
        exploded_rows(d, [], tokens(F.col("text")), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.orderBy(F.desc("c"), F.asc("term"))
    top = (
        freq.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ZIPF_TOP)
        .select(
            F.log(F.col("rnk").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    cnt = F.count(F.lit(1))
    slope = (cnt * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        cnt * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    )
    # degenerate guard (mirrored in the oracle): < 2 ranked terms means
    # zero x-variance (and an EMPTY corpus divides the intercept by
    # COUNT = 0) — NULL stats, not a Spark ANSI DIVIDE_BY_ZERO crash.
    # Distinct ranks make the variance strictly positive at cnt >= 2.
    return top.agg(
        cnt.cast("bigint").alias("n_terms"),
        F.when(cnt >= 2, F.round(slope, 6)).alias("slope"),
        F.when(
            cnt >= 2, F.round((F.sum("y") - slope * F.sum("x")) / cnt, 6)
        ).alias("intercept"),
    )


_CHUNK_W = 64  # tokens per chunk
_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@TXT.register(
    "doc_chunk_windows",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             CAST(u.start AS BIGINT) AS chunk_start,
             list_slice(t, u.start, u.start + {_CHUNK_W} - 1) AS chunk
      FROM tok, UNNEST(range(1, greatest(len(t) - {_CHUNK_W} + 1, 1) + 1,
                             {_CHUNK_STRIDE})) AS u(start)
      WHERE len(t) > 0
    )
    SELECT doc_id, chunk_start,
           CAST(len(chunk) AS INT) AS n_chunk_tokens,
           array_to_string(chunk, ' ') AS chunk_text
    FROM chunks
    """,
)
def doc_chunk_windows(spark, sf_dir):
    """Overlapping token-window chunking — the retrieval/embedding prep
    stage that splits long documents into fixed-size overlapping passages
    (64 tokens, stride 48) while keeping provenance (doc_id, chunk_start).

    Scale: pure per-row explode with fan-out ~len/stride — no shuffle at
    all; chunk text stays bounded by the window size, so the output width
    is constant regardless of document length. Empty docs produce no
    chunks (matching the oracle's len(t) > 0 guard).
    """
    d = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    starts = F.expr(
        f"sequence(1, greatest(size(t) - {_CHUNK_W} + 1, 1), {_CHUNK_STRIDE})"
    )
    return (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id", F.explode(starts).alias("chunk_start"), "t"
        )
        .select(
            "doc_id",
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.expr(f"slice(t, chunk_start, {_CHUNK_W})").alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_start",
            F.size("chunk").alias("n_chunk_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


@TXT.register(
    "bpe_first_merges",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS t
      FROM documents
    ), pairs AS (
      SELECT substring(t, i, 2) AS pair
      FROM tok, unnest(generate_series(1, length(t) - 1)) AS g(i)
      WHERE length(t) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def bpe_first_merges(spark, sf_dir):
    """Tokenizer induction, first BPE iteration: count every adjacent
    character pair across the corpus's tokens and rank the top-20 merge
    candidates — the inner loop of byte-pair-encoding vocabulary training
    (each BPE step merges the most frequent adjacent pair; this query IS
    one step, distributed).

    Scale: token explode (index-explode, codegen) → one lookahead-regex
    pass per token for its overlapping char pairs → partial-aggregated
    count keyed on a ≤2-char string (bounded key space ≈ 36² — every
    partition pre-collapses to at most that many rows map-side, so the
    shuffle is constant-size regardless of corpus bytes) →
    TakeOrderedAndProject for the top-20. A full BPE trainer iterates this
    with a merge table; each iteration has this exact shuffle shape.
    Deterministic tie-break on the pair text keeps rank 20 stable.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = exploded_rows(d, [], tokens(F.col("text")), "t")
    pairs = exploded_rows(
        toks.filter(F.length("t") >= 2),
        [],
        F.expr("regexp_extract_all(t, '(?s)(?=(..))', 1)"),
        "pair",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


_BGC_MIN = 3  # corpus occurrences for a bigram to count as "known"


@TXT.register(
    "bigram_coverage_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), ex AS (
      SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bigram
      FROM tok, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
    ), corpus AS (
      SELECT bigram, COUNT(*) AS c FROM ex GROUP BY bigram
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CASE WHEN c >= {_BGC_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_known,
           round(CAST(SUM(CASE WHEN c >= {_BGC_MIN} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 9) AS coverage
    FROM ex JOIN corpus USING (bigram)
    GROUP BY doc_id
    """,
)
def bigram_coverage_quality(spark, sf_dir):
    """Bigram-coverage quality signal: for every document, the fraction of
    its word bigrams that occur at least {3} times in the whole corpus —
    the integer-exact stand-in for a KenLM out-of-vocabulary-rate filter
    (documents built from corpus-rare word transitions score low; gibberish
    and boilerplate-free templates surface at the extremes). Complements
    ``unigram_lm_quality``, which scores isolated-token likelihood only.

    Determinism: counts are exact integers end-to-end; the only float is
    the final single division, rounded to 9 (the repo's standard recipe —
    no order-dependent float accumulation anywhere). Scale: one bigram
    explode (codegen'd via ``exploded_rows``), two map-side-combined
    aggregations, and a shuffle join back on the bigram key sized by AQE
    (the bigram dictionary is unbounded — never force-broadcast it); the
    per-doc aggregate shuffles on doc_id only once.
    """
    d = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    grams = F.expr(
        "transform("
        " slice(sequence(1, greatest(size(t) - 1, 1)),"
        "       1, greatest(size(t) - 1, 0)),"
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    )
    ex = exploded_rows(
        d.select("doc_id", t.alias("t")), ["doc_id"], grams, "bigram"
    )
    corpus = ex.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    known = F.when(F.col("c") >= _BGC_MIN, 1).otherwise(0)
    return (
        ex.join(corpus, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(known).alias("n_known"),
            F.round(
                F.sum(known).cast("double") / F.count(F.lit(1)), 9
            ).alias("coverage"),
        )
    )


@TXT.register("compression_ratio_signal", oracle=None)
def compression_ratio_signal(spark, sf_dir):
    """Compressibility as a quality/repetition signal: per document, the
    zlib-compressed length and compression ratio of the raw text. Highly
    compressible documents are repetitive (templates, keyword stuffing,
    crawler traps) and are prune candidates — the signal C4/Gopher-style
    pipelines compute next to the repetition heuristics in
    ``doc_repetition_stats``, but content-agnostic (no tokenizer).

    No oracle: DuckDB has no zlib surface, so the driver records rows-only;
    ``tests/test_compression_signal.py`` value-checks a sample against an
    INDEPENDENT parquet read + direct ``zlib.compress`` instead (zlib at a
    pinned level is bit-deterministic, so the check is exact). Scale: one
    narrow Arrow-batched map over the text column — no shuffle at all;
    the flag threshold join is a literal.
    """
    import pandas as pd

    def ratio_batches(it):
        import zlib

        for pdf in it:
            raw = [t.encode("utf-8") for t in pdf["text"]]
            comp = [len(zlib.compress(b, 6)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "raw_bytes": [len(b) for b in raw],
                    "zlib_bytes": comp,
                }
            )

    d = load_table(spark, sf_dir, "documents")
    out = d.select("doc_id", "text").mapInPandas(
        ratio_batches, "doc_id long, raw_bytes long, zlib_bytes long"
    )
    return out.select(
        "doc_id",
        "raw_bytes",
        "zlib_bytes",
        F.round(
            F.col("zlib_bytes").cast("double") / F.col("raw_bytes"), 9
        ).alias("ratio"),
        (
            F.col("zlib_bytes").cast("double") / F.col("raw_bytes") < 0.35
        ).alias("is_repetitive"),
    )


@TXT.register(
    "unicode_normalize_names",
    oracle="""
    WITH accented AS (
      SELECT c_custkey,
             translate(c_name, 'AEIOUaeiou',
                       'ÁÉÍÓÚáéíóú') AS raw_name
      FROM customer
    )
    SELECT c_custkey, raw_name,
           strip_accents(nfc_normalize(raw_name)) AS folded,
           len(raw_name) AS n_chars_raw,
           len(strip_accents(nfc_normalize(raw_name))) AS n_chars_folded
    FROM accented
    """,
)
def unicode_normalize_names(spark, sf_dir):
    """Unicode normalization + accent folding — the text-normalization
    stage every multilingual pipeline runs before matching/dedup (NFC to
    canonical-compose, then diacritic stripping). The corpus is ASCII, so
    accented input is synthesized deterministically (vowels → acute
    forms) in BOTH engines; the oracle folds with DuckDB's native
    ``strip_accents(nfc_normalize(...))`` while Spark folds with a
    vectorized ``unicodedata`` kernel (NFKD → drop combining marks →
    NFC) — a hash match proves the two fold identically, codepoint for
    codepoint, including the length accounting (``len`` counts
    codepoints in both engines).

    Scale: the Python stage is one narrow Arrow-batched map (no shuffle);
    character translate and length stay JVM-side in codegen.
    """
    import pandas as pd

    c = load_table(spark, sf_dir, "customer")
    accented = c.select(
        "c_custkey",
        F.translate(
            F.col("c_name"), "AEIOUaeiou", "ÁÉÍÓÚáéíóú"
        ).alias("raw_name"),
    )

    def fold_batches(it):
        import unicodedata

        def fold(s: str) -> str:
            decomposed = unicodedata.normalize("NFKD", s)
            stripped = "".join(
                ch for ch in decomposed if not unicodedata.combining(ch)
            )
            return unicodedata.normalize("NFC", stripped)

        for pdf in it:
            yield pd.DataFrame(
                {
                    "c_custkey": pdf["c_custkey"].values,
                    "raw_name": pdf["raw_name"].values,
                    "folded": [fold(s) for s in pdf["raw_name"]],
                }
            )

    folded = accented.mapInPandas(
        fold_batches, "c_custkey long, raw_name string, folded string"
    )
    return folded.select(
        "c_custkey",
        "raw_name",
        "folded",
        F.length("raw_name").alias("n_chars_raw"),
        F.length("folded").alias("n_chars_folded"),
    )


# -- BM25 ranked retrieval --------------------------------------------------
# Fixed benchmark query set (query_id, term); literal in both engines. The
# corpus vocabulary is synthetic-but-realistic (TESTDATA.md); 'dup' is the
# one rare term, so q4 exercises the high-idf path.
_BM25_QUERIES = [
    (1, "spark"), (1, "join"),
    (2, "hash"), (2, "merge"), (2, "batch"),
    (3, "vector"), (3, "stream"),
    (4, "dup"), (4, "scan"),
]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10

_BM25_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)


#: (applicationId, sf_dir, content fingerprint) -> (dl, tf) lazily-
#: checkpointed frames shared by bm25_rank_queries and
#: hybrid_retrieval_rrf. Without the share the hybrid plan tokenized the
#: corpus for its coverage ranker AND inside the BM25 subquery (6 parquet
#: scans, no ReusedExchange); with it the corpus is tokenized once per
#: session. The fingerprint (documents.parquet mtime/size) invalidates the
#: memo if the testdata regenerates mid-session — same contract as the
#: Lloyd-centroid memo.
_BM25_FRAME_CACHE: dict = {}


def _bm25_frames(spark, sf_dir):
    """(tok, dl, tf): per-doc token arrays, token lengths, and
    per-(query, term, doc) term frequencies for the literal benchmark
    query table, each checkpointed.

    One tokenization pass feeds all three: tok is the checkpointed
    (doc_id, tokens) table the whole retrieval family shares (BM25,
    hybrid's coverage ranker, the positional reranker), dl is |docs|
    rows, tf is bounded by |query terms| x matching docs (the broadcast
    query join filters the explode before any shuffle — the BM25 scale
    property, kept intact).
    """
    from .base import memo_get, memo_put, path_fingerprint

    fp = path_fingerprint(f"{sf_dir}/documents.parquet")
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = memo_get(_BM25_FRAME_CACHE, key, fp)
    if cached is not None:
        return cached
    d = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    tok = d.select("doc_id", tokens(F.col("text")).alias("t")).localCheckpoint(
        eager=False
    )
    dl = tok.select("doc_id", F.size("t").alias("dl")).localCheckpoint(
        eager=False
    )
    tf = (
        exploded_rows(tok, ["doc_id"], F.col("t"), "term")
        .join(F.broadcast(q), "term")
        .groupBy("query_id", "term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    memo_put(_BM25_FRAME_CACHE, key, fp, (tok, dl, tf))
    return tok, dl, tf


def _bm25_shared_frames(spark, sf_dir):
    """(dl, tf) — the BM25/hybrid slice of :func:`_bm25_frames`."""
    _, dl, tf = _bm25_frames(spark, sf_dir)
    return dl, tf


@TXT.register(
    "bm25_rank_queries",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES {_BM25_VALUES}),
    tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), dl AS (
      SELECT doc_id, len(t) AS dl FROM tok
    ), n AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT query_id, term, doc_id, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM tok)
      JOIN q USING (term)
      GROUP BY query_id, term, doc_id
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT query_id, doc_id,
             CAST(SUM(CAST(
               ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / n.avgdl))
             AS DECIMAL(18,9))) AS DOUBLE) AS score
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN n
      GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rank, score FROM (
      SELECT query_id, doc_id, score,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
             ) AS INT) AS rank
      FROM scored)
    WHERE rank <= {_BM25_TOPK}
    """,
)
def bm25_rank_queries(spark, sf_dir):
    """BM25 ranked retrieval (k1=1.2, b=0.75): top-10 documents for each of
    four fixed benchmark queries — the scoring core of corpus search,
    benchmark decontamination by retrieval, and retrieval-based quality
    filtering; complements ``tfidf_top_terms`` (per-doc term profile) with
    an actual per-query ranking.

    Determinism (the driver hashes exact values): tf, df, dl, N are exact
    integers in any partitioning; avgdl and each per-term partial score are
    single double expressions over those integers, identical in both
    engines; the per-document sum over query terms uses the repo's decimal
    recipe (cast each term's double partial to DECIMAL(18,9), sum exactly,
    cast back) so term order never matters; rank ties break on doc_id.

    Scale: the query-term table is literal and broadcast, so the token
    explode is filtered to query terms BEFORE any shuffle — the whole
    corpus contributes only |q_terms| × matching rows downstream. One
    aggregation to (query_id, term, doc_id), a broadcast of the tiny df
    and 1-row N aggregates back, one shuffle join with per-doc lengths on
    doc_id (AQE-sized), one agg to (query_id, doc_id), and a per-query
    window whose partitions are bounded by the candidate sets. Nothing is
    collected; k and |queries| bound the output.
    """
    dl, tf = _bm25_shared_frames(spark, sf_dir)
    n = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    partial = (
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        )
        * F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(n))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(partial.cast("decimal(18,9)"))
            .cast("double")
            .alias("score")
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "doc_id", "rank", "score")
    )


# -- sharded inverted index -------------------------------------------------
# Posting lists are sharded by a doc-id bucket so no single aggregation state
# is ever proportional to a term's full document frequency — the property
# that keeps the build viable when a stopword's postings are billions long.
_INVIDX_BUCKET = 100


@TXT.register(
    "inverted_index_postings",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, unnest(list_distinct(
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> ''))) AS term
      FROM documents
    ), shard AS (
      SELECT term,
             doc_id // {_INVIDX_BUCKET} AS bucket,
             COUNT(*) AS df_bucket,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings
      FROM ex GROUP BY term, doc_id // {_INVIDX_BUCKET}
    )
    SELECT term, bucket, df_bucket,
           CAST(SUM(df_bucket) OVER (PARTITION BY term) AS BIGINT) AS df,
           postings
    FROM shard
    """,
)
def inverted_index_postings(spark, sf_dir):
    """Sharded inverted-index build: for every (term, doc-id bucket), the
    sorted posting list of documents containing the term, the bucket-local
    document frequency, and the term's global df — the index structure
    behind corpus search and fast decontamination lookups.

    The output row is (term, bucket), NOT (term): a term's aggregation
    state is bounded by the bucket width ({_INVIDX_BUCKET} docs), so a
    stopword with billions of postings at 100 TB shards across buckets
    instead of materializing one unbounded collect_list — the same
    reason production indexes store postings in fixed-size segments. The
    global df comes from a window over the term's buckets (bounded by
    n_docs/bucket_width rows per term), not a second corpus scan.

    Determinism: postings are numerically sorted then comma-joined (the
    flat-schema rule for oracled queries); counts are exact integers.
    Scale: one distinct-token explode, one aggregation keyed (term,
    bucket) — skew-free by construction because hot terms split across
    buckets — and a window over the small shard table.
    """
    d = load_table(spark, sf_dir, "documents")
    ex = exploded_rows(
        d.select("doc_id", distinct_tokens(F.col("text")).alias("t")),
        ["doc_id"],
        F.col("t"),
        "term",
    )
    shard = ex.groupBy(
        "term",
        (F.col("doc_id") / _INVIDX_BUCKET).cast("bigint").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("df_bucket"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    return shard.select(
        "term",
        "bucket",
        "df_bucket",
        F.sum("df_bucket").over(W.partitionBy("term")).alias("df"),
        "postings",
    )


_RRF_K = 60  # standard reciprocal-rank-fusion constant
_RRF_CAND = 10  # per-ranker candidate depth (the bm25 query's own top-k)


# The hybrid oracle's CTE body and final select are module-level parts so
# the round-9 rerank stage can CTE the whole ranked output (the proven
# compose-from-green-fragments pattern, cf. similarity._RECALL_ORACLE).
_HYBRID_CTE_BODY = f"""q(query_id, term) AS (VALUES {_BM25_VALUES}),
    tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), dl AS (
      SELECT doc_id, len(t) AS dl FROM tok
    ), n AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT query_id, term, doc_id, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM tok)
      JOIN q USING (term)
      GROUP BY query_id, term, doc_id
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), bm25 AS (
      SELECT query_id, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
             ) AS INT) AS r_bm25
      FROM (
        SELECT query_id, doc_id,
               CAST(SUM(CAST(
                 ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * tf.tf * ({_BM25_K1} + 1.0)
                 / (tf.tf + {_BM25_K1}
                    * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / n.avgdl))
               AS DECIMAL(18,9))) AS DOUBLE) AS score
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN n
        GROUP BY query_id, doc_id
      )
    ), cov AS (
      SELECT query_id, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY n_terms DESC, dl ASC, doc_id
             ) AS INT) AS r_cov
      FROM (
        SELECT tf.query_id, tf.doc_id,
               COUNT(DISTINCT tf.term) AS n_terms, MAX(dl.dl) AS dl
        FROM tf JOIN dl USING (doc_id)
        GROUP BY tf.query_id, tf.doc_id
      )
    ), fused AS (
      SELECT COALESCE(b.query_id, c.query_id) AS query_id,
             COALESCE(b.doc_id, c.doc_id) AS doc_id,
             b.r_bm25, c.r_cov,
             COALESCE(1.0 / ({_RRF_K} + b.r_bm25), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + c.r_cov), 0.0) AS rrf_score
      FROM (SELECT * FROM bm25 WHERE r_bm25 <= {_RRF_CAND}) b
      FULL OUTER JOIN (SELECT * FROM cov WHERE r_cov <= {_RRF_CAND}) c
        ON b.query_id = c.query_id AND b.doc_id = c.doc_id
    )"""

_HYBRID_FINAL_SELECT = f"""SELECT query_id, doc_id, rrf_score,
           CAST(COALESCE(r_bm25, 0) AS INT) AS r_bm25,
           CAST(COALESCE(r_cov, 0) AS INT) AS r_cov,
           rank
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
      ) AS INT) AS rank
      FROM fused)
    WHERE rank <= {_BM25_TOPK}"""


@TXT.register(
    "hybrid_retrieval_rrf",
    oracle=f"""
    WITH {_HYBRID_CTE_BODY}
    {_HYBRID_FINAL_SELECT}
    """,
)
def hybrid_retrieval_rrf(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (RRF, k=60): fuse the
    BM25 ranking with an independent term-coverage ranking (distinct query
    terms matched, shorter doc first) — the standard way production search
    merges lexical scorers (or lexical + vector) without calibrating score
    scales, because RRF consumes only RANKS. A document missing from one
    ranker's top-{10} simply contributes nothing from that ranker.

    Determinism: both input rankings are integer row_numbers over already
    cross-engine-stable orderings (BM25's decimal-summed scores; integer
    coverage counts with dl/doc_id tiebreaks); the fused score is a fixed
    two-term sum of exact reciprocals — no accumulation, no libm.

    Scale: candidate generation is bounded per ranker per query (top-k
    windows over candidate sets already filtered to query-term matches);
    the fusion is a full outer join of two ≤k-row-per-query tables and a
    window over ≤2k rows per query. Everything upstream shares the BM25
    pipeline's shape (literal broadcast query table filters the corpus
    explode before any shuffle).
    """
    # the coverage ranker reads the SAME checkpointed (dl, tf) frames the
    # BM25 subquery uses — one corpus tokenization for the whole fusion
    dl, tf = _bm25_shared_frames(spark, sf_dir)
    bm25 = bm25_rank_queries(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("r_bm25")
    )
    wcov = W.partitionBy("query_id").orderBy(
        F.desc("n_terms"), F.asc("dl"), "doc_id"
    )
    cov = (
        tf.join(dl, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count_distinct("term").alias("n_terms"),
            F.max("dl").alias("dl"),
        )
        .withColumn("r_cov", F.row_number().over(wcov))
        .filter(F.col("r_cov") <= _RRF_CAND)
        .select("query_id", "doc_id", "r_cov")
    )
    fused = (
        bm25.join(cov, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            "r_bm25",
            "r_cov",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_bm25")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_cov")),
                    F.lit(0.0),
                )
            ).alias("rrf_score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select(
            "query_id",
            "doc_id",
            "rrf_score",
            F.coalesce("r_bm25", F.lit(0)).alias("r_bm25"),
            F.coalesce("r_cov", F.lit(0)).alias("r_cov"),
            "rank",
        )
    )


@TXT.register(
    "rerank_positional_ce",
    oracle=f"""
    WITH {_HYBRID_CTE_BODY},
    ranked AS ({_HYBRID_FINAL_SELECT}),
    cand AS (
      SELECT r.query_id, r.doc_id, r.rank AS rrf_rank, tok.t,
             len(tok.t) AS dl
      FROM ranked r JOIN tok ON tok.doc_id = r.doc_id
    ),
    contrib AS (
      SELECT c.query_id, c.doc_id, c.rrf_rank, c.dl,
             COALESCE(list_position(c.t, q.term), 0) AS pos
      FROM cand c JOIN q ON q.query_id = c.query_id
    ),
    scored AS (
      SELECT query_id, doc_id, rrf_rank,
             CAST(SUM(CAST(CASE WHEN pos >= 1
               THEN 1.0 / (1.0 + CAST(pos - 1 AS DOUBLE)
                                 / CAST(dl AS DOUBLE))
               ELSE 0.0 END AS DECIMAL(18,9))) AS DOUBLE) AS ce_score
      FROM contrib
      GROUP BY query_id, doc_id, rrf_rank
    )
    SELECT query_id, doc_id, ce_score,
           CAST(rrf_rank AS INT) AS rrf_rank,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY ce_score DESC, rrf_rank) AS INT) AS ce_rank
    FROM scored
    """,
)
def rerank_positional_ce(spark, sf_dir):
    """Cross-encoder-style reranking stage over the hybrid-retrieval
    output (round-9 unfreeze): re-score each of `hybrid_retrieval_rrf`'s
    top-{10} candidates JOINTLY against its query — every (query, doc)
    pair gets a fresh score from the pair itself, the defining shape of a
    cross-encoder rerank — and emit the re-ranked list alongside the
    first-stage rank. The scorer is a deterministic positional-coverage
    proxy standing in for a neural cross-encoder: each query term present
    in the document contributes 1/(1 + first_position/doc_len), so
    earlier, fuller coverage wins (per-term doubles are decimal-summed,
    the BM25 float discipline). The Spark plumbing — bounded candidate
    set, broadcast query table, per-pair joint scoring, per-query
    re-rank window — is exactly the contract a model-backed scorer
    (Pandas-UDF batch inference) would slot into.

    Fully value-oracled: the oracle CTEs the entire hash-green hybrid
    pipeline (shared fragment `_HYBRID_CTE_BODY`) and replays the
    positional scorer in SQL.

    Scale: the rerank touches ≤ top-k·|queries| pairs regardless of
    corpus size — THE property that makes two-stage retrieval viable at
    100 TB (first stage prunes with indexes, second stage spends model
    compute on a bounded set). The candidate-side tokenization re-reads
    only matched docs via a broadcast semi-side join, no shuffle.
    """
    ranked = hybrid_retrieval_rrf(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("rrf_rank")
    )
    # broadcast the <= k*|queries| candidate list against the SESSION'S
    # checkpointed token table (one corpus tokenization feeds the whole
    # retrieval family) instead of re-scanning + re-tokenizing documents
    tok, _, _ = _bm25_frames(spark, sf_dir)
    cand = tok.join(F.broadcast(ranked), "doc_id")
    q = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    contrib = cand.join(F.broadcast(q), "query_id").select(
        "query_id",
        "doc_id",
        "rrf_rank",
        F.expr("array_position(t, term)").alias("pos"),
        F.size("t").alias("dl"),
    )
    per_term = (
        F.when(
            F.col("pos") >= 1,
            F.lit(1.0)
            / (
                F.lit(1.0)
                + (F.col("pos") - 1).cast("double")
                / F.col("dl").cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(18,9)")
    )
    scored = contrib.groupBy("query_id", "doc_id", "rrf_rank").agg(
        F.sum(per_term).cast("double").alias("ce_score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("ce_score"), "rrf_rank")
    return scored.select(
        "query_id",
        "doc_id",
        "ce_score",
        "rrf_rank",
        F.row_number().over(w).alias("ce_rank"),
    )


@TXT.register(
    "readability_flesch",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '')) AS n_words,
             greatest(len(list_filter(
               string_split_regex(text, '[.!?]+'),
               x -> trim(x) <> '')), 1) AS n_sents,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syl
      FROM documents
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sents AS BIGINT) AS n_sents,
           CAST(n_syl AS BIGINT) AS n_syllables,
           round(206.835
                 - 1.015 * CAST(n_words AS DOUBLE) / n_sents
                 - 84.6 * CAST(n_syl AS DOUBLE) / n_words, 6)
             AS flesch_score
    FROM t WHERE n_words > 0
    """,
)
def readability_flesch(spark, sf_dir):
    """Flesch reading-ease score per document — the classic readability
    quality signal (low scores flag dense/garbled text; curation
    pipelines gate or stratify on it). Sentences are split on
    terminal-punctuation runs, syllables approximated as vowel-group
    runs — the standard hyphenation-free heuristic, and crucially one
    both engines compute identically (a single regexp count).

    Determinism: word/sentence/syllable counts are exact integers from
    shared-regex tokenization; the score is one closed-form double over
    three integers, rounded to 6. Scale: pure per-row projection in the
    scan stage — zero shuffles, codegen end to end.
    """
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(tokens(F.col("text")))
    n_sents = F.greatest(
        F.size(
            F.filter(
                F.split(F.col("text"), "[.!?]+"),
                lambda x: F.trim(x) != "",
            )
        ),
        F.lit(1),
    )
    n_syl = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    t = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syl.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    return t.select(
        "doc_id",
        "n_words",
        "n_sents",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * F.col("n_words").cast("double") / F.col("n_sents")
            - F.lit(84.6)
            * F.col("n_syllables").cast("double")
            / F.col("n_words"),
            6,
        ).alias("flesch_score"),
    )


_PMI_MIN_COUNT = 5  # bigram support floor
_PMI_TOPK = 30


@TXT.register(
    "word_cooccurrence_pmi",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), uni AS (
      SELECT unnest(t) AS w FROM tok
    ), ucnt AS (
      SELECT w, COUNT(*) AS c FROM uni GROUP BY w
    ), tot AS (
      SELECT SUM(c) AS n FROM ucnt
    ), bi AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)
    ), bcnt AS (
      SELECT w1, w2, COUNT(*) AS c_ab FROM bi GROUP BY w1, w2
    ), scored AS (
      SELECT w1, w2, c_ab,
             round(ln(CAST(c_ab AS DOUBLE) * n / (a.c * b.c)), 6) AS pmi
      FROM bcnt
      JOIN ucnt a ON a.w = w1
      JOIN ucnt b ON b.w = w2
      CROSS JOIN tot
      WHERE c_ab >= {_PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab, pmi, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        ORDER BY pmi DESC, w1, w2) AS INT) AS rank
      FROM scored)
    WHERE rank <= {_PMI_TOPK}
    """,
)
def word_cooccurrence_pmi(spark, sf_dir):
    """Pointwise mutual information over adjacent word pairs: the top-{30}
    most-associated bigrams with support ≥ {5} — the classic collocation
    detector (PMI finds "los angeles"-style units whose joint frequency
    far exceeds chance; raw bigram counts just find frequent words next
    to each other). Feeds tokenizer-merge candidates and phrase mining.

    Determinism: unigram/bigram counts and the corpus total are exact
    integers; PMI is one ln over an integer ratio, rounded to 6 BEFORE
    ranking (so the rank ordering is cross-engine stable), ties broken
    on the pair text. Scale: two token-keyed map-side-combined
    aggregates, two broadcast-sized joins of the bigram table against
    the unigram dictionary (AQE decides; the dictionary is corpus-
    vocabulary-sized), one global top-k window over support-filtered
    survivors (TakeOrderedAndProject shape).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", tokens(F.col("text")).alias("t"))
    uni = exploded_rows(tok, [], F.col("t"), "w")
    # checkpoint the dictionary: the corpus total comes from summing its
    # counts (one vocab-sized agg) instead of a second full pass over the
    # exploded token stream, and the two scoring joins below reuse the
    # same materialization instead of re-aggregating
    ucnt = (
        uni.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    n = ucnt.agg(F.coalesce(F.sum("c"), F.lit(0))).collect()[0][0]
    bi = exploded_rows(
        tok.filter(F.size("t") >= 2),
        [],
        F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> struct(element_at(t, i) AS w1,"
            "             element_at(t, i + 1) AS w2))"
        ),
        "pr",
    ).select("pr.w1", "pr.w2")
    bcnt = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    a = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("__ca"))
    b = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("__cb"))
    scored = (
        bcnt.join(a, "w1")
        .join(b, "w2")
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab").cast("double")
                    * n
                    / (F.col("__ca") * F.col("__cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = W.orderBy(F.desc("pmi"), "w1", "w2")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PMI_TOPK)
        .select("w1", "w2", "c_ab", "pmi", "rank")
    )


@TXT.register(
    "doc_repetition_metrics",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ), base AS (
      SELECT doc_id, lang, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1]) AS bigrams
      FROM tok WHERE len(toks) >= 2
    ), big AS (
      SELECT doc_id, unnest(bigrams) AS bg FROM base
    ), cnt AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg
    ), top AS (
      SELECT doc_id, MAX(c) AS top_bigram_count FROM cnt GROUP BY doc_id
    )
    SELECT b.doc_id, b.lang,
           CAST(len(b.toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(b.toks)) AS BIGINT) AS n_distinct_tokens,
           CAST(len(b.toks) - len(list_distinct(b.toks)) AS DOUBLE)
             / len(b.toks) AS dup_token_frac,
           CAST(len(b.toks) - 1 AS BIGINT) AS n_bigrams,
           CAST(t.top_bigram_count AS BIGINT) AS top_bigram_count,
           CAST(t.top_bigram_count AS DOUBLE) / (len(b.toks) - 1)
             AS top_bigram_mass
    FROM base b JOIN top t USING (doc_id)
    """,
)
def doc_repetition_metrics(spark, sf_dir):
    """Intra-document repetition signals — the Gopher-rules family
    (Rae et al. 2021, Table A1) the quality gate samples but never
    exposes as raw per-document metrics: duplicate-token fraction
    (1 - distinct/total) and the mass of the single most repeated
    bigram. Boilerplate, keyboard-mash and template spam light up both;
    a pipeline thresholds them next to `text_quality_stats` and
    `gopher_quality_gate`.

    Determinism: every count is int64; the two fractions are ONE divide
    on exact int64 operands each (IEEE-exact, bit-identical cross-engine
    per the repo rule) and ship unrounded.

    Scale: the Spark side never shuffles — the top-bigram count comes
    from a per-document `array_sort` + `aggregate` longest-equal-run
    fold over the (bounded) bigram array, a pure narrow map; the
    unnest→GROUP BY in the DuckDB oracle is the same computation stated
    relationally. Docs under 2 tokens are excluded in both engines
    (no bigram exists; the md5-twin shingle rule's precedent).
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= 2)
    bigrams_sorted = F.array_sort(
        F.transform(
            F.slice(F.col("toks"), 1, F.size("toks") - 1),
            lambda x, i: F.concat_ws(
                " ", x, F.element_at(F.col("toks"), i + F.lit(2))
            ),
        )
    )
    run = lambda acc, x: F.when(  # noqa: E731 — longest-equal-run step
        x == acc["prev"], acc["run"] + F.lit(1)
    ).otherwise(F.lit(1))
    top_count = F.aggregate(
        bigrams_sorted,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_tok = F.size("toks").cast("long")
    n_dis = F.size(F.array_distinct("toks")).cast("long")
    return t.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        n_dis.alias("n_distinct_tokens"),
        ((n_tok - n_dis).cast("double") / n_tok).alias("dup_token_frac"),
        (n_tok - F.lit(1)).alias("n_bigrams"),
        top_count.cast("long").alias("top_bigram_count"),
        (top_count.cast("double") / (n_tok - F.lit(1)).cast("double")).alias(
            "top_bigram_mass"
        ),
    )


#: Learned BPE merge table, in rank order (rank = creation order, so a
#: later merge's components always exist before it applies — the
#: invariant that makes one pass per merge in rank order equivalent to
#: the usual lowest-rank-first iterative apply). A real pipeline loads
#: this from a tokenizer artifact (the table IS the tokenizer); the
#: literal here plays the broadcast/plan-literal role those artifacts
#: take at scale, like the classifier weights in quality_model_score.
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("e", "n"),
    ("a", "t"), ("o", "u"), ("s", "t"), ("t", "i"), ("ti", "on"),
    ("in", "g"),
]


def _bpe_encode_expr(col: str, engine: str) -> str:
    """The merge-application chain over token column ``col``, as a SQL
    expression valid in ``engine`` ('spark' | 'duckdb') — kept in
    lockstep by construction (one generator, two regexp_replace
    spellings; the replace() chain itself is dialect-identical).

    Encoding: the symbol sequence is a string with every symbol flanked
    by double separators, e.g. 'the' -> '||t||h||e||'. Applying merge
    (a, b) is then ONE leftmost-first non-overlapping string replace of
    '|a||b|' with '|ab|': the outer pipes of each neighbour boundary
    survive the replacement, so consecutive occurrences both merge
    ('inin' -> 'in','in'), while the pattern can never match inside a
    longer symbol ('xa','b' does not merge as (a, b)). This is exactly
    the greedy left-to-right scan of the sequential BPE fold — verified
    symbol-for-symbol against a reference fold in
    tests/test_bpe_apply.py — and it stays entirely inside whole-stage
    codegen (16 chained replaces; no lambda, no UDF).
    """
    if engine == "spark":
        e = f"concat('||', regexp_replace({col}, '(.)', '$1||'))"
    else:
        e = "'||' || regexp_replace(" + col + r", '(.)', '\1||', 'g')"
    for a, b in _BPE_MERGES:
        e = f"replace({e}, '|{a}||{b}|', '|{a}{b}|')"
    return e


_BPE_APPLY_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text),
                    '[^a-z0-9]+'), x -> x <> '')) AS t
      FROM documents
    ), enc AS (
      SELECT doc_id, t, {_bpe_encode_expr("t", "duckdb")} AS e FROM tok
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_word_tokens,
           CAST(SUM(length(t)) AS BIGINT) AS n_token_chars,
           CAST(SUM((length(e) - length(t)) // 2 - 1) AS BIGINT)
             AS n_bpe_tokens,
           CAST(CAST(SUM(length(t)) AS BIGINT) AS DOUBLE)
             / CAST(SUM((length(e) - length(t)) // 2 - 1) AS BIGINT)
             AS chars_per_bpe_token
    FROM enc GROUP BY doc_id
    """


@TXT.register("bpe_apply_merges", oracle=_BPE_APPLY_ORACLE)
def bpe_apply_merges(spark, sf_dir):
    """Full BPE ENCODING — applying a learned merge table to the corpus,
    the step every real pipeline runs before token counts feed
    `sequence_packing` / `mixture_token_allocation` (the family so far
    had induction — `bpe_first_merges` — and a regex approximation —
    `token_count_bpe` — but could not APPLY a vocabulary; r13 VERDICT
    item 4). Each word token is encoded against the rank-ordered
    literal merge table `_BPE_MERGES`; the output is the per-document
    token accounting a packing stage consumes: word tokens, characters,
    post-merge BPE tokens, and the compression ratio.

    Algorithm: one pass per merge in rank order over a double-separator
    symbol string ('||t||h||e||'; see `_bpe_encode_expr`). Rank order
    makes single passes complete — a merge's components are created
    only by LOWER-ranked merges, and within one pass the merged symbol
    can never re-form its own pattern (a+b == a or a+b == b is
    impossible) — so the chained replaces compute the same encoding as
    the iterative lowest-rank-first loop. Verified against a reference
    Python fold AND DuckDB symbol-for-symbol on adversarial tokens
    (overlaps, chained merges: 'tition' -> ti,tion) in
    tests/test_bpe_apply.py.

    Determinism: string ops and integer arithmetic end to end; the one
    float is a single int64->double divide (IEEE-exact on identical
    inputs, shipped unrounded per the repo rule). Symbol counting needs
    no re-parse: every symbol boundary is exactly two pipes and symbols
    are pipe-free, so n_symbols = (len(encoded) - len(token))/2 - 1.

    Scale: a narrow map — tokenize, explode (`exploded_rows`, codegen'd
    position explode), 16 chained replaces, one map-side-combined
    groupBy(doc_id). No join, no broadcast state beyond the plan
    literal; a 100k-merge production table swaps the literal chain for
    a Pandas-UDF trie encoder in the same slot, with the identical
    explode/agg shape around it.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = exploded_rows(d, ["doc_id"], tokens(F.col("text")), "t")
    enc = toks.select(
        "doc_id",
        F.length("t").alias("n_chars"),
        (
            (
                F.length(F.expr(_bpe_encode_expr("t", "spark")))
                - F.length("t")
            )
            .cast("long")
            / 2
            - 1
        ).cast("long").alias("n_sym"),
    )
    g = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_word_tokens"),
        F.sum(F.col("n_chars").cast("long")).alias("n_token_chars"),
        F.sum("n_sym").alias("n_bpe_tokens"),
    )
    return g.select(
        "doc_id",
        "n_word_tokens",
        "n_token_chars",
        "n_bpe_tokens",
        (
            F.col("n_token_chars").cast("double") / F.col("n_bpe_tokens")
        ).alias("chars_per_bpe_token"),
    )


@TXT.register(
    "bpe_fertility_by_lang",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(lower(text),
                    '[^a-z0-9]+'), x -> x <> '')) AS t
      FROM documents
    ), enc AS (
      SELECT doc_id, lang, t, {_bpe_encode_expr("t", "duckdb")} AS e
      FROM tok
    )
    SELECT lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_word_tokens,
           CAST(SUM((length(e) - length(t)) // 2 - 1) AS BIGINT)
             AS n_bpe_tokens,
           CAST(CAST(SUM((length(e) - length(t)) // 2 - 1) AS BIGINT)
                AS DOUBLE) / CAST(COUNT(*) AS BIGINT) AS fertility,
           CAST(CAST(SUM(length(t)) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS BIGINT) AS avg_token_chars
    FROM enc GROUP BY lang
    """,
)
def bpe_fertility_by_lang(spark, sf_dir):
    """Tokenizer FERTILITY by language — BPE tokens emitted per word
    token, the standard multilingual tokenizer-evaluation metric (a
    vocabulary trained on one language fragments the others; fertility
    is how that cost is measured and how per-language token budgets are
    corrected before `mixture_token_allocation` apportions them). The
    consumer view of `bpe_apply_merges`: same `_BPE_MERGES` table, same
    `_bpe_encode_expr` replace chain, aggregated per corpus language
    instead of per document.

    Determinism: int64 counts and sums end to end; fertility and
    avg_token_chars are single int64->double divides on exact operands
    (unrounded per the repo rule). Zero-token documents drop from
    n_docs in both engines (explode/unnest emit no rows).

    Scale: one narrow tokenize+encode scan into a map-side-combined
    groupBy(lang) — the distinct-doc count shuffles (lang, doc_id)
    partials, everything else collapses to |langs| rows before the
    exchange. The per-language fertility table is what a 100 TB
    multilingual run reads to set sampling temperatures; it costs one
    scan here and there.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = exploded_rows(
        d, ["doc_id", "lang"], tokens(F.col("text")), "t"
    )
    enc = toks.select(
        "lang",
        "doc_id",
        F.length("t").cast("long").alias("n_chars"),
        (
            (
                F.length(F.expr(_bpe_encode_expr("t", "spark")))
                - F.length("t")
            ).cast("long")
            / 2
            - 1
        ).cast("long").alias("n_sym"),
    )
    g = enc.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_word_tokens"),
        F.sum("n_sym").alias("n_bpe_tokens"),
        F.sum("n_chars").alias("n_token_chars"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_word_tokens",
        "n_bpe_tokens",
        (
            F.col("n_bpe_tokens").cast("double")
            / F.col("n_word_tokens")
        ).alias("fertility"),
        (
            F.col("n_token_chars").cast("double")
            / F.col("n_word_tokens")
        ).alias("avg_token_chars"),
    )


_BPE_TRIE_AGREE_ORACLE = f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text),
                    '[^a-z0-9]+'), x -> x <> '')) AS t
      FROM documents
    ), enc AS (
      SELECT t, (length({_bpe_encode_expr("t", "duckdb")}) - length(t))
                  // 2 - 1 AS n_sym
      FROM tok
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT t) AS BIGINT) AS n_distinct_tokens,
           CAST(SUM(n_sym) AS BIGINT) AS n_chain_symbols,
           CAST(SUM(n_sym) AS BIGINT) AS n_trie_symbols,
           CAST(COUNT(*) AS BIGINT) AS n_tokens_agree
    FROM enc
    """


@TXT.register("bpe_trie_encoder_agreement", oracle=_BPE_TRIE_AGREE_ORACLE)
def bpe_trie_encoder_agreement(spark, sf_dir):
    """Cross-encoder audit for the PRODUCTION BPE path (r14 VERDICT
    item 3): every corpus token is encoded twice — by the codegen
    replace chain (`_bpe_encode_expr`, the 16-merge literal plan) AND
    by the Arrow-batched Pandas-UDF priority-merge encoder
    (`functions/bpe.py`, the shape a 100k-merge table requires) — and
    the audit emits total tokens, distinct tokens, per-encoder symbol
    totals, and the count of tokens where the encoders agree.

    The oracle is the envelope-audit trick made exact: DuckDB runs only
    the replace chain (the already-driver-verified semantics) and
    asserts n_trie_symbols == n_chain_symbols and n_tokens_agree ==
    n_tokens — so ANY divergence of the Python priority-merge encoder
    from the pinned sequential-fold semantics lands as a driver hash
    red, not a silent drift. The deeper equivalence (priority == fold
    on any creation-ordered table, incl. a trained ~1k-merge table) is
    pinned in tests/test_bpe_trie.py; this query keeps the claim under
    PERMANENT driver rotation on the real corpus.

    Determinism: integer counts only — symbol counts are exact in both
    encoders, no floats anywhere.

    Scale: one tokenize+explode scan; the UDF adds one Arrow
    string-column round trip with a per-batch distinct-token memo
    (Zipf makes the steady-state cost a dict lookup per token); the
    global agg collapses map-side to one row, and the distinct-token
    count shuffles |vocab| partials. This is the plan a production
    tokenizer-swap validation runs at 100 TB — encode-old, encode-new,
    compare — and it is a narrow map plus a 1-row reduce.
    """
    from ..functions.bpe import bpe_encode_udf

    d = load_table(spark, sf_dir, "documents")
    toks = exploded_rows(d, [], tokens(F.col("text")), "t")
    enc_udf = bpe_encode_udf(_BPE_MERGES)
    both = toks.select(
        "t",
        (
            (
                F.length(F.expr(_bpe_encode_expr("t", "spark")))
                - F.length("t")
            ).cast("long")
            / 2
            - 1
        ).cast("long").alias("n_chain"),
        enc_udf(F.col("t")).alias("n_trie"),
    )
    return both.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("t").cast("long").alias("n_distinct_tokens"),
        F.sum("n_chain").alias("n_chain_symbols"),
        F.sum("n_trie").alias("n_trie_symbols"),
        F.sum(
            (F.col("n_chain") == F.col("n_trie")).cast("long")
        ).alias("n_tokens_agree"),
    )
