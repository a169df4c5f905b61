"""PII detection and masking — the scrubbing stage of a training-data
pipeline (emails, phone numbers, and similar machine-recognizable
identifiers are masked before text reaches a training mixture).

The driver corpus is synthetic and carries no raw PII, so the operator is
demonstrated over deterministic profile strings synthesized from `customer`
columns (name + conditionally-present email/phone); the synthesis is part of
the query on BOTH engines, so the DuckDB oracle value-checks the actual
detection and masking logic, not fixture data. The reference
(KonghaYao/data-to-parquet) has no analytical operators (SURVEY.md §2.2);
this module is north-star extension surface like ``operators/pipeline.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ops import PII_PATTERNS, mask_pii
from .base import Registry, load_table

PRIV = Registry()

# Shared by both engines: Java regex and DuckDB's RE2 interpret these
# identically (character classes, \d, bounded/unbounded repetition).
_EMAIL_RE, _EMAIL_TOKEN = PII_PATTERNS["emails"]
_PHONE_RE, _PHONE_TOKEN = PII_PATTERNS["phones"]


@PRIV.register(
    "pii_mask_profiles",
    oracle=f"""
    WITH prof AS (
      SELECT c_custkey,
             c_name
             || CASE WHEN c_custkey % 3 <> 0
                THEN ' contact user' || CAST(c_custkey AS VARCHAR)
                     || '@example.com' ELSE '' END
             || CASE WHEN c_custkey % 2 = 0
                THEN ' phone +1-555-'
                     || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
             || ' segment ' || c_mktsegment AS profile
      FROM customer
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(profile, '{_EMAIL_RE}'))
                AS INT) AS n_emails,
           CAST(len(regexp_extract_all(profile, '{_PHONE_RE}'))
                AS INT) AS n_phones,
           regexp_replace(regexp_replace(profile, '{_EMAIL_RE}', '[EMAIL]',
                                         'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g') AS masked
    FROM prof
    """,
)
def pii_mask_profiles(spark, sf_dir):
    """PII scrub: count and mask email addresses and phone numbers in a
    free-text column (synthesized per-customer profile strings — see module
    docstring), emitting match counts plus the masked text.

    Scale: pure per-row regexp work — a narrow map with no shuffle, fully
    inside whole-stage codegen (Java regex on the JVM side, never a Python
    UDF). At 100 TB this is the cheapest pipeline stage per byte; the only
    design decision that matters is keeping it fused into the same stage as
    the scan, which a declarative select guarantees.
    """
    c = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    profile = F.concat(
        F.col("c_name"),
        F.when(
            key % 3 != 0,
            F.concat(
                F.lit(" contact user"),
                key.cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            key % 2 == 0,
            F.concat(
                F.lit(" phone +1-555-"),
                F.lpad((key % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    p = c.select("c_custkey", profile.alias("profile"))
    masked = mask_pii(
        p,
        "profile",
        patterns={k: PII_PATTERNS[k] for k in ("emails", "phones")},
    )
    return masked.select("c_custkey", "n_emails", "n_phones", "masked")


@PRIV.register(
    "pii_extract_spans",
    oracle=f"""
    WITH prof AS (
      SELECT c_custkey,
             c_name
             || CASE WHEN c_custkey % 3 <> 0
                THEN ' contact user' || CAST(c_custkey AS VARCHAR)
                     || '@example.com' ELSE '' END
             || CASE WHEN c_custkey % 2 = 0
                THEN ' phone +1-555-'
                     || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
             || ' segment ' || c_mktsegment AS profile
      FROM customer
    )
    SELECT c_custkey,
           -- COALESCE: DuckDB's array_to_string is NULL on [], Spark's
           -- array_join is '' — align on ''.
           COALESCE(array_to_string(
               list_sort(regexp_extract_all(profile, '{_EMAIL_RE}')),
               ','), '') AS emails,
           COALESCE(array_to_string(
               list_sort(regexp_extract_all(profile, '{_PHONE_RE}')),
               ','), '') AS phones
    FROM prof
    WHERE len(regexp_extract_all(profile, '{_EMAIL_RE}'))
          + len(regexp_extract_all(profile, '{_PHONE_RE}')) > 0
    """,
)
def pii_extract_spans(spark, sf_dir):
    """PII span extraction (the audit/report twin of `pii_mask_profiles`):
    return every matched identifier per document rather than masking them —
    what a compliance review or a reversible-pseudonymization stage needs.

    Scale: identical posture to masking — per-row JVM regexp in the scan
    stage, no shuffle; the match arrays stay bounded by matches-per-doc.
    Same synthesized profile strings as `pii_mask_profiles`, so the oracle
    value-checks the extraction itself.

    Output contract: spans are emitted as sorted, comma-joined STRINGS, not
    array<string> — the driver's canonicalizer sorts result cells with
    pandas, which cannot hash list cells (the round-4 red mark; same
    constraint `agg_collect_arrays` documents in operators/relational.py).
    Joining keeps a full value oracle.
    """
    c = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    profile = F.concat(
        F.col("c_name"),
        F.when(
            key % 3 != 0,
            F.concat(
                F.lit(" contact user"),
                key.cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            key % 2 == 0,
            F.concat(
                F.lit(" phone +1-555-"),
                F.lpad((key % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    p = c.select("c_custkey", profile.alias("profile"))
    spans = p.select(
        "c_custkey",
        F.regexp_extract_all("profile", F.lit(_EMAIL_RE), 0).alias("_emails"),
        F.regexp_extract_all("profile", F.lit(_PHONE_RE), 0).alias("_phones"),
    )
    return spans.filter(F.size("_emails") + F.size("_phones") > 0).select(
        "c_custkey",
        F.array_join(F.array_sort("_emails"), ",").alias("emails"),
        F.array_join(F.array_sort("_phones"), ",").alias("phones"),
    )


@PRIV.register(
    "gdpr_erasure_audit",
    oracle="""
    WITH erased AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 10 = 7
    ), o AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM erased)
                      THEN 1 ELSE 0 END) AS hit
      FROM orders
    ), li AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM erased)
                      THEN 1 ELSE 0 END) AS hit
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ), ev AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN user_id IN (SELECT c_custkey FROM erased)
                      THEN 1 ELSE 0 END) AS hit
      FROM events
    )
    SELECT 'orders' AS tbl, CAST(total AS BIGINT) AS n_rows,
           CAST(hit AS BIGINT) AS n_erased,
           CAST(total - hit AS BIGINT) AS n_retained
    FROM o
    UNION ALL
    SELECT 'lineitem', CAST(total AS BIGINT), CAST(hit AS BIGINT),
           CAST(total - hit AS BIGINT) FROM li
    UNION ALL
    SELECT 'events', CAST(total AS BIGINT), CAST(hit AS BIGINT),
           CAST(total - hit AS BIGINT) FROM ev
    """,
)
def gdpr_erasure_audit(spark, sf_dir):
    """Right-to-be-forgotten propagation audit: given a deletion set of
    subjects (customers whose key ends in 7 — the deterministic stand-in
    for an erasure-request table), report per fact table how many rows
    reference an erased subject (must be deleted) and how many are
    retained — the compliance report that precedes and validates the
    actual anti-join rewrite.

    Scale: the deletion set is a filter over customer keys, LEFT-SEMI
    semantics expressed as a broadcast-able membership join per fact table
    (the erasure table is ~|requests|, tiny next to the facts — AQE
    broadcasts it; no forced hint since it scales with SF here). lineitem
    reaches its subject through the orders join — shuffle on orderkey —
    exactly the transitive-reference chase a real erasure pipeline does;
    counts are single map-side-combined aggregates, one scan per table.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    erased = c.filter(F.col("c_custkey") % 10 == 7).select("c_custkey")

    def audit(df, key, name):
        hit = (
            df.join(
                erased.withColumnRenamed("c_custkey", "__ek"),
                F.col(key) == F.col("__ek"),
                "left",
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.when(F.col("__ek").isNotNull(), 1).otherwise(0)
                ).alias("n_erased"),
            )
            .select(
                F.lit(name).alias("tbl"),
                "n_rows",
                "n_erased",
                (F.col("n_rows") - F.col("n_erased")).alias("n_retained"),
            )
        )
        return hit

    li_cust = li.join(
        o.select("o_orderkey", "o_custkey"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return (
        audit(o, "o_custkey", "orders")
        .unionByName(audit(li_cust, "o_custkey", "lineitem"))
        .unionByName(audit(ev, "user_id", "events"))
    )


@PRIV.register(
    "k_anonymity_audit",
    oracle="""
    WITH qi AS (
      SELECT n_name, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             COUNT(*) AS grp_n
      FROM customer JOIN nation ON n_nationkey = c_nationkey
      GROUP BY 1, 2, 3
    )
    SELECT CAST(SUM(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
             AS n_exposed_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(grp_n) AS BIGINT) AS min_group_size,
           round(CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END)
                      AS DOUBLE) / SUM(grp_n), 9) AS exposed_fraction
    FROM qi
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit over quasi-identifiers: bucket customers by
    (nation, market segment, account-balance band) and report how many
    equivalence classes fall below k=5 members, how many individuals those
    small classes expose, and the dataset's achieved k (min class size) —
    the re-identification-risk report run before any "anonymized" release.

    Determinism: balance bands use floor over an exact /1000 of the
    2-decimal balance; every statistic is an integer except the final
    single-division fraction (rounded 9). Scale: one map-side-combined
    aggregate over the quasi-identifier tuple, then a scalar aggregate
    over the class table — |classes| is bounded by the QI domain product,
    orders of magnitude under the row count; the nation dim is broadcast.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    qi = (
        c.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("grp_n"))
    )
    small = F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0)
    return qi.agg(
        F.sum(F.when(F.col("grp_n") < 5, 1).otherwise(0)).alias(
            "n_small_groups"
        ),
        F.sum(small).alias("n_exposed_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("grp_n").alias("min_group_size"),
        F.round(
            F.sum(small).cast("double") / F.sum("grp_n"), 9
        ).alias("exposed_fraction"),
    )
