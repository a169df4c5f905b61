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
