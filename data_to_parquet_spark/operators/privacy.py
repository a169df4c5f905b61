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
from pyspark.sql.window import Window as W

from ..ops import PII_PATTERNS, mask_pii
from .base import Registry, load_table

PRIV = Registry()

_D = "double"

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
    # |requests|-sized by construction; checkpointed so the three per-table
    # audits don't each re-scan customer to rebuild the deletion set
    erased = (
        c.filter(F.col("c_custkey") % 10 == 7)
        .select("c_custkey")
        .localCheckpoint(eager=False)
    )

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


@PRIV.register(
    "l_diversity_audit",
    oracle="""
    WITH cls AS (
      SELECT n_name,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             COUNT(*) AS grp_n,
             COUNT(DISTINCT c_mktsegment) AS l_distinct
      FROM customer JOIN nation ON n_nationkey = c_nationkey
      GROUP BY 1, 2
    )
    SELECT CAST(l_distinct AS BIGINT) AS l_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(grp_n) AS BIGINT) AS n_rows,
           CAST(MIN(grp_n) AS BIGINT) AS min_class_size,
           CAST(MAX(grp_n) AS BIGINT) AS max_class_size
    FROM cls GROUP BY l_distinct
    """,
)
def l_diversity_audit(spark, sf_dir):
    """l-diversity audit — the homogeneity-attack companion to
    `k_anonymity_audit`: k-anonymity only bounds equivalence-class SIZE,
    but a class where every member shares the same sensitive value leaks
    that value for all of them regardless of k. Group customers by the
    quasi-identifier (nation, balance band), measure how many DISTINCT
    sensitive values (market segment) each class contains, and report the
    class-count/row-count distribution per achieved l — classes at l=1
    are fully exposed, l<3 fail the usual 3-diversity bar.

    Determinism: every output is an integer (distinct counts, class
    sizes) — no float ever enters the comparison. Scale: one shuffle on
    the QI tuple with map-side partial aggregation (COUNT DISTINCT over a
    5-value sensitive domain expands to a tiny grouping-set style
    partial), then a second tiny aggregate over |classes| rows, bounded
    by the QI domain product, not the row count; nation stays a broadcast
    dim.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cls = (
        c.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("grp_n"),
            F.countDistinct("c_mktsegment").alias("l_distinct"),
        )
    )
    return cls.groupBy("l_distinct").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("grp_n").alias("n_rows"),
        F.min("grp_n").alias("min_class_size"),
        F.max("grp_n").alias("max_class_size"),
    )


_DP_EPS = 1.0  # epsilon for the count release (scale = 1/eps)
_DP_M = 1 << 52  # uniform-draw modulus (52 bits -> exact double)


@PRIV.register(
    "dp_noisy_counts",
    oracle=f"""
    WITH agg AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             COUNT(*) AS n_true
      FROM events GROUP BY 1, 2
    ), noise AS (
      SELECT event_type, day, n_true,
             (CAST('0x' || substring(
                 md5('dp:' || event_type || ':' || day),
                 1, 15) AS BIGINT) % {_DP_M} + 0.5) / {_DP_M}.0 AS u
      FROM agg
    )
    SELECT event_type, day, CAST(n_true AS BIGINT) AS n_true,
           CAST(greatest(0.0, round(
               n_true - (1.0 / {_DP_EPS}) * sign(u - 0.5)
                        * ln(1.0 - 2.0 * abs(u - 0.5))
           )) AS BIGINT) AS n_noisy
    FROM noise
    """,
)
def dp_noisy_counts(spark, sf_dir):
    """Differentially-private count release (Laplace mechanism) over the
    per-(event_type, day) histogram — the shape of every DP telemetry/
    analytics release: true counts plus Laplace(1/ε) noise, clamped and
    integerized by post-processing (both DP-safe). Noise is DETERMINISTIC
    for testability: the Laplace draw comes from inverse-CDF over a
    uniform derived from md5 of the cell key — the keyed-PRF construction
    real pipelines use for reproducible releases — which both engines
    compute bit-identically (60-bit md5 prefix, 52-bit mantissa-exact
    modulus, +0.5 offset keeping u strictly inside (0,1) so ln never sees
    0). n_true is emitted alongside for the audit/test pairing; a real
    release drops it.

    Scale: one map-side-combined aggregate on (type, day) — cells, not
    rows, flow into the noise projection, which is per-row JVM math in
    codegen. The only cross-engine float risk is one libm ``ln`` call per
    cell feeding an integer round; a final-ulp divergence would need the
    pre-round value within 1e-15 of a half-integer.
    """
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy(
        "event_type",
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_true"))
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("dp:"),
                            F.col("event_type"),
                            F.lit(":"),
                            F.col("day"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(_DP_M)
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_DP_M))
    noise = (
        -F.lit(1.0 / _DP_EPS)
        * F.signum(u - 0.5)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - 0.5))
    )
    return agg.select(
        "event_type",
        "day",
        "n_true",
        F.greatest(F.lit(0.0), F.round(F.col("n_true") + noise))
        .cast("long")
        .alias("n_noisy"),
    )


# t-closeness band domain: TPC-H c_acctbal is drawn from [-999.99, 9999.99]
# (verified at every shipped sf: sf0.1 spans [-999.85, 9999.80]), so
# floor(c_acctbal / 1000) has the FIXED literal domain {-1, ..., 9}. Baking
# the domain in (instead of collecting the observed bands) keeps the query a
# single scan with no driver action; absent bands contribute zero mass on
# both sides of the EMD and change nothing. Both engines CLAMP the band
# into this domain (greatest/least, r11 ADVICE): on in-domain data the
# clamp is the identity, and an out-of-domain balance lands in the nearest
# edge band IDENTICALLY cross-engine instead of silently diverging (the
# unclamped Spark histogram dropped such rows from n_total while the
# oracle counted them).
_T_BANDS = tuple(range(-1, 10))
_T_M1 = len(_T_BANDS) - 1  # the (m - 1) EMD normalizer for ordered values


@PRIV.register(
    "t_closeness_audit",
    oracle=f"""
    WITH base AS (
      SELECT n_name, c_mktsegment,
             GREATEST(LEAST(CAST(floor(c_acctbal / 1000) AS BIGINT),
                            {_T_BANDS[-1]}), {_T_BANDS[0]}) AS bal_band
      FROM customer JOIN nation ON n_nationkey = c_nationkey
    ), cb AS (
      SELECT n_name, c_mktsegment, bal_band, COUNT(*) AS cnt
      FROM base GROUP BY 1, 2, 3
    ), cls AS (
      SELECT n_name, c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS class_n
      FROM cb GROUP BY 1, 2
    ), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM cb),
    g AS (
      SELECT bal_band, CAST(SUM(cnt) AS BIGINT) AS g_cnt
      FROM cb GROUP BY 1
    ), bands AS (
      SELECT CAST(range AS BIGINT) AS bal_band
      FROM range({_T_BANDS[0]}, {_T_BANDS[-1] + 1})
    ), dense AS (
      SELECT cls.n_name, cls.c_mktsegment, cls.class_n, bands.bal_band,
             CAST(COALESCE(cb.cnt, 0) AS BIGINT) AS cnt,
             COALESCE(g.g_cnt, 0) AS g_cnt, tot.n_total
      FROM cls CROSS JOIN bands CROSS JOIN tot
      LEFT JOIN cb USING (n_name, c_mktsegment, bal_band)
      LEFT JOIN g USING (bal_band)
    ), cum AS (
      SELECT n_name, c_mktsegment, class_n, n_total,
             SUM(cnt * n_total - g_cnt * class_n) OVER (
               PARTITION BY n_name, c_mktsegment ORDER BY bal_band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_diff
      FROM dense
    ), emd AS (
      SELECT n_name, c_mktsegment, class_n,
             CAST(SUM(ABS(cum_diff)) AS BIGINT) AS emd_num,
             CAST(SUM(ABS(cum_diff)) AS DOUBLE)
               / (CAST(class_n AS DOUBLE) * CAST(MAX(n_total) AS DOUBLE)
                  * {float(_T_M1)}) AS t_emd
      FROM cum GROUP BY n_name, c_mktsegment, class_n
    )
    SELECT n_name, c_mktsegment, class_n, emd_num, t_emd,
           CAST(t_emd > 0.2 AS INT) AS t_violates
    FROM emd
    """,
)
def t_closeness_audit(spark, sf_dir):
    """t-closeness audit — the attribute-disclosure companion completing the
    k-anonymity (`k_anonymity_audit`) / l-diversity (`l_diversity_audit`)
    triad: l-diversity counts distinct sensitive values but a class can be
    "diverse" while still skewed far from the population (a class that is
    90% top-balance-band leaks wealth regardless of l). Per equivalence
    class (nation, market segment), measure the Earth Mover's Distance
    between the class's distribution over the ORDERED sensitive attribute
    (account-balance band) and the global distribution — the Li/Li/
    Venkatasubramanian ordered-value EMD, (1/(m-1))·Σ_i |Σ_{j<=i}(p_j-q_j)|
    — and flag classes beyond the conventional t=0.2 bar.

    Determinism: the band domain is the literal {-1..9} (see _T_BANDS), so
    the EMD numerator Σ|cum(cnt·N − g·class_n)| is pure int64 arithmetic —
    identical cross-engine — and the only float is ONE final division whose
    operands are exactly-representable int64 products (class_n·N ≤ 2.25e8 at
    sf0.1, far under 2^53). t_emd ships UNROUNDED: the exact-operand
    IEEE division is bit-identical cross-engine, where a decimal rounding
    step would re-open the digit-boundary flake channel
    (`audio_energy_windows` hit it once at sf0.1 pre-fix). Scale: ONE
    corpus shuffle (the
    groupBy on the class×band tuple, map-side combined to ≤ |QI domain|·m
    rows); everything after operates on ≤ 125·11 rows — the dense
    class×band grid comes from exploding an 11-element literal array (no
    join, no cross product), the global band histogram and N are window
    sums over that grid, and the int64 numerator stays overflow-safe up to
    N ≈ 3e8 rows (swap the counts to decimal(38,0) beyond; past N ≈ 3e7
    the final division's double products round, but identically so in both
    engines — IEEE multiply is deterministic). The nation dim is
    broadcast. Rows out = |present classes| ≤ 125.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cb = (
        c.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            "c_mktsegment",
            F.greatest(
                F.least(
                    F.floor(F.col("c_acctbal") / 1000).cast("long"),
                    F.lit(_T_BANDS[-1]).cast("long"),
                ),
                F.lit(_T_BANDS[0]).cast("long"),
            ).alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Dense class×band grid from ONE aggregate: per class, an 11-slot
    # conditional-count histogram (map-side combined), then posexplode.
    hist = F.array(
        *[
            F.sum(F.when(F.col("bal_band") == b, F.col("cnt")).otherwise(0))
            for b in _T_BANDS
        ]
    )
    classes = cb.groupBy("n_name", "c_mktsegment").agg(
        F.sum("cnt").alias("class_n"), hist.alias("hist")
    )
    dense = classes.select(
        "n_name",
        "c_mktsegment",
        "class_n",
        F.posexplode("hist").alias("band_idx", "cnt"),
    )
    w_band = W.partitionBy("band_idx")
    w_all = W.partitionBy(F.lit(1))
    w_cum = (
        W.partitionBy("n_name", "c_mktsegment")
        .orderBy("band_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = dense.select(
        "n_name",
        "c_mktsegment",
        "class_n",
        F.sum("cnt").over(w_all).alias("n_total"),
        F.sum(
            F.col("cnt") * F.sum("cnt").over(w_all)
            - F.sum("cnt").over(w_band) * F.col("class_n")
        )
        .over(w_cum)
        .alias("cum_diff"),
    )
    emd = cum.groupBy("n_name", "c_mktsegment", "class_n").agg(
        F.sum(F.abs(F.col("cum_diff"))).alias("emd_num"),
        (
            F.sum(F.abs(F.col("cum_diff"))).cast(_D)
            / (
                F.col("class_n").cast(_D)
                * F.max("n_total").cast(_D)
                * F.lit(float(_T_M1))
            )
        ).alias("t_emd"),
    )
    return emd.select(
        "n_name",
        "c_mktsegment",
        "class_n",
        "emd_num",
        "t_emd",
        (F.col("t_emd") > 0.2).cast("int").alias("t_violates"),
    )
