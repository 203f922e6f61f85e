"""Auto-split from the former queries.py monolith (scripts/split_queries.py, r5); see queries/__init__.py for the registry contract."""

from __future__ import annotations

from pathlib import Path
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc, dedup, drift, joins, multimodal, resolve, sample, similarity, stats, temporal, text, validate
from ..operators.infer import (
    infer_as_dataframe,
    infer_from_json_column,
    infer_from_struct,
    infer_grouped,
)
from ..sources.jsonl import export_table_jsonl, infer_jsonl, read_jsonl, with_json_validity
from ..sources.spans import ensure_corpus
from ..sources.tables import load_media_catalog, load_spans, load_table
from ._registry import query


@query(
    "mask_profile_events_props",
    oracle="""
    WITH m AS (
      SELECT regexp_replace(
               regexp_replace(props, '[A-Za-z]', 'A', 'g'),
               '[0-9]', '9', 'g') AS mask
      FROM events WHERE props IS NOT NULL
    ),
    c AS (SELECT mask, count(*) AS n_rows FROM m GROUP BY 1),
    t AS (SELECT sum(n_rows) AS total FROM c),
    r AS (
      SELECT mask, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, mask ASC) AS rk
      FROM c
    )
    SELECT mask, n_rows, round(n_rows / (SELECT total FROM t), 6) AS share,
           CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 5
    """,
)
def mask_profile_events_props(spark, sf_dir) -> DataFrame:
    """Pattern-mask profile (stats.mask_profile): the top-5 character-
    class masks of the raw JSON props strings — every '{"plan": "gold",
    "seats": 12}' collapses to one shared mask per shape, so the profile
    recovers the generator's few JSON layouts with exact counts.  ASCII
    classes only (Unicode letter classes differ between regex engines);
    ties break on mask ascending in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return stats.mask_profile(ev, "props", k=5)


@query(
    "k_anonymity_customer",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(5 AS INT) AS k,
           CAST(sum(n) AS BIGINT) AS n_rows,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_k,
           CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
             AS rows_below_k,
           round(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) / sum(n), 6)
             AS risk_fraction,
           min(n) AS min_group_size,
           min(n) >= 5 AS k_anonymous
    FROM g
    """,
)
def k_anonymity_customer(spark, sf_dir) -> DataFrame:
    """k-anonymity risk (stats.k_anonymity): treating (c_nationkey,
    c_mktsegment) as the quasi-identifier, the 5-anonymity report — at
    sf0.01 the ~125 equivalence groups scatter around size 12, so both
    at-risk and safe groups exist and every output column carries
    signal."""
    cu = load_table(spark, sf_dir, "customer")
    return stats.k_anonymity(cu, ["c_nationkey", "c_mktsegment"], 5)


@query(
    "format_profile_documents",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN doc_id % 4 = 0
                  THEN 'user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  WHEN doc_id % 4 = 1 THEN 'not-an-email'
                  WHEN doc_id % 4 = 2 THEN NULL
                  ELSE 'https://example.com/d/' || CAST(doc_id AS VARCHAR)
             END AS contact,
             CASE WHEN doc_id % 3 = 0 THEN '1234'
                  ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) || '-'
                    || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4) || '-'
                    || substr(md5(CAST(doc_id AS VARCHAR)), 13, 4) || '-'
                    || substr(md5(CAST(doc_id AS VARCHAR)), 17, 4) || '-'
                    || substr(md5(CAST(doc_id AS VARCHAR)), 21, 12)
             END AS token_id
      FROM documents
    ), a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(contact) AS BIGINT) AS nn_c,
             CAST(count(token_id) AS BIGINT) AS nn_t,
             CAST(sum(CASE WHEN regexp_matches(contact,
               '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$')
               THEN 1 ELSE 0 END) AS BIGINT) AS c_email,
             CAST(sum(CASE WHEN regexp_matches(contact,
               '^https?://[A-Za-z0-9._~:/?#@!$&''()*+,;=%-]+$')
               THEN 1 ELSE 0 END) AS BIGINT) AS c_url,
             CAST(sum(CASE WHEN regexp_matches(contact,
               '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
               THEN 1 ELSE 0 END) AS BIGINT) AS c_uuid,
             CAST(sum(CASE WHEN regexp_matches(token_id,
               '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$')
               THEN 1 ELSE 0 END) AS BIGINT) AS t_email,
             CAST(sum(CASE WHEN regexp_matches(token_id,
               '^https?://[A-Za-z0-9._~:/?#@!$&''()*+,;=%-]+$')
               THEN 1 ELSE 0 END) AS BIGINT) AS t_url,
             CAST(sum(CASE WHEN regexp_matches(token_id,
               '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
               THEN 1 ELSE 0 END) AS BIGINT) AS t_uuid
      FROM t
    )
    SELECT 'contact' AS "column", 'email' AS format, n AS n_rows,
           nn_c AS n_nonnull, c_email AS n_match,
           CASE WHEN nn_c > 0 THEN round(c_email / nn_c, 6) END AS match_rate
    FROM a
    UNION ALL SELECT 'contact', 'url', n, nn_c, c_url,
           CASE WHEN nn_c > 0 THEN round(c_url / nn_c, 6) END FROM a
    UNION ALL SELECT 'contact', 'uuid', n, nn_c, c_uuid,
           CASE WHEN nn_c > 0 THEN round(c_uuid / nn_c, 6) END FROM a
    UNION ALL SELECT 'token_id', 'email', n, nn_t, t_email,
           CASE WHEN nn_t > 0 THEN round(t_email / nn_t, 6) END FROM a
    UNION ALL SELECT 'token_id', 'url', n, nn_t, t_url,
           CASE WHEN nn_t > 0 THEN round(t_url / nn_t, 6) END FROM a
    UNION ALL SELECT 'token_id', 'uuid', n, nn_t, t_uuid,
           CASE WHEN nn_t > 0 THEN round(t_uuid / nn_t, 6) END FROM a
    """,
)
def format_profile_documents(spark, sf_dir) -> DataFrame:
    """String-format discovery grid (stats.format_profile): two planted
    columns — a mixed email/garbage/NULL/url feed and a mostly-UUID key
    with a corrupted %3 slice — profiled against the email/url/uuid
    patterns in ONE codegen scan.  The patterns are the Java ∩ RE2 ∩
    DuckDB dialect, so both engines grade every value identically and
    each of the six (column, format) cells value-checks exactly."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    m = F.md5(did)
    planted = docs.select(
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("user"), did, F.lit("@example.com")),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit("not-an-email"))
        .when(F.col("doc_id") % 4 == 2, F.lit(None))
        .otherwise(F.concat(F.lit("https://example.com/d/"), did))
        .alias("contact"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("1234"))
        .otherwise(
            F.concat_ws(
                "-",
                m.substr(1, 8),
                m.substr(9, 4),
                m.substr(13, 4),
                m.substr(17, 4),
                m.substr(21, 12),
            )
        )
        .alias("token_id"),
    )
    return stats.format_profile(
        planted, ["contact", "token_id"], formats=["email", "url", "uuid"]
    )


@query(
    "l_diversity_events",
    oracle="""
    WITH src AS (
      SELECT event_type, user_id % 25 AS bucket,
             CASE WHEN event_type = 'error' THEN 'E'
                  ELSE 'v' || CAST(event_id % 7 AS VARCHAR) END AS sensitive
      FROM events
    ),
    g AS (
      SELECT event_type, bucket, count(*) AS n,
             count(DISTINCT sensitive) AS d
      FROM src GROUP BY 1, 2
    )
    SELECT CAST(2 AS INT) AS l,
           CAST(sum(n) AS BIGINT) AS n_rows,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN d < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_l,
           CAST(coalesce(sum(CASE WHEN d < 2 THEN n END), 0) AS BIGINT)
             AS rows_below_l,
           round(coalesce(sum(CASE WHEN d < 2 THEN n END), 0) / sum(n), 6)
             AS risk_fraction,
           min(d) AS min_diversity,
           min(d) >= 2 AS l_diverse
    FROM g
    """,
)
def l_diversity_events(spark, sf_dir) -> DataFrame:
    """l-diversity risk (stats.l_diversity) — the homogeneity-attack
    check k_anonymity cannot see: quasi-identifier (event_type, user
    bucket), sensitive column planted so every 'error' group is
    single-valued (diversity 1, flags at l=2) while other groups carry
    ~7 values (safe) — both verdict arms present and every column of the
    one-row report value-checked."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 25).alias("bucket"),
        F.when(F.col("event_type") == "error", F.lit("E"))
        .otherwise(
            F.concat(F.lit("v"), (F.col("event_id") % 7).cast("string"))
        )
        .alias("sensitive"),
    )
    return stats.l_diversity(ev, ["event_type", "bucket"], "sensitive", 2)


@query(
    "t_closeness_events",
    oracle="""
    WITH src AS (
      SELECT event_type, user_id % 25 AS bucket,
             CASE WHEN event_type = 'error' THEN 'E'
                  ELSE 'v' || CAST(event_id % 7 AS VARCHAR) END AS sensitive
      FROM events
    ),
    cells AS (
      SELECT event_type, bucket, sensitive, count(*) AS n
      FROM src GROUP BY 1, 2, 3
    ),
    terms AS (
      SELECT event_type, bucket, n,
             round(abs(CAST(n AS DOUBLE)
                       / sum(n) OVER (PARTITION BY event_type, bucket)
                     - CAST(sum(n) OVER (PARTITION BY sensitive) AS DOUBLE)
                       / sum(n) OVER ())
                   - CAST(sum(n) OVER (PARTITION BY sensitive) AS DOUBLE)
                     / sum(n) OVER (), 6) AS term
      FROM cells
    ),
    g AS (
      SELECT event_type, bucket, sum(n) AS gn,
             round((1.0 + sum(term)) / 2.0, 6) AS tv
      FROM terms GROUP BY 1, 2
    )
    SELECT CAST(0.5 AS DOUBLE) AS t,
           CAST(sum(gn) AS BIGINT) AS n_rows,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN tv > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_above_t,
           CAST(coalesce(sum(CASE WHEN tv > 0.5 THEN gn END), 0) AS BIGINT)
             AS rows_above_t,
           round(coalesce(sum(CASE WHEN tv > 0.5 THEN gn END), 0)
                 / sum(gn), 6) AS risk_fraction,
           max(tv) AS max_tv,
           max(tv) <= 0.5 AS t_close
    FROM g
    """,
)
def t_closeness_events(spark, sf_dir) -> DataFrame:
    """t-closeness risk (stats.t_closeness) — the skewness-attack check
    the other two privacy analyzers cannot see: the quasi-identifier is
    (event_type, user bucket) and the sensitive plant makes every
    'error' group single-valued 'E' (its distribution sits ~1−e total
    variation from the corpus mixture → above t=0.5) while the other
    groups are near-uniform over 7 values (tv ≈ the corpus error share
    ≈ 0.2 → below t) — both verdict arms present, and the oracle replays
    the observed-cell fold identity tv = ½(1 + Σ(|p−q| − q)) with the
    same per-cell round(6), so every column of the one-row report is
    value-checked."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 25).alias("bucket"),
        F.when(F.col("event_type") == "error", F.lit("E"))
        .otherwise(
            F.concat(F.lit("v"), (F.col("event_id") % 7).cast("string"))
        )
        .alias("sensitive"),
    )
    return stats.t_closeness(ev, ["event_type", "bucket"], "sensitive", 0.5)


@query(
    "pattern_profile_customer",
    oracle="""
    WITH src AS (
      SELECT c_name,
             c_mktsegment,
             CASE WHEN c_custkey % 3 = 0
                  THEN 'ID-' || CAST(c_custkey AS VARCHAR)
                  ELSE lpad(CAST(c_custkey AS VARCHAR), 9, '0') END AS ckey
      FROM customer
    ),
    cells AS (
      SELECT col AS "column", mask, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT 'c_name' AS col,
               regexp_replace(regexp_replace(regexp_replace(
                 c_name, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                 '[0-9]', '9', 'g') AS mask
        FROM src WHERE c_name IS NOT NULL
        UNION ALL
        SELECT 'c_mktsegment',
               regexp_replace(regexp_replace(regexp_replace(
                 c_mktsegment, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                 '[0-9]', '9', 'g')
        FROM src WHERE c_mktsegment IS NOT NULL
        UNION ALL
        SELECT 'ckey',
               regexp_replace(regexp_replace(regexp_replace(
                 ckey, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                 '[0-9]', '9', 'g')
        FROM src WHERE ckey IS NOT NULL
      ) GROUP BY 1, 2
    ),
    ranked AS (
      SELECT "column", mask, n,
             round(CAST(n AS DOUBLE)
                   / sum(n) OVER (PARTITION BY "column"), 6) AS share,
             CAST(row_number() OVER (PARTITION BY "column"
                    ORDER BY n DESC, mask ASC) AS INT) AS rank
      FROM cells
    )
    SELECT "column", rank, mask, n, share FROM ranked WHERE rank <= 5
    """,
)
def pattern_profile_customer(spark, sf_dir) -> DataFrame:
    """Shape-mask pattern profile (stats.pattern_profile): top-5 format
    masks per string column over customer, with a PLANTED mixed-format
    key — c_custkey rendered 'ID-<n>' for every third customer and
    zero-padded to 9 digits otherwise — so the profiler demonstrably
    surfaces the upstream-export format split ('AA-9…' family vs
    '999999999') that datatype_profile's type classifier cannot see.
    c_name collapses 1,500 values into ONE mask ('Aaaaaaaa#999999999'),
    evidencing that the shuffle is bounded by distinct-mask cardinality,
    not rows.  Oracle replays the identical ASCII-only mask chain in
    DuckDB RE2 (the Java∩RE2 dialect rule from the PII scrubber) with the
    same (n desc, mask asc) tie-break and round(6) share."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_name",
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("ID-"), F.col("c_custkey").cast("string")),
        )
        .otherwise(F.lpad(F.col("c_custkey").cast("string"), 9, "0"))
        .alias("ckey"),
    )
    return stats.pattern_profile(
        cust, ["c_name", "c_mktsegment", "ckey"], top_k=5
    )


# Planted format columns over customer, expressed identically in Spark and
# DuckDB (exact integer/hex/lpad string construction — no float rendering):
# 90%-valid emails, synthetic uuids from zero-padded hex keys, ipv4s that
# ALSO syntactically satisfy hostname (the priority case), and calendar-safe
# dates.
_FMT_SRC_SQL = """
  SELECT
    CASE WHEN c_custkey % 10 = 0 THEN 'not-an-email'
         ELSE 'user' || CAST(c_custkey AS VARCHAR) || '@example.com'
    END AS cemail,
    lpad(hex(c_custkey), 8, '0') || '-' || lpad(hex(c_custkey), 4, '0')
      || '-' || lpad(hex(c_custkey), 4, '0') || '-'
      || lpad(hex(c_custkey), 4, '0') || '-'
      || lpad(hex(c_custkey), 12, '0') AS cuuid,
    '10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.'
      || CAST((c_custkey * 7) % 256 AS VARCHAR) AS cip,
    '2024-' || lpad(CAST((c_custkey % 12) + 1 AS VARCHAR), 2, '0') || '-'
      || lpad(CAST((c_custkey % 28) + 1 AS VARCHAR), 2, '0') AS cdate,
    c_custkey
  FROM customer
"""


def _fmt_planted_frame(spark, sf_dir) -> DataFrame:
    from ..operators import formats as _fm  # noqa: F401 (module must import)

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    hx = F.hex(k)
    return cust.select(
        F.when(k % 10 == 0, F.lit("not-an-email"))
        .otherwise(F.concat(F.lit("user"), k.cast("string"), F.lit("@example.com")))
        .alias("cemail"),
        F.concat_ws(
            "-",
            F.lpad(hx, 8, "0"),
            F.lpad(hx, 4, "0"),
            F.lpad(hx, 4, "0"),
            F.lpad(hx, 4, "0"),
            F.lpad(hx, 12, "0"),
        ).alias("cuuid"),
        F.concat(
            F.lit("10.0."),
            (k % 256).cast("string"),
            F.lit("."),
            ((k * 7) % 256).cast("string"),
        ).alias("cip"),
        F.concat(
            F.lit("2024-"),
            F.lpad(((k % 12) + 1).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad(((k % 28) + 1).cast("string"), 2, "0"),
        ).alias("cdate"),
        "c_custkey",
    )


def _fmt_values_sql() -> str:
    from ..operators.formats import FORMAT_PATTERNS

    return ", ".join(
        f"('{fmt}', {j}, '{pat}')"
        for j, (fmt, pat) in enumerate(FORMAT_PATTERNS.items())
    )


@query(
    "format_inference_customer",
    oracle=f"""
    WITH src AS ({_FMT_SRC_SQL}),
    fmts(format, priority, pat) AS (VALUES {_fmt_values_sql()}),
    cols AS (
      SELECT 'cemail' AS "column", cemail AS v FROM src
      UNION ALL SELECT 'cuuid', cuuid FROM src
      UNION ALL SELECT 'cip', cip FROM src
      UNION ALL SELECT 'cdate', cdate FROM src
    ),
    cnt AS (
      SELECT "column", format, priority,
             CAST(count(v) AS BIGINT) AS n_nonnull,
             CAST(count(CASE WHEN regexp_matches(v, pat) THEN 1 END)
                  AS BIGINT) AS n_match
      FROM cols CROSS JOIN fmts GROUP BY 1, 2, 3
    ),
    rep AS (
      SELECT "column", format, priority, n_nonnull, n_match,
             round(CAST(n_match AS DOUBLE) / n_nonnull, 6) AS match_rate,
             (n_nonnull >= 1
              AND round(CAST(n_match AS DOUBLE) / n_nonnull, 6)
                  >= CAST(1.0 AS DOUBLE)) AS qualifies
      FROM cnt
    )
    SELECT "column", format, priority, n_nonnull, n_match, match_rate,
           qualifies,
           (qualifies AND priority = min(CASE WHEN qualifies THEN priority
                                         END) OVER (PARTITION BY "column"))
             AS inferred
    FROM rep
    """,
)
def format_inference_customer(spark, sf_dir) -> DataFrame:
    """Draft-4 ``format`` inference (formats.infer_formats — ENGINE
    EXTENSION, the reference never generates format): one multi-aggregate
    corpus scan counts every column × format rlike match, then the
    one-row result unpivots to the report.  Plants cover all the report's
    arms: cuuid/cdate infer cleanly, cip satisfies BOTH ipv4 and hostname
    but only the higher-priority ipv4 is inferred (specific beats
    general), and cemail at 90% valid qualifies for nothing at
    threshold 1.0 (match_rate 0.9 value-checked).  The patterns are the
    SAME constant strings in both engines (Java∩RE2∩re dialect, injected
    from FORMAT_PATTERNS at registration), so every count, rate, and
    verdict is value-checked."""
    from ..operators.formats import infer_formats

    return infer_formats(
        _fmt_planted_frame(spark, sf_dir),
        ["cemail", "cuuid", "cip", "cdate"],
    )


def _email_pat() -> str:
    from ..operators.formats import FORMAT_PATTERNS

    return FORMAT_PATTERNS["email"]


@query(
    "format_violations_customer",
    oracle=f"""
    WITH src AS ({_FMT_SRC_SQL})
    SELECT c_custkey, 'cemail' AS "column", 'email' AS format,
           cemail AS value
    FROM src
    WHERE cemail IS NOT NULL
      AND NOT regexp_matches(cemail, '{_email_pat()}')
    """,
)
def format_violations_customer(spark, sf_dir) -> DataFrame:
    """Format violation rows (formats.format_violations): the 10% planted
    invalid emails surface as (key, column, format, value) rows — the
    row-level complement of the profile's aggregate verdict, same pattern
    constant on both sides, 150 rows value-checked at sf0.01.  NULLs are
    absent, not invalid (Draft-4 format applies to present instances
    only)."""
    from ..operators.formats import format_violations

    return format_violations(
        _fmt_planted_frame(spark, sf_dir),
        "cemail",
        "email",
        keep=["c_custkey"],
    )


@query(
    "pseudonymize_customer_orders",
    oracle="""
    WITH c AS (
      SELECT substr(sha256('s3cr3t' || chr(31) || 'custkey' || chr(31)
                    || CAST(c_custkey AS VARCHAR)), 1, 32) AS pk
      FROM customer
    ),
    o AS (
      SELECT substr(sha256('s3cr3t' || chr(31) || 'custkey' || chr(31)
                    || CAST(o_custkey AS VARCHAR)), 1, 32) AS pk
      FROM orders
    )
    SELECT c.pk AS pseudo_custkey, CAST(count(o.pk) AS BIGINT) AS n_orders
    FROM c LEFT JOIN o ON c.pk = o.pk
    GROUP BY 1
    """,
)
def pseudonymize_customer_orders(spark, sf_dir) -> DataFrame:
    """Keyed pseudonymization preserving referential integrity
    (stats.pseudonymize): customer.c_custkey and orders.o_custkey are
    replaced by 128-bit keyed sha256 surrogates under the SHARED 'custkey'
    domain, then the foreign key is joined ON THE SURROGATES — per-customer
    order counts must equal the plaintext join's.  Row-local projection
    (no shuffle beyond the join itself); NULL keys stay NULL; the oracle
    recomputes the identical sha256 surrogate per row, so every one of the
    1,500 surrogate values AND the join preservation are value-checked
    (customers without orders appear with n_orders = 0 via the left
    join — both arms populated)."""
    cust = stats.pseudonymize(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        {"c_custkey": "custkey"},
        secret="s3cr3t",
    )
    ords = stats.pseudonymize(
        load_table(spark, sf_dir, "orders").select("o_custkey"),
        {"o_custkey": "custkey"},
        secret="s3cr3t",
    )
    return (
        cust.join(ords, cust["c_custkey"] == ords["o_custkey"], "left")
        .groupBy(cust["c_custkey"].alias("pseudo_custkey"))
        .agg(F.count(ords["o_custkey"]).alias("n_orders"))
    )


@query(
    "dp_release_events",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ),
    u AS (
      SELECT event_type, n,
             (CAST(CAST('0x' || substring(md5(concat_ws(chr(31), 'dp-42',
                    event_type)), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
               / 4294967296.0 AS uu
      FROM c
    )
    SELECT event_type,
           n + CAST(round(CASE WHEN uu < 0.5
                               THEN 2.0 * ln(2.0 * uu)
                               ELSE -(2.0) * ln(2.0 * (1.0 - uu))
                          END) AS BIGINT) AS n_released,
           CAST(0.5 AS DOUBLE) AS epsilon
    FROM u
    """,
)
def dp_release_events(spark, sf_dir) -> DataFrame:
    """ε-DP release of the per-type event histogram at ε = 0.5
    (stats.dp_noisy_counts, seed 42) — the governance endpoint that
    completes the k-anon/l-div/t-closeness toolkit: disjoint categories
    give the count vector L1 sensitivity 1, so per-cell Laplace(1/ε)
    noise yields ε-DP for the whole histogram.  The noise is SEEDED
    (md5-prefix uniform through the exact Laplace inverse CDF), which
    makes the release deterministic and engine-replayable — treat the
    seed like a key; with it public this is reproducibility, not
    privacy (documented trade).  All 5 released rows value-checked
    against the bit-identical DuckDB replay."""
    from ..operators.stats import dp_noisy_counts

    ev = load_table(spark, sf_dir, "events")
    return dp_noisy_counts(ev, "event_type", epsilon=0.5, seed=42)
