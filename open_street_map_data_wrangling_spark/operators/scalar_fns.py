"""Scalar function families — SURVEY.md §2.8.

One query per family (string / date / math / array / map / JSON),
each computing several representative functions so the inventory row
is exercised end-to-end against the oracle. All built-ins — these are
the vectorized JVM equivalents of the reference's per-element Python
str/re/datetime calls.

Oracle parity notes:
* Spark `weekday` is Mon=0; DuckDB's matching form is `isodow - 1`.
* Transcendentals (ln, log10, exp) are rounded to 6 decimals — libm
  vs JVM Math may differ in the last ulp.
* Map/struct results are projected to scalars before comparison; the
  oracle computes the same values from plain columns (DuckDB MAP
  internals differ, the *values* are the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table


@query(
    "q_string_fns",
    oracle="""
        SELECT doc_id,
               upper(lang) AS lang_up,
               CAST(length(text) AS INTEGER) AS n_len,
               substr(text, 1, 12) AS head12,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_toks,
               starts_with(text, 'the ') AS starts_the,
               replace(source, 'src', 'source-') AS source_long,
               trim(concat(' ', lang, ' ')) AS lang_trim,
               reverse(lang) AS lang_rev,
               lpad(CAST(doc_id AS VARCHAR), 6, '0') AS id_pad
        FROM documents
    """,
    tags=("scalar", "string"),
)
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (§2.8): upper/length/substring/split/startswith/
    replace/trim/reverse/lpad over documents."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.length("text").alias("n_len"),
        F.substring("text", 1, 12).alias("head12"),
        F.size(F.split("text", " ")).alias("n_toks"),
        F.col("text").startswith("the ").alias("starts_the"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source-")).alias("source_long"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.reverse("lang").alias("lang_rev"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("id_pad"),
    )


@query(
    "q_date_fns",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(day(o_orderdate) AS INTEGER) AS dom,
               CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               CAST(date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
        FROM orders
    """,
    tags=("scalar", "date"),
)
def q_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (§2.8): extraction, truncation, arithmetic.
    The reference kept ISO strings and never parsed them; the engine
    works on real date types."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.weekday(d).alias("wd"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("2024-01-01").cast("date")).alias("days_since"),
        F.date_format(F.add_months(d.cast("date"), 3), "yyyy-MM-dd").alias("plus3m"),
    )


@query(
    "q_math_fns",
    oracle="""
        SELECT o_orderkey,
               round(o_totalprice, 1) AS price_r1,
               floor(o_totalprice) AS price_floor,
               ceil(o_totalprice) AS price_ceil,
               abs(o_totalprice - 100000.0) AS dist_100k,
               round(sqrt(o_totalprice), 6) AS price_sqrt,
               round(ln(o_totalprice), 6) AS price_ln,
               round(log10(o_totalprice), 6) AS price_log10,
               CAST(o_orderkey % 7 AS BIGINT) AS key_mod7
        FROM orders
    """,
    tags=("scalar", "math"),
)
def q_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (§2.8). floor/ceil return BIGINT in DuckDB? No —
    DOUBLE; Spark floor/ceil return LONG — cast below keeps parity."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(p, 1).alias("price_r1"),
        F.floor(p).cast("double").alias("price_floor"),
        F.ceil(p).cast("double").alias("price_ceil"),
        F.abs(p - 100000.0).alias("dist_100k"),
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "q_array_fns",
    oracle="""
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_toks,
               toks[1] AS first_tok,
               list_aggregate(toks, 'min') AS min_tok,
               list_contains(toks, 'spark') AS has_spark,
               array_to_string(list_slice(toks, 1, 3), ' ') AS head3,
               CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_toks
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
    tags=("scalar", "array"),
)
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (§2.8): size / element_at / array_min /
    array_contains / slice / array_distinct over tokenized text
    (reference analog: pos=[lat,lon] and node_refs lists)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.element_at(toks, 1).alias("first_tok"),
        F.array_min(toks).alias("min_tok"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("head3"),
        F.size(F.array_distinct(toks)).alias("n_distinct_toks"),
    )


@query(
    "q_map_fns",
    oracle="""
        SELECT doc_id,
               lang AS m_lang,
               2 AS m_size,
               'lang,source' AS m_keys,
               lang || ',' || source AS m_values
        FROM documents
    """,
    tags=("scalar", "map"),
)
def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (§2.8): create_map / element_at / size / map_keys /
    map_values (reference analog: the open tag dict per element). The
    oracle computes the same scalars from plain columns — DuckDB MAP
    internals differ but the values are the contract."""
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("m_lang"),
        F.size(m).alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
        F.array_join(F.map_values(m), ",").alias("m_values"),
    )


@query(
    "q_json_fns",
    oracle="""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               json_extract_string(props, '$.k') AS k_str,
               json_extract_string(props, '$.missing') IS NULL AS missing_is_null,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) BETWEEN 0 AND 49
                 AS k_low
        FROM events
    """,
    tags=("scalar", "json"),
)
def q_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (§2.8): get_json_object / from_json over the
    events.props JSON string (reference analog: Mongo documents)."""
    e = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    parsed = F.from_json("props", "k int")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_int"),
        k_str.alias("k_str"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
        parsed.getField("k").between(0, 49).alias("k_low"),
    )


@query(
    "q_map_explode",
    oracle="""
        SELECT doc_id, k, v FROM (
            SELECT doc_id, 'lang' AS k, lang AS v FROM documents
            UNION ALL
            SELECT doc_id, 'source' AS k, source AS v FROM documents
        )
    """,
    tags=("scalar", "map", "explode"),
)
def q_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map explode (§2.8): the open tag map unpivoted to long form —
    explode(map) → (key, value) rows, the inverse of create_map and
    the bridge from tag-soup columns to the join-friendly tags table."""
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select("doc_id", F.explode(m).alias("k", "v"))


@query(
    "q_try_fns",
    oracle="""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               TRY_CAST(event_type AS DOUBLE) AS bad_cast,
               TRY_CAST(NULL AS INTEGER) AS div_zero,
               round(value / nullif(CAST(floor(value) AS INT) % 7, 0), 4) AS div_mod7
        FROM events
    """,
    tags=("scalar", "cleaning"),
)
def q_try_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family — the cleaning engine's 'never
    throw on dirty rows' contract: try_cast of a JSON field and of an
    uncastable string (NULL, not an exception), division by zero as
    NULL. Spark's try_divide ≡ the oracle's x / nullif(y, 0); bare
    division raises in DuckDB and yields NULL in Spark, which is why
    the engine standardizes on try_divide. Denominator uses
    floor()-then-cast: DuckDB ROUNDS on double→int cast where Spark
    truncates — a §5.2-class trap pinned here."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.expr("try_cast(get_json_object(props, '$.k') AS int)").alias("k_int"),
        F.expr("try_cast(event_type AS double)").alias("bad_cast"),
        F.expr("try_divide(1.0, CAST(value * 0 AS INT))")
        .cast("int")
        .alias("div_zero"),
        F.round(
            F.expr("try_divide(value, CAST(floor(value) AS INT) % 7)"), 4
        ).alias("div_mod7"),
    )


@query(
    "q_url_fns",
    oracle="""
        WITH u AS (
            SELECT event_id,
                   'https://' || event_type || '.example.test/v1/u/'
                   || CAST(user_id AS VARCHAR) || '?v='
                   || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
                   || '&page=3' AS url
            FROM events)
        SELECT event_id,
               regexp_extract(url, 'https?://([^/]+)', 1) AS host,
               regexp_extract(url, 'https?://[^/]+([^?#]*)', 1) AS path,
               regexp_extract(url, '[?&]v=([^&#]*)', 1) AS v_param,
               regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page_param
        FROM u
    """,
    tags=("scalar", "url"),
)
def q_url_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family: parse_url HOST / PATH / QUERY-key
    extraction over a URL synthesized from event fields. The oracle
    spells the same extractions as anchored regexes (DuckDB has no
    parse_url), pinning Spark's parse_url semantics — host without
    scheme, path with leading slash, per-key query values."""
    events = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://"), F.col("event_type"), F.lit(".example.test/v1/u/"),
        F.col("user_id").cast("string"), F.lit("?v="),
        F.floor("value").cast("bigint").cast("string"), F.lit("&page=3"),
    )
    u = events.select("event_id", url.alias("url"))
    return u.select(
        "event_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("v")).alias("v_param"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page_param"),
    )


@query(
    "q_bitwise",
    oracle="""
        SELECT event_type,
               CAST(bit_and(user_id & 255) AS BIGINT) AS and_low,
               CAST(bit_or(user_id & 255) AS BIGINT) AS or_low,
               CAST(bit_xor(user_id) AS BIGINT) AS xor_all,
               CAST(sum(CAST(bit_count(user_id) AS BIGINT)) AS BIGINT)
                 AS popcnt_sum,
               CAST(min(user_id << 3) AS BIGINT) AS min_shl3,
               CAST(max(user_id >> 2) AS BIGINT) AS max_shr2
        FROM events
        GROUP BY event_type
    """,
    tags=("scalar", "bitwise"),
)
def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression + aggregate family: &, |, xor, shifts,
    popcount, and the bit_and/bit_or/bit_xor aggregates — the
    primitives the dedup fingerprints and checksum operators build
    on, pinned for cross-engine agreement on signed 64-bit ints."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.expr("bit_and(user_id & 255)").cast("bigint").alias("and_low"),
        F.expr("bit_or(user_id & 255)").cast("bigint").alias("or_low"),
        F.expr("bit_xor(user_id)").cast("bigint").alias("xor_all"),
        F.sum(F.bit_count("user_id").cast("bigint")).cast("bigint").alias("popcnt_sum"),
        F.min(F.expr("shiftleft(user_id, 3)")).cast("bigint").alias("min_shl3"),
        F.max(F.expr("shiftright(user_id, 2)")).cast("bigint").alias("max_shr2"),
    )
