"""Cleaning / audit / reshape operators — SURVEY.md §2.3 (C1–C7) and
the predicate classifiers §2.2 (P3–P4). This is the reference
project's core value-add: audit messy strings, rewrite them via a
mapping dict, split tag keys, reshape elements, validate the result.

Fixture binding (FIXTURES.md §B): `part.p_name` plays the street-name
column ("small ring" — last token is the street type), `o_totalprice`
strings play postcodes, `events.props` plays phone-ish raw strings,
`documents.lang/source` compose tag keys.

Engine policy (SURVEY.md §2.10): every operator here is pure built-in
Column expressions — regexp_extract / regexp_replace / split / when —
so the whole batch stays inside whole-stage codegen; the reference's
per-element Python functions (update_name, key_type, shape_element)
become vectorized JVM expressions.

The mapping-dict rewrite (C2) is a broadcast join against a mapping
table, not a when-chain: at 100 TB a mapping of thousands of entries
stays a O(1)-per-row hash probe and is maintainable as data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table

# Street-type audit vocabulary (reference: the `expected` list in
# audit.py; here bound to the fixture's part-noun suffixes).
EXPECTED_TYPES = ("bolt", "gear", "plate", "rod")

# Reference: PROBLEMCHARS = re.compile(r'[=\+/&<>;\'"\?%#$@\,\. \t\r\n]')
PROBLEMCHARS_SPARK = r'[=\+/&<>;' + "'" + r'"\?%#$@,\. \t\r\n]'
PROBLEMCHARS_DUCK = """[=+/&<>;''"?%#$@,. \\t\\r\\n]"""

# The unified "tag key" relation: one string key per row drawn from
# several fixture columns so all four key_type buckets are inhabited
# (lower, lower_colon, problemchars, other).
_KEYS_SQL = """
    SELECT event_type AS k FROM events
    UNION ALL SELECT lang || ':' || source AS k FROM documents
    UNION ALL SELECT p_type AS k FROM part
    UNION ALL SELECT p_name AS k FROM part
"""


def _keys_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(F.col("event_type").alias("k"))
    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("k")
    )
    part = load_table(spark, sf_dir, "part")
    return (
        events.unionByName(docs)
        .unionByName(part.select(F.col("p_type").alias("k")))
        .unionByName(part.select(F.col("p_name").alias("k")))
    )


# ---------------------------------------------------------------------------
# P3 — problem-character predicate


@query(
    "q_problemchars",
    oracle=f"""
        SELECT k, count(*) AS cnt FROM ({_KEYS_SQL})
        WHERE NOT regexp_matches(k, '{PROBLEMCHARS_DUCK}')
        GROUP BY k
    """,
    tags=("filter", "regex"),
)
def q_problemchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop keys containing problem characters (reference: the
    PROBLEMCHARS regex gate in data.py/tags.py, §2.2 P3); keep the
    survivors' histogram."""
    keys = _keys_df(spark, sf_dir)
    return (
        keys.filter(~F.col("k").rlike(PROBLEMCHARS_SPARK))
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# P4 — regex bucket classifier (tags.py::key_type)


@query(
    "q_keybuckets",
    oracle=f"""
        SELECT CASE
                 WHEN regexp_matches(k, '{PROBLEMCHARS_DUCK}') THEN 'problemchars'
                 WHEN regexp_full_match(k, '[a-z_]+') THEN 'lower'
                 WHEN regexp_full_match(k, '[a-z_]+:[a-z_0-9]+') THEN 'lower_colon'
                 ELSE 'other'
               END AS bucket,
               count(*) AS cnt
        FROM ({_KEYS_SQL})
        GROUP BY 1
    """,
    tags=("agg", "regex"),
)
def q_keybuckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify keys into lower / lower_colon / problemchars / other
    and count each (reference: tags.py::key_type, §2.2 P4) — a
    when-chain bucket column + hash aggregate."""
    keys = _keys_df(spark, sf_dir)
    bucket = (
        F.when(F.col("k").rlike(PROBLEMCHARS_SPARK), "problemchars")
        .when(F.col("k").rlike(r"^[a-z_]+$"), "lower")
        .when(F.col("k").rlike(r"^[a-z_]+:[a-z_0-9]+$"), "lower_colon")
        .otherwise("other")
    )
    return keys.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# C1 — street-type audit


@query(
    "q_audit_street",
    oracle=f"""
        SELECT DISTINCT
               regexp_extract(regexp_replace(p_name, '\\.$', ''), '([^ ]+)$', 1) AS street_type,
               p_name AS name
        FROM part
        WHERE regexp_extract(regexp_replace(p_name, '\\.$', ''), '([^ ]+)$', 1)
              NOT IN {EXPECTED_TYPES!r}
    """,
    tags=("cleaning", "audit"),
)
def q_audit_street(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Street-type audit (reference: audit.py::audit_street_type —
    extract the last token, collect names whose type is not in the
    expected list, §2.3 C1). The reference's defaultdict(set) becomes
    a DISTINCT over (type, name) pairs — order-insensitive and
    shuffle-light (set-as-rows, not set-as-array)."""
    part = load_table(spark, sf_dir, "part")
    street_type = F.regexp_extract(
        F.regexp_replace(F.col("p_name"), r"\.$", ""), r"([^ ]+)$", 1
    ).alias("street_type")
    return (
        part.select(street_type, F.col("p_name").alias("name"))
        .filter(~F.col("street_type").isin(*EXPECTED_TYPES))
        .distinct()
    )


# ---------------------------------------------------------------------------
# C2 — mapping-dict rewrite via broadcast join

STREET_MAPPING = (
    ("widget", "Widget"),
    ("gizmo", "Gadget"),
    ("ring", "Loop"),
    ("anvil", "Anvil Block"),
)

_MAPPING_VALUES = ", ".join(f"('{a}', '{b}')" for a, b in STREET_MAPPING)


@query(
    "q_clean_street",
    oracle=f"""
        SELECT p_partkey, p_name,
               CASE WHEN m.clean IS NULL THEN p_name
                    ELSE regexp_replace(p_name, '[^ ]+$', '') || m.clean
               END AS cleaned
        FROM part
        LEFT JOIN (VALUES {_MAPPING_VALUES}) m(raw, clean)
          ON regexp_extract(p_name, '([^ ]+)$', 1) = m.raw
    """,
    tags=("cleaning", "broadcast-join"),
)
def q_clean_street(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mapping-dict rewrite (reference: audit.py::update_name with the
    {'St': 'Street', ...} mapping, §2.3 C2). Implemented as a
    broadcast LEFT JOIN against a mapping table and a suffix rebuild —
    the scalable form of the reference's dict lookup (a when-chain
    would re-compile per entry; a joined table stays O(1)/row and can
    hold millions of entries)."""
    part = load_table(spark, sf_dir, "part")
    mapping = spark.createDataFrame(list(STREET_MAPPING), "raw string, clean string")
    last = F.regexp_extract(F.col("p_name"), r"([^ ]+)$", 1)
    joined = part.withColumn("__last", last).join(
        F.broadcast(mapping), F.col("__last") == F.col("raw"), "left"
    )
    cleaned = F.when(F.col("clean").isNull(), F.col("p_name")).otherwise(
        F.concat(F.regexp_replace(F.col("p_name"), r"[^ ]+$", ""), F.col("clean"))
    )
    return joined.select("p_partkey", "p_name", cleaned.alias("cleaned"))


# ---------------------------------------------------------------------------
# C3 — postcode normalization


@query(
    "q_clean_postcode",
    oracle="""
        SELECT o_orderkey,
               nullif(regexp_extract(CAST(o_totalprice AS VARCHAR), '([0-9]{5})', 1), '')
                 AS postcode5,
               regexp_extract(CAST(o_totalprice AS VARCHAR), '([0-9]{5})', 1) = ''
                 AS nonconforming
        FROM orders
    """,
    tags=("cleaning", "regex"),
)
def q_clean_postcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postcode normalization (reference: keep the 5-digit core,
    flag non-conforming values, §2.3 C3) over price-strings as the
    messy-digits fixture column."""
    orders = load_table(spark, sf_dir, "orders")
    s = F.col("o_totalprice").cast("string")
    five = F.regexp_extract(s, r"([0-9]{5})", 1)
    return orders.select(
        "o_orderkey",
        F.nullif(five, F.lit("")).alias("postcode5"),
        (five == "").alias("nonconforming"),
    )


# ---------------------------------------------------------------------------
# C4 — phone normalization


@query(
    "q_clean_phone",
    oracle="""
        SELECT event_id, regexp_replace(props, '[^0-9]', '', 'g') AS digits
        FROM events
    """,
    tags=("cleaning", "regex"),
)
def q_clean_phone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phone normalization (reference: strip `()-. ` and prefixes to
    canonical digits, §2.3 C4): strip all non-digits from the raw
    props string. Spark regexp_replace is global by default; DuckDB
    needs the 'g' flag."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.regexp_replace(F.col("props"), "[^0-9]", "").alias("digits")
    )


# ---------------------------------------------------------------------------
# C5 — tag-key split


@query(
    "q_tagsplit",
    oracle="""
        SELECT k,
               CASE WHEN strpos(k, ':') > 0 THEN split_part(k, ':', 1)
                    ELSE 'regular' END AS type,
               CASE WHEN strpos(k, ':') > 0
                    THEN substr(k, strpos(k, ':') + 1)
                    ELSE k END AS key,
               count(*) AS cnt
        FROM (
            SELECT lang || ':' || source AS k FROM documents
            UNION ALL SELECT lang || ':' || source || ':' || CAST(n_chars AS VARCHAR) FROM documents
            UNION ALL SELECT source FROM documents
        )
        GROUP BY 1, 2, 3
    """,
    tags=("cleaning", "split"),
)
def q_tagsplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-key split (reference: data.py::shape_element — 'addr:street'
    → type='addr', key='street'; ≥2 colons keep the remainder intact;
    no colon → type='regular', §2.3 C5)."""
    docs = load_table(spark, sf_dir, "documents")
    one = docs.select(F.concat("lang", F.lit(":"), "source").alias("k"))
    two = docs.select(
        F.concat("lang", F.lit(":"), "source", F.lit(":"), F.col("n_chars").cast("string")).alias("k")
    )
    none = docs.select(F.col("source").alias("k"))
    keys = one.unionByName(two).unionByName(none)
    has_colon = F.instr(F.col("k"), ":") > 0
    parts = F.split(F.col("k"), ":", 2)
    return (
        keys.select(
            "k",
            F.when(has_colon, parts.getItem(0)).otherwise("regular").alias("type"),
            F.when(has_colon, parts.getItem(1)).otherwise(F.col("k")).alias("key"),
        )
        .groupBy("k", "type", "key")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# C6 — element reshape (struct/array build + ordinal explode)


@query(
    "q_reshape",
    oracle="""
        SELECT event_id, user_id AS created_user,
               epoch_us(CAST(ts AS TIMESTAMP)) AS created_ts_us,
               0 AS pos_idx, value AS pos_val
        FROM events
        UNION ALL
        SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)), 1, value * 2
        FROM events
    """,
    tags=("cleaning", "reshape", "explode"),
)
def q_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element reshape (reference: shape_element builds the nested
    {'created': {...}, 'pos': [lat, lon]} document, §2.3 C6): build
    the `created` struct and `pos` array, then flatten back with
    posexplode so the ordinal is explicit (ways_nodes.position
    semantics). Narrow ops only — zero shuffles."""
    events = load_table(spark, sf_dir, "events")
    shaped = events.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("user"), F.unix_micros("ts").alias("ts_us")
        ).alias("created"),
        F.array(F.col("value"), F.col("value") * 2).alias("pos"),
    )
    return shaped.select(
        "event_id",
        F.col("created.user").alias("created_user"),
        F.col("created.ts_us").alias("created_ts_us"),
        F.posexplode("pos").alias("pos_idx", "pos_val"),
    )


# ---------------------------------------------------------------------------
# C7 — schema validation


@query(
    "q_validate",
    oracle="""
        SELECT event_type,
               count(*) FILTER (WHERE ok) AS n_valid,
               count(*) FILTER (WHERE NOT ok) AS n_invalid
        FROM (
            SELECT event_type,
                   (user_id IS NOT NULL
                    AND value BETWEEN 0 AND 100
                    AND TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
                    AND event_type IN ('click','view','signup','purchase','error')) AS ok
            FROM events
        )
        GROUP BY event_type
    """,
    tags=("cleaning", "validate"),
)
def q_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema validation (reference: cerberus Validator over schema.py,
    §2.3 C7) as typed casts + constraint predicates, counting
    accepts/rejects per group — validation becomes a filterable
    column, not a per-row Python exception."""
    events = load_table(spark, sf_dir, "events")
    ok = (
        F.col("user_id").isNotNull()
        & F.col("value").between(0, 100)
        & F.expr("try_cast(get_json_object(props, '$.k') AS int)").isNotNull()
        & F.col("event_type").isin("click", "view", "signup", "purchase", "error")
    )
    return (
        events.select("event_type", ok.alias("ok"))
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("ok"), 1)).alias("n_valid"),
            F.count(F.when(~F.col("ok"), 1)).alias("n_invalid"),
        )
    )


@query(
    "q_fuzzy_street",
    oracle="""
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        FROM (SELECT DISTINCT p_name FROM part) a
        JOIN (SELECT DISTINCT p_name FROM part) b
          ON regexp_extract(a.p_name, '([^ ]+)$', 1) = regexp_extract(b.p_name, '([^ ]+)$', 1)
         AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    tags=("cleaning", "fuzzy"),
)
def q_fuzzy_street(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (the OSM street-variant problem beyond
    fixed mappings): distinct names blocked on their last token (the
    street type), paired within a block, kept when edit distance ≤ 3.
    Blocking is what makes edit-distance dedup feasible at scale —
    the quadratic cost is confined to blocks, and the block key is a
    plain equi-join; levenshtein runs codegen'd in the JVM."""
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    last = lambda c: F.regexp_extract(c, r"([^ ]+)$", 1)
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (last(F.col("name_a")) == last(F.col("name_b")))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
    )


@query(
    "q_regex_backref",
    oracle="""
        SELECT p_partkey, p_name,
               regexp_replace(p_name, '^(\\S+) (\\S+)$', '\\2, \\1') AS flipped
        FROM part
    """,
    tags=("cleaning", "regex"),
)
def q_regex_backref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group backreference rewrite ('small ring' → 'ring,
    small' — the street-name reordering trick). Dialect note the
    oracle encodes: Java regex uses $1/$2 in the replacement, RE2
    (DuckDB) uses \\1/\\2 — same semantics, different spelling."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_name",
        F.regexp_replace("p_name", r"^(\S+) (\S+)$", r"$2, $1").alias("flipped"),
    )


# Declarative constraint rules: (rule_name, SQL predicate) evaluated
# in ONE pass — every rule becomes a conditional count in a single
# aggregate, so auditing 50 rules costs the same scan as auditing 1.
# Spark and DuckDB share the predicate SQL verbatim (ANSI subset).
_LINEITEM_RULES = (
    ("orderkey_not_null", "l_orderkey IS NOT NULL"),
    ("quantity_range", "l_quantity BETWEEN 1 AND 50"),
    ("price_positive", "l_extendedprice > 0"),
    ("discount_range", "l_discount BETWEEN 0.0 AND 0.1"),
    ("tax_range", "l_tax BETWEEN 0.0 AND 0.08"),
    ("linenumber_positive", "l_linenumber >= 1"),
    ("returnflag_domain", "l_returnflag IN ('A', 'N', 'R')"),
    ("linestatus_domain", "l_linestatus IN ('O', 'F')"),
)


def expectations(df, rules):
    """Deequ/dbt-test-style constraint audit: evaluate (name,
    predicate) rules as conditional counts in one aggregate over one
    scan. Returns one row per rule: passed, failed, pass share.
    At 100 TB: no shuffle at all before the final 1-row-per-rule
    stack — each rule is a map-side sum; the unpivot happens on the
    aggregated scalars."""
    aggs = []
    for name, pred in rules:
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("bigint").alias(f"p_{name}")
        )
        aggs.append(
            F.sum(F.when(F.expr(pred), 0).otherwise(1)).cast("bigint").alias(f"f_{name}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', p_{name}, f_{name}" for name, _ in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack}) AS (rule, n_pass, n_fail)")
    ).select(
        "rule",
        "n_pass",
        "n_fail",
        F.expr("CAST(10000 * n_pass div (n_pass + n_fail) AS BIGINT)").alias(
            "pass_x10k"
        ),
    )


@query(
    "q_expectations",
    oracle="""
        WITH wide AS (SELECT
    """
    + ",\n    ".join(
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS p_{name},"
        f" CAST(sum(CASE WHEN {pred} THEN 0 ELSE 1 END) AS BIGINT) AS f_{name}"
        for name, pred in _LINEITEM_RULES
    )
    + """
        FROM lineitem)
        SELECT rule, n_pass, n_fail,
               CAST(10000 * n_pass // (n_pass + n_fail) AS BIGINT) AS pass_x10k
        FROM (
    """
    + "\n            UNION ALL ".join(
        f"SELECT '{name}' AS rule, p_{name} AS n_pass, f_{name} AS n_fail FROM wide"
        for name, _ in _LINEITEM_RULES
    )
    + ")",
    tags=("cleaning", "validate", "expectations"),
)
def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (C7 extension): a rule
    set audited in one scan — the deequ/dbt-test pattern as a pure
    DataFrame program. Rules are SQL predicates shared verbatim with
    the oracle; each costs one conditional sum, the per-rule report
    is a stack() over already-aggregated scalars."""
    li = load_table(spark, sf_dir, "lineitem")
    return expectations(li, _LINEITEM_RULES)


@query(
    "q_text_canon",
    oracle="""
        WITH canon AS (
            SELECT doc_id, text,
                   trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS ctext
            FROM documents)
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN ctext <> text THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_changed,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_raw,
               CAST(count(DISTINCT md5(ctext)) AS BIGINT) AS distinct_canon
        FROM canon
    """,
    tags=("cleaning", "text", "pipeline"),
)
def q_text_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text canonicalization audit — the normalize-before-hash step
    every dedup pipeline runs first (case fold, whitespace collapse,
    trim): without it, trivially-different copies defeat exact dedup.
    Reports how many docs change under canonicalization and how the
    distinct-hash count tightens (distinct_canon <= distinct_raw is
    the signal the step matters).  Rowwise expressions + one
    aggregate; both engines share the regexp dialect for ' +'."""
    docs = load_table(spark, sf_dir, "documents")
    canon = docs.selectExpr(
        "doc_id",
        "text",
        "trim(regexp_replace(lower(text), ' +', ' ')) AS ctext",
    )
    return canon.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("ctext") != F.col("text"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_changed"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("distinct_raw"),
        F.countDistinct(F.md5("ctext")).cast("bigint").alias("distinct_canon"),
    )
