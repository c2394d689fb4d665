"""Scalar-function families (SURVEY.md §2.2 B32-B37) + the fixture
scans B2 (JSON) and B3 (CSV).

Every function used here is a built-in ``pyspark.sql.functions`` call —
JVM-side, whole-stage-codegen'd; no Python in the row path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import NATION, WEATHER_RAW
from ..sources import read_csv, read_json
from .registry import register
from .util import t

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures")
WEATHER_JSONL = os.path.abspath(os.path.join(FIXTURES, "weather_raw.jsonl"))
NATION_CSV = os.path.abspath(os.path.join(FIXTURES, "nation.csv"))


# ---------------------------------------------------------------------------
# B2 / B3 — schema'd JSON and CSV scans
# ---------------------------------------------------------------------------


@register(
    "b02_json_scan",
    oracle=f"""
    SELECT dt, name,
           main.temp      AS temp,
           len(weather)   AS n_conditions
    FROM read_json('{WEATHER_JSONL}', format='newline_delimited', columns={{
      'dt': 'BIGINT', 'timezone': 'BIGINT', 'name': 'VARCHAR',
      'weather': 'STRUCT(id INTEGER, main VARCHAR, description VARCHAR, icon VARCHAR)[]',
      'main': 'STRUCT(temp DOUBLE, feels_like DOUBLE, humidity INTEGER)'}})
    """,
)
def b02_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: JSONL scan with an explicit schema (reference's response.json
    decode, /root/reference/dags/weather-etl.py:122, schema-first).
    Extra document fields (visibility, wind, cod) are dropped by the
    schema, not crashed on."""
    raw = read_json(spark, WEATHER_JSONL, WEATHER_RAW)
    return raw.select(
        "dt",
        "name",
        F.col("main.temp").alias("temp"),
        F.size("weather").cast("bigint").alias("n_conditions"),
    )


@register(
    "b03_csv_scan",
    oracle=f"""
    SELECT n_nationkey, n_name, n_regionkey
    FROM read_csv('{NATION_CSV}', header=true,
                  columns={{'n_nationkey': 'INTEGER', 'n_name': 'VARCHAR',
                            'n_regionkey': 'INTEGER'}})
    """,
)
def b03_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: CSV scan, explicit schema + header."""
    return read_csv(spark, NATION_CSV, NATION, header=True)


# ---------------------------------------------------------------------------
# B32 — string functions
# ---------------------------------------------------------------------------


@register(
    "b32_string_funcs",
    oracle="""
    SELECT c_custkey,
           concat_ws('|', c_name, c_mktsegment)        AS joined,
           upper(c_mktsegment)                          AS seg_up,
           lower(c_name)                                AS name_low,
           substring(c_name, 10, 6)                     AS name_mid,
           trim(concat(' ', c_mktsegment, ' '))         AS seg_trim,
           replace(c_name, 'Customer#', 'C-')           AS name_repl,
           CAST(length(c_name) AS INTEGER)              AS name_len,
           (c_name LIKE '%5')                           AS ends_in_5,
           regexp_extract(c_name, '([0-9]+)$', 1)       AS digits,
           left(c_name, 8)                              AS name_left,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0')   AS nation_pad
    FROM customer
    """,
)
def b32_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: concat/case/substring/trim/replace/length/LIKE/regexp/pad
    (generalizes the reference's string building at
    /root/reference/dags/weather-etl.py:130)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.upper("c_mktsegment").alias("seg_up"),
        F.lower("c_name").alias("name_low"),
        F.substring("c_name", 10, 6).alias("name_mid"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trim"
        ),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias("name_repl"),
        F.length("c_name").alias("name_len"),
        F.col("c_name").like("%5").alias("ends_in_5"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("digits"),
        F.substring("c_name", 1, 8).alias("name_left"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_pad"),
    )


@register(
    "b32_string_split",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[1]                      AS first_word,
           string_split(p_name, ' ')[-1]                     AS last_word,
           CAST(len(string_split(p_name, ' ')) AS INTEGER)   AS n_words,
           array_to_string(string_split(p_name, ' '), '_')   AS re_joined
    FROM part
    """,
)
def b32_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32b: split + element access + re-join (A4's array_join pattern)."""
    p = t(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.element_at(toks, 1).alias("first_word"),
        F.element_at(toks, -1).alias("last_word"),
        F.size(toks).alias("n_words"),
        F.array_join(toks, "_").alias("re_joined"),
    )


# ---------------------------------------------------------------------------
# B33 — date/time functions
# ---------------------------------------------------------------------------


@register(
    "b33_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(year(o_orderdate) AS INTEGER)                 AS yr,
           CAST(month(o_orderdate) AS INTEGER)                AS mo,
           CAST(day(o_orderdate) AS INTEGER)                  AS dom,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)        AS dow,
           CAST(quarter(o_orderdate) AS INTEGER)              AS qtr,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                AS INTEGER)                                   AS days_to_98,
           CAST(epoch(o_orderdate) AS BIGINT)                 AS epoch_s,
           strftime(make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S')                      AS roundtrip
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def b33_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33: date_trunc / extract / arithmetic / diff / epoch round-trip
    (the reference's epoch→timestamp + offset arithmetic at
    /root/reference/dags/weather-etl.py:126-128, generalized).

    Portability traps handled: Spark ``dayofweek`` is 1-based
    (Sunday=1), DuckDB 0-based → oracle adds 1; ``date_add`` needs a
    DATE; epoch round-trip via ``timestamp_seconds``.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", od), "yyyy-MM-dd").alias("month_start"),
        F.year(od).alias("yr"),
        F.month(od).alias("mo"),
        F.dayofmonth(od).alias("dom"),
        F.dayofweek(od).alias("dow"),
        F.quarter(od).alias("qtr"),
        F.date_format(F.date_add(od.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
        F.datediff(F.lit("1998-01-01").cast("date"), od.cast("date")).alias(
            "days_to_98"
        ),
        F.unix_timestamp(od).alias("epoch_s"),
        F.date_format(
            F.timestamp_seconds(F.unix_timestamp(od)), "yyyy-MM-dd HH:mm:ss"
        ).alias("roundtrip"),
    )


# ---------------------------------------------------------------------------
# B34 — math functions
# ---------------------------------------------------------------------------


@register(
    "b34_math_funcs",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal, 1)                      AS bal_round1,
           abs(c_acctbal - 5000)                    AS bal_center,
           CAST(ceil(c_acctbal) AS BIGINT)          AS bal_ceil,
           CAST(floor(c_acctbal) AS BIGINT)         AS bal_floor,
           c_acctbal * c_acctbal                    AS bal_sq,
           c_custkey % 7                            AS key_mod7,
           CAST(sign(c_acctbal - 5000) AS DOUBLE)   AS bal_sign,
           sqrt(abs(c_acctbal))                     AS bal_sqrt,
           greatest(c_acctbal, 1000.0)              AS bal_hi,
           least(c_acctbal, 9000.0)                 AS bal_lo
    FROM customer
    """,
)
def b34_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34: round/abs/ceil/floor/pow/mod/sign/sqrt/greatest/least.

    sqrt is IEEE-correctly-rounded (safe across engines); transcendental
    fns (exp/ln) are deliberately excluded from hash checks — libm
    last-ulp differences make them unverifiable bit-exactly.
    ``pow(x,2)`` is spelled ``x*x`` for the same reason.
    """
    c = t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(bal, 1).alias("bal_round1"),
        F.abs(bal - 5000).alias("bal_center"),
        F.ceil(bal).alias("bal_ceil"),
        F.floor(bal).alias("bal_floor"),
        (bal * bal).alias("bal_sq"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
        F.signum(bal - 5000).alias("bal_sign"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        F.greatest(bal, F.lit(1000.0)).alias("bal_hi"),
        F.least(bal, F.lit(9000.0)).alias("bal_lo"),
    )


# ---------------------------------------------------------------------------
# B35 — array functions
# ---------------------------------------------------------------------------


@register(
    "b35_array_funcs",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents)
    SELECT doc_id, lang,
           CAST(len(tk) AS INTEGER)                                    AS n_tokens,
           array_to_string(tk[1:5], ', ')                              AS first5,
           CAST(len(list_filter(tk, x -> length(x) > 5)) AS INTEGER)   AS n_long,
           array_to_string(list_transform(tk[1:3], x -> upper(x)), '|') AS head_upper,
           array_to_string(list_sort(tk[1:4]), ',')                    AS head_sorted,
           list_contains(tk, 'spark')                                  AS has_spark
    FROM toks
    """,
)
def b35_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: transform / filter / slice / sort / contains / join over
    token arrays (A4's array handling generalized). Array results are
    re-joined to strings so the comparison is representation-stable."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "lang",
        F.size(tk).alias("n_tokens"),
        F.array_join(F.slice(tk, 1, 5), ", ").alias("first5"),
        F.size(F.filter(tk, lambda x: F.length(x) > 5)).alias("n_long"),
        F.array_join(F.transform(F.slice(tk, 1, 3), F.upper), "|").alias("head_upper"),
        F.array_join(F.sort_array(F.slice(tk, 1, 4)), ",").alias("head_sorted"),
        F.array_contains(tk, "spark").alias("has_spark"),
    )


@register(
    "b35_explode",
    oracle="""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE lang = 'en') u
    WHERE tok <> ''
    GROUP BY tok
    """,
)
def b35_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35b/B48: explode (UDTF-shaped lateral view) → word counts."""
    d = t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# B36 / B37 — map & JSON functions (events.props is a JSON text column)
# ---------------------------------------------------------------------------


@register(
    "b36_map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           CAST(json_extract(props, '$.k') AS INTEGER)       AS k_value,
           CAST(len(json_keys(props)) AS INTEGER)            AS n_keys,
           CAST(list_reduce(
                 list_transform(json_keys(props),
                   kk -> CAST(json_extract(props, '$.' || kk) AS INTEGER)),
                 (a, b) -> a + b) AS INTEGER)                AS vals_sum
    FROM events
    """,
)
def b36_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: JSON text → MapType → map_keys / map_values / element
    access / size (values folded to a sum so map_values is checked
    order-independently)."""
    e = t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return e.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.aggregate(
            F.map_values(m), F.lit(0), lambda acc, x: acc + x
        ).alias("vals_sum"),
    )


@register(
    "b37_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                  AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT)         AS k_num,
           COALESCE(json_extract_string(props, '$.missing'), '<none>') AS missing_path,
           to_json(struct_pack(id := event_id, kind := event_type))    AS packed,
           json_extract_string(props, '$.k')                  AS jt_k
    FROM events
    """,
)
def b37_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: get_json_object / json_tuple / missing-path NULL /
    to_json(struct) (A2/A3 generalized: nested-document access as
    expressions)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
        F.coalesce(
            F.get_json_object("props", "$.missing"), F.lit("<none>")
        ).alias("missing_path"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("kind"))
        ).alias("packed"),
        F.json_tuple(F.col("props"), "k").alias("jt_k"),
    )
