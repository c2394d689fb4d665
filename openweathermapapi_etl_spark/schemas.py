"""All StructTypes in one place (SURVEY.md §1.3: explicit schemas, no
inference in the hot path — a missing JSON field becomes NULL, not a
crash, unlike the reference's dict access at
/root/reference/dags/weather-etl.py:126-131).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Weather domain (reference parity; FIXTURES.md §A)
# ---------------------------------------------------------------------------

#: One OpenWeatherMap response document — the subset the reference
#: consumes (/root/reference/dags/weather-etl.py:126-131). Extra API
#: fields are ignored by this explicit read schema.
WEATHER_RAW = T.StructType(
    [
        T.StructField("dt", T.LongType()),  # epoch seconds UTC (:126)
        T.StructField("timezone", T.LongType()),  # UTC offset seconds (:127)
        T.StructField("name", T.StringType()),  # resolved city name (:129)
        T.StructField(
            "weather",  # array of condition structs; only description used (:130)
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.IntegerType()),
                        T.StructField("main", T.StringType()),
                        T.StructField("description", T.StringType()),
                        T.StructField("icon", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "main",  # nested struct; only temp used, Celsius (:118,:131)
            T.StructType(
                [
                    T.StructField("temp", T.DoubleType()),
                    T.StructField("feels_like", T.DoubleType()),
                    T.StructField("humidity", T.IntegerType()),
                ]
            ),
        ),
    ]
)

#: The durable fact table (/root/reference/dags/weather-etl.py:70-77).
#: ``Time`` is naive local wall-clock (UTC + offset at fetch time —
#: weather-etl.py:126-128); with the session pinned to UTC a plain
#: TimestampType carries NTZ semantics bit-for-bit.
WEATHER = T.StructType(
    [
        T.StructField("Time", T.TimestampType()),
        T.StructField("City_Name", T.StringType()),
        T.StructField("Weather_Description", T.StringType()),
        T.StructField("Temperature", T.DoubleType()),
    ]
)

#: Logical primary key of WEATHER (weather-etl.py:76). Spark cannot
#: enforce it; the M1 merge operator guarantees it by construction and
#: the B22 validation query asserts it.
WEATHER_KEYS = ["Time", "City_Name"]

# ---------------------------------------------------------------------------
# Driver testdata tables (FIXTURES.md §B; read from parquet footers)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON text
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
