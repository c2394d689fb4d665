"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 B45-B49).

The reference's transform is imperative Python
(/root/reference/dags/weather-etl.py:126-131), so a Python escape
hatch is in-scope — but it is the *slow path*: row-at-a-time UDFs
exist to prove the surface (B45); everything else is Arrow-vectorized
(pandas_udf / applyInPandas), and results are integer/exact or
IEEE-deterministic so they stay hash-checkable against SQL oracles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import register
from .util import t


@register(
    "b45_scalar_udf",
    oracle="""
    SELECT c_custkey, reverse(c_name) AS name_rev,
           CAST(length(c_name) AS INTEGER) AS name_len
    FROM customer
    """,
)
def b45_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B45: row-at-a-time Python UDF (deliberately; B46 is the fast
    flavor). Serde cost per row — never use in a 100 TB hot path."""

    @F.udf(returnType=T.StringType())
    def py_reverse(s: str) -> str:
        return s[::-1] if s is not None else None

    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        py_reverse("c_name").alias("name_rev"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "b46_pandas_udf",
    oracle="""
    SELECT o_orderkey,
           o_totalprice * 2.0 + 1.0             AS scaled,
           CAST(o_totalprice >= 100000 AS BOOLEAN) AS is_big
    FROM orders
    """,
)
def b46_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B46: Arrow-vectorized scalar pandas UDF — whole columns cross the
    boundary as Arrow batches (~10-100x over B45). Row-wise IEEE double
    math, so results are bit-identical to the SQL oracle."""

    @F.pandas_udf(T.DoubleType())
    def scale(x: pd.Series) -> pd.Series:
        return x * 2.0 + 1.0

    @F.pandas_udf(T.BooleanType())
    def big(x: pd.Series) -> pd.Series:
        return x >= 100000

    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        scale("o_totalprice").alias("scaled"),
        big("o_totalprice").alias("is_big"),
    )


@register(
    "b47_grouped_map",
    oracle="""
    SELECT c_custkey, c_nationkey,
           c_acctbal - MIN(c_acctbal) OVER (PARTITION BY c_nationkey) AS bal_rel,
           MAX(c_acctbal) OVER (PARTITION BY c_nationkey)
             - MIN(c_acctbal) OVER (PARTITION BY c_nationkey)         AS grp_range
    FROM customer
    """,
)
def b47_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B47: applyInPandas grouped-map — each nation's customers arrive
    as one pandas DataFrame. Uses min/max (exact in fp, order-free) so
    the window-function oracle matches bit-for-bit."""
    out_schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("bal_rel", T.DoubleType()),
            T.StructField("grp_range", T.DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "bal_rel": pdf["c_acctbal"] - lo,
                "grp_range": hi - lo,
            }
        )

    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(normalize, out_schema)


@register(
    "b48_udtf_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents
    WHERE doc_id % 50 = 0
    """,
)
def b48_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B48: table function — one input row expands to N output rows.
    Expressed as explode() (Spark's native lateral view); the
    Python-class UDTF API adds nothing for this shape at 100 TB, and
    explode stays in codegen."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))


@register(
    "b49_pandas_udaf",
    oracle="""
    SELECT c_nationkey,
           CAST(SUM(c_custkey * (c_nationkey + 1)) AS BIGINT) AS weighted,
           COUNT(*)                                           AS n
    FROM customer
    GROUP BY c_nationkey
    """,
)
def b49_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49: grouped-aggregate pandas UDF (UDAF). Integer arithmetic —
    exact under any accumulation order, so the SQL oracle hash-matches."""

    @F.pandas_udf(T.LongType())
    def weighted_sum(key: pd.Series, nat: pd.Series) -> int:
        return int((key * (nat + 1)).sum())

    @F.pandas_udf(T.LongType())
    def group_count(key: pd.Series) -> int:
        # Pandas UDAFs can't mix with JVM aggregates in one agg() —
        # so the count is a second pandas aggregate.
        return int(key.count())

    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        weighted_sum("c_custkey", "c_nationkey").alias("weighted"),
        group_count("c_custkey").alias("n"),
    )
