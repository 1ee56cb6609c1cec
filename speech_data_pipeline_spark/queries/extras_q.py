"""Coverage extras: multimodal binary features, the W8 recursive
splitter, and the SQL surface Spark provides for free but the engine
must still expose correctly (rollup/cube, intersect/except, pivot-style
conditional aggregation — SURVEY.md §2.5/§2.7 'free from Spark' notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speech_data_pipeline_spark.operators import multimodal as mm
from speech_data_pipeline_spark.operators.splitting import recursive_gap_split
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import (
    derived_intervals,
    load_table,
)


@query(
    "mm_binary_features",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS sha256,
           64 + octet_length(encode(text)) % 577 AS fake_width,
           64 + (octet_length(encode(text)) * 31) % 577 AS fake_height
    FROM documents
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: binary payload column →
    Arrow-batched mapInPandas feature extraction.

    The oracle recomputes the same byte-level features in SQL, proving
    the Python kernel's batching/schema handling is faithful.
    """
    d = load_table(spark, sf_dir, "documents")
    return mm.extract_features(mm.attach_binary(d, "text"))


@query("w8_recursive_split")  # recursion with data-dependent cuts: rows-only
def w8_recursive_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: recursively split >4 h user spans at the largest internal gap.

    Non-SQL-expressible (data-dependent recursion); covered by golden
    tests in tests/test_splitting.py, rows-only checked by the driver.
    """
    ivd = derived_intervals(spark, sf_dir)
    out = recursive_gap_split(ivd, max_span=4 * 3_600_000_000)
    return out.select(
        "user_id", "start_us", "end_us", "piece_id", "piece_start", "piece_end"
    )


@query(
    "rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (free from Spark; exposed + oracle-checked)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total,
           count(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "set_intersect_except",
    oracle="""
    SELECT o_custkey AS custkey, 'both' AS tag FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey, 'both' FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    (SELECT o_custkey, 'only_open' FROM orders WHERE o_orderstatus = 'O'
     EXCEPT
     SELECT o_custkey, 'only_open' FROM orders WHERE o_orderstatus = 'F')
    """,
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (U-family completeness)."""
    o = load_table(spark, sf_dir, "orders")
    open_ = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    both = open_.intersect(finished).withColumn("tag", F.lit("both"))
    only_open = open_.subtract(finished).withColumn("tag", F.lit("only_open"))
    return both.unionByName(only_open)


@query(
    "pivot_acctbal_by_segment",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE)
             AS automobile,
           CAST(round(sum(CASE WHEN c_mktsegment = 'BUILDING'
                 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE)
             AS building,
           CAST(round(sum(CASE WHEN c_mktsegment = 'MACHINERY'
                 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE)
             AS machinery
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def pivot_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (portable form of groupBy.pivot)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dec = F.col("c_acctbal").cast("decimal(18,2)")

    def seg(name: str):
        return (
            F.round(
                F.sum(F.when(F.col("c_mktsegment") == name, dec).otherwise(F.lit(0))),
                2,
            )
            .cast("double")
            .alias(name.lower())
        )

    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(seg("AUTOMOBILE"), seg("BUILDING"), seg("MACHINERY"))
    )
