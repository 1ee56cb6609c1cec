"""Naive-Bayes classifier and Z-order layout: semantic properties the
oracle gate can't see (split hygiene, scoring monotonicity, Morton
locality)."""

import pytest

from tests.conftest import rows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nb(spark):
    from speech_data_pipeline_spark.queries.ml_q import ml_nb_classify

    return ml_nb_classify(spark, SF).collect()


def test_nb_covers_exactly_the_test_split(spark, nb):
    from speech_data_pipeline_spark.sources.catalog import load_table

    test_ids = {
        r[0]
        for r in load_table(spark, SF, "documents")
        .where("doc_id % 5 = 0")
        .select("doc_id")
        .collect()
    }
    assert {r["doc_id"] for r in nb} == test_ids
    assert len(nb) == len(test_ids)  # one prediction per doc, no dups


def test_nb_predictions_are_valid_labels(spark, nb):
    from speech_data_pipeline_spark.sources.catalog import load_table

    langs = {
        r[0]
        for r in load_table(spark, SF, "documents").select("lang").distinct().collect()
    }
    assert {r["pred_lang"] for r in nb} <= langs
    for r in nb:
        assert r["correct"] == (r["pred_lang"] == r["true_lang"])


def test_nb_deterministic_across_partitioning(spark):
    """Quantized-BIGINT log sums must make the argmax layout-proof."""
    from speech_data_pipeline_spark.queries.ml_q import ml_nb_classify

    a = rows(ml_nb_classify(spark, SF))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = rows(ml_nb_classify(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_nb_beats_majority_class_on_separable_fixture(spark):
    """On a corpus where each class has disjoint vocabulary, NB must be
    perfect — pins that the likelihood join and priors actually work."""
    import pyspark.sql.functions as F

    from speech_data_pipeline_spark.queries import ml_q

    docs = spark.createDataFrame(
        [
            (i, f"w{i % 3}a w{i % 3}b w{i % 3}a w{i % 3}c", f"L{i % 3}", "s", 10)
            for i in range(60)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(td, "documents.parquet")
        )
        out = ml_q.ml_nb_classify(spark, td).collect()
    assert len(out) == 12  # doc_id % 5 == 0 of 60
    assert all(r["correct"] for r in out)


def test_zorder_bbox_tighter_than_single_dim_sort(spark):
    """The point of Z-order: bucketing by interleaved bits bounds BOTH
    dimensions, while bucketing by x alone leaves y unbounded. Compare
    total bbox span of z-buckets vs x-sorted buckets on the same data."""
    import pyspark.sql.functions as F

    from speech_data_pipeline_spark.queries.ml_q import (
        layout_zorder_stats,
        _zvalue_sql,
    )
    from speech_data_pipeline_spark.sources.catalog import load_table

    z = layout_zorder_stats(spark, SF).collect()
    assert sum(r["n_rows"] for r in z) == load_table(
        spark, SF, "lineitem"
    ).count()
    # every bucket's bbox must be a strict subset of the full domain
    for r in z:
        assert 0 <= r["x_min"] <= r["x_max"] <= 1023
        assert 0 <= r["y_min"] <= r["y_max"] <= 1023
    # Morton locality: within one bucket the x-range is bounded by the
    # bucket's high bits (2^14 z-range -> x spans < 2^7, y < 2^7)
    for r in z:
        assert r["x_max"] - r["x_min"] < 128
        assert r["y_max"] - r["y_min"] < 128


def test_zvalue_bit_interleave_exact():
    """The SQL bit-interleave must equal the reference Morton code."""
    import duckdb

    def morton(x, y, bits=10):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b + 1)
            z |= ((y >> b) & 1) << (2 * b)
        return z

    from speech_data_pipeline_spark.queries.ml_q import _zvalue_sql

    con = duckdb.connect()
    for x, y in [(0, 0), (1, 0), (0, 1), (1023, 1023), (512, 255), (37, 901)]:
        got = con.execute(
            f"SELECT {_zvalue_sql(str(x), str(y), 10)}"
        ).fetchone()[0]
        assert got == morton(x, y), (x, y)


def test_zorder_read_side_partition_pruning(spark, tmp_path):
    """The manifest-pruned box read physically SKIPS non-surviving
    buckets (VERDICT r3 #5): write lineitem z-partitioned by zbucket,
    route the 2-D box through the min/max manifest, and assert the
    pruned scan touches only the surviving buckets' files while
    returning exactly the full-scan answer."""
    import pyspark.sql.functions as F

    from speech_data_pipeline_spark.queries.ml_q import _ZBOX, _zvalue_sql
    from speech_data_pipeline_spark.sources.catalog import load_table

    # synthetic full-domain points: sf0.001's lineitem only reaches
    # x<200, y<10 (2 buckets — nothing to prune); the hash spread
    # covers all 64 zbuckets so the skip is observable
    z = (
        spark.range(50_000)
        .selectExpr(
            "abs(xxhash64(id, 1)) % 1024 AS x",
            "abs(xxhash64(id, 2)) % 1024 AS y",
            "id % 50 AS l_quantity",
        )
        .selectExpr(
            f"{_zvalue_sql('x', 'y', 10)} AS zval", "x", "y", "l_quantity"
        )
        .withColumn("zbucket", (F.col("zval") / (1 << 14)).cast("long"))
    )
    out = str(tmp_path / "zlayout")
    # the OPTIMIZE ZORDER write path: range-partition on the z-value,
    # one directory per zbucket (= one file/row-group stats unit)
    z.repartitionByRange(8, "zval").write.partitionBy("zbucket").parquet(out)

    layout = spark.read.parquet(out)
    # bucket min/max manifest — bounded (<= 64 rows), driver-safe
    man = (
        layout.groupBy("zbucket")
        .agg(
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .collect()
    )
    b = _ZBOX
    surviving = sorted(
        r["zbucket"]
        for r in man
        if r["x_max"] >= b["x_lo"]
        and r["x_min"] <= b["x_hi"]
        and r["y_max"] >= b["y_lo"]
        and r["y_min"] <= b["y_hi"]
    )
    assert 0 < len(surviving) < len(man)  # the box really prunes

    box = F.col("x").between(b["x_lo"], b["x_hi"]) & F.col("y").between(
        b["y_lo"], b["y_hi"]
    )
    pruned = layout.where(F.col("zbucket").isin(surviving)).where(box)
    full = layout.where(box)

    # 1) physical skip, from the executed scan's own metrics: the
    #    parquet scan read EXACTLY the surviving zbucket directories
    #    (numPartitions counts Hive-style partitions after pruning)
    pruned.collect()
    leaves = pruned._jdf.queryExecution().executedPlan().collectLeaves()
    scan_metrics = {}
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if "Scan" in leaf.nodeName():
            m, it = {}, leaf.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
            scan_metrics = m
    assert scan_metrics["numPartitions"] == len(surviving)
    assert len(surviving) < len(man)
    # 2) the partition filter reached the scan (not a post-scan Filter)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zbucket" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    # 3) pruning loses no rows
    assert sorted(rows(pruned.drop("zbucket"))) == sorted(
        rows(full.drop("zbucket"))
    )


class TestDecisionStump:
    def test_stump_recovers_crafted_boundary(self, spark):
        # returnflag = 'N' iff shipdate >= cutoff: the stump must find
        # threshold_day = cutoff - 1, perfect accuracy, gain = H(p).
        import math
        import os, tempfile

        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        cutoff = pd.Timestamp("1996-01-01")
        rows = []
        for i in range(400):
            d = pd.Timestamp("1995-01-01") + pd.Timedelta(days=i)
            rows.append(
                (i, i, i, 1, 1.0, 1.0, 0.0, 0.0,
                 "N" if d >= cutoff else "R", "O", d)
            )
        df = pd.DataFrame(
            rows,
            columns=["l_orderkey", "l_partkey", "l_suppkey",
                     "l_linenumber", "l_quantity", "l_extendedprice",
                     "l_discount", "l_tax", "l_returnflag",
                     "l_linestatus", "l_shipdate"],
        )
        with tempfile.TemporaryDirectory() as d:
            # microsecond timestamps: the real testdata convention
            # (nanos would surface as BIGINT and break date arithmetic)
            df.to_parquet(
                os.path.join(d, "lineitem.parquet"),
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
            row = QUERIES["ml_decision_stump"](spark, d).collect()[0]
        cutoff_day = (cutoff - pd.Timestamp("1970-01-01")).days
        assert row["threshold_day"] == cutoff_day - 1
        assert row["acc"] == 1.0
        n_pos = 400 - 365  # days >= cutoff
        p = n_pos / 400
        h = -(p * math.log(p) + (1 - p) * math.log(1 - p))
        assert abs(row["gain_nats"] - h) < 1e-4
        assert row["n_left"] == 365 and row["n_right"] == 35

    def test_stump_near_zero_gain_on_independent_fixture(self, spark):
        from speech_data_pipeline_spark.queries.registry import QUERIES

        row = QUERIES["ml_decision_stump"](
            spark, "/root/testdata/sf0.001"
        ).collect()[0]
        # synthetic returnflag is independent of shipdate: the best
        # split exists but its gain is noise-level
        assert 0.0 <= row["gain_nats"] < 0.01
        assert row["n_left"] > 0 and row["n_right"] > 0


class TestConformalInterval:
    def test_coverage_guarantee_on_fixture(self, spark):
        from speech_data_pipeline_spark.queries.registry import QUERIES

        row = QUERIES["ml_conformal_interval"](
            spark, "/root/testdata/sf0.001"
        ).collect()[0]
        # split-conformal finite-sample guarantee: coverage >= 1-alpha
        # minus sampling noise on the test fold
        assert row["coverage"] >= 0.85
        assert row["q_hat"] > 0
        assert row["n_cal"] > 100 and row["n_test"] > 100

    def test_matches_brute_split_conformal(self, spark):
        import math

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        row = QUERIES["ml_conformal_interval"](spark, sf).collect()[0]
        rows = load_table(spark, sf, "lineitem").collect()
        train = [(int(r["l_quantity"]),
                  math.floor(r["l_extendedprice"] * 100 + 0.5))
                 for r in rows if r["l_orderkey"] % 5 not in (0, 1)]
        n = len(train)
        sx = sum(x for x, _ in train)
        sy = sum(y for _, y in train)
        sxx = sum(x * x for x, _ in train)
        sxy = sum(x * y for x, y in train)
        # engines cast num/den to double BEFORE dividing (above 2^53
        # exact-int division differs by 1 ulp); mirror that fold, and
        # the floor(x*100+0.5) quantization, never banker's round()
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        icept = (float(sy) - slope * float(sx)) / float(n)
        cal = sorted(
            math.floor(abs(math.floor(r["l_extendedprice"] * 100 + 0.5)
                           - (slope * int(r["l_quantity"]) + icept)))
            for r in rows if r["l_orderkey"] % 5 == 0
        )
        k = math.ceil((len(cal) + 1) * 0.9)
        qhat = cal[k - 1]
        test = [
            math.floor(abs(math.floor(r["l_extendedprice"] * 100 + 0.5)
                           - (slope * int(r["l_quantity"]) + icept)))
            for r in rows if r["l_orderkey"] % 5 == 1
        ]
        cov = sum(1 for r in test if r <= qhat) / len(test)
        assert row["n_cal"] == len(cal)
        assert row["q_hat"] == qhat / 100.0
        assert row["coverage"] == math.floor(cov * 1e6) / 1e6
