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
