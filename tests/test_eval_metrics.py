"""Evaluation metrics (eval_q): AUC / confusion-F1 / Cohen's κ pinned
against brute-force replays on crafted frames, plus sanity properties
of the registered queries on the fixture corpus."""

import itertools

from pyspark.sql import functions as F

from speech_data_pipeline_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _brute_auc(pairs):
    """P(score⁺ > score⁻) + ½P(=) over all pos×neg pairs."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    return wins / (len(pos) * len(neg))


def test_rank_sum_auc_identity_on_crafted_scores(spark):
    # Replicates the query's rank-sum pipeline on a crafted frame
    # (with heavy ties) and checks it equals the O(n²) definition.
    from pyspark.sql import Window

    pairs = [
        (10, 1), (10, 0), (10, 1), (7, 0), (7, 0), (12, 1), (3, 0),
        (3, 1), (3, 0), (15, 1), (1, 0), (12, 0), (12, 1), (10, 0),
    ]
    df = spark.createDataFrame(pairs, "s long, pos int")
    byscore = df.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_tot"), F.sum("pos").alias("n_pos")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byscore.withColumn(
        "min_rank", F.lit(1) + F.coalesce(F.sum("n_tot").over(w), F.lit(0))
    )
    tot = ranked.agg(
        F.sum("n_pos").alias("np"),
        (F.sum("n_tot") - F.sum("n_pos")).alias("nn"),
        F.sum(
            F.col("n_pos")
            * (F.lit(2) * F.col("min_rank") + F.col("n_tot") - F.lit(1))
        ).alias("two_sum"),
    ).collect()[0]
    auc = (tot["two_sum"] - tot["np"] * (tot["np"] + 1)) / (
        2.0 * tot["np"] * tot["nn"]
    )
    assert abs(auc - _brute_auc(pairs)) < 1e-12


def _brute_ap(pairs):
    """Block-tie average precision: distinct scores descending, each
    block contributes n_pos(block) * trailing-precision(block)."""
    from collections import Counter

    tot = Counter()
    pos = Counter()
    for s, y in pairs:
        tot[s] += 1
        pos[s] += y
    cp = ct = 0
    num = 0.0
    for s in sorted(tot, reverse=True):
        cp += pos[s]
        ct += tot[s]
        num += pos[s] * (cp / ct)
    return num / cp


def test_pr_auc_block_identity_on_crafted_scores(spark):
    # Replicates the query's block pipeline on a crafted tied frame and
    # checks it matches the brute definition within ppm quantization.
    from pyspark.sql import Window

    pairs = [
        (10, 1), (10, 0), (10, 1), (7, 0), (7, 0), (12, 1), (3, 0),
        (3, 1), (3, 0), (15, 1), (1, 0), (12, 0), (12, 1), (10, 0),
    ]
    df = spark.createDataFrame(pairs, "s long, pos int")
    byscore = df.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_tot"), F.sum("pos").alias("n_pos")
    )
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    terms = byscore.select(
        "n_pos",
        F.sum("n_pos").over(w).alias("cum_pos"),
        F.sum("n_tot").over(w).alias("cum_tot"),
    ).select(
        "n_pos", F.expr("(1000000L * cum_pos) div cum_tot").alias("ppm")
    )
    tot = terms.agg(
        F.sum("n_pos").alias("np"),
        F.sum(F.col("n_pos") * F.col("ppm")).alias("num"),
    ).collect()[0]
    ap = tot["num"] / (1e6 * tot["np"])
    assert abs(ap - _brute_ap(pairs)) < 1e-5


def test_pr_auc_bounds_on_fixture(spark):
    row = QUERIES["eval_pr_auc"](spark, SF).collect()[0]
    assert row["n_pos"] > 0
    assert 0.0 <= row["avg_precision"] <= 1.0


def test_auc_bounds_and_marginals_on_fixture(spark):
    row = QUERIES["eval_roc_auc"](spark, SF).collect()[0]
    assert row["n_pos"] > 0 and row["n_neg"] > 0
    assert 0.0 <= row["auc"] <= 1.0


def test_confusion_f1_consistency(spark):
    rows = QUERIES["eval_confusion_f1"](spark, SF).collect()
    langs = {r["lang"] for r in rows}
    assert langs == {"en", "de", "es", "fr", "zh"}
    for r in rows:
        assert 0 <= r["tp"] <= min(r["n_true"], max(r["n_pred"], r["tp"]))
        # harmonic identity: f1 between min and max of P/R
        if r["n_pred"] > 0 and r["tp"] > 0:
            p, rec = r["tp"] / r["n_pred"], r["tp"] / r["n_true"]
            assert min(p, rec) - 1e-6 <= r["f1"] <= max(p, rec) + 1e-6
    # true-class marginals must sum to the corpus size
    from speech_data_pipeline_spark.sources.catalog import load_table

    assert sum(r["n_true"] for r in rows) == load_table(
        spark, SF, "documents"
    ).count()


def test_kappa_matches_definition_on_fixture(spark):
    r = QUERIES["eval_cohens_kappa"](spark, SF).collect()[0]
    n, tp, tn = r["n"], r["both_pos"], r["both_neg"]
    assert -1.0 <= r["kappa"] <= 1.0
    # po from the same counts (trunc6 tolerance)
    assert abs(r["po"] - (tp + tn) / n) < 2e-6


def test_kappa_perfect_and_chance_extremes(spark):
    # κ formula cleared of floats: n·agree − Σmarg over n² − Σmarg.
    def kappa(tp, fp, fn, tn):
        n = tp + fp + fn + tn
        pe = (tp + fp) * (tp + fn) + (tn + fn) * (tn + fp)
        return (n * (tp + tn) - pe) / (n * n - pe)

    assert kappa(40, 0, 0, 60) == 1.0  # perfect agreement
    # independent raters: agreement exactly at chance level → κ = 0
    assert abs(kappa(9, 21, 21, 49)) < 1e-12
