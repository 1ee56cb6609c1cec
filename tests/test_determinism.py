"""Registry-wide determinism fence: the value-sensitive queries —
iterative algorithms, seeded sampling, fixed-point trajectories,
hash-keyed shuffles — must return IDENTICAL rows under a perturbed
``spark.sql.shuffle.partitions``. This is the cheap local stand-in for
"different cluster layout / task retry / AQE re-plan": if a result
depends on partition count, it will drift on a real cluster and the
DuckDB oracle match is an accident of local[32].

Queries covered are the ones whose docstrings CLAIM layout-proof
arithmetic (quantized-grid sums, integer fixed-point, seeded md5);
plain relational aggregates are already order-proof by construction
and covered by the oracle gate.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

#: name -> claim being defended
PERTURB_QUERIES = [
    "ml_kmeans_assign",  # quantized Lloyd trajectory
    "embed_pca_power",  # fixed-point power iteration
    "dedup_semantic",  # kmeans + per-cell representative
    "sim_pq_topk",  # codebooks from quantized sums
    "sample_weighted_pps",  # integer systematic sampling
    "shuffle_shard_manifest",  # seeded-md5 permutation + checksums
    "dedup_resolve",  # connected-components fixed point
    "text_bpe_merges",  # greedy merge trajectory
    "graph_pagerank_activity",  # integer fixed-point ranks
    "dedup_substring_spans",  # md5 gram hashing + lag windows
    "mix_temperature_domains",  # bigint budget allocation
    "ts_gapfill_interpolate",  # grid + carry windows
    "ts_anomaly_zscore",  # integer (n, Σx, Σx²) window moments
    "select_dsir_importance",  # integer-grid log-ratio sums + top-k
    "stats_corr_matrix",  # DECIMAL(38,0) moment sums
    "ab_welch_ttest",  # same moment-sum machinery
    "stats_linreg",  # same moment-sum machinery
    "engagement_decay_score",  # integer-shift decay sums
    "sim_rrf_fusion",  # trunc6-quantized rank fusion
    "graph_bfs_hops",  # frontier fixed rounds
    "text_textrank_keywords",  # integer fixed-point ranks over word graph
    "rfm_customer_segments",  # exact-percentile thresholds on integer features
    "text_pmi_collocations",  # trunc6 ln over exact counts + tie-broken top-k
    "users_cumulative_distinct",  # two-level paged running sum
    "stats_spearman",  # doubled-integer midrank moment sums
    "stats_kendall_tau",  # integer grid suffix sums + tie corrections
    "text_heaps_law",  # integer-ppb OLS over the prefix buckets
    "stats_cramers_v",  # nano-quantized per-cell chi-square sum
    "graph_assortativity",  # integer edge-end degree moments
    "eval_ece",  # integer ppm bin gaps to one divide
    "eval_brier_score",  # integer ppm squared-error sum
    "stats_anova_f",  # sorted-fold cross-group term sum (the one
    # deliberate float accumulation — deterministic by ordered fold)
    "stats_mann_kendall",  # integer day-pair sign sums + tie terms
    "text_js_divergence",  # pico-quantized per-word JSD terms
    "graph_adamic_adar",  # pico-quantized wedge weights + tie-free top-k
    "eval_pass_at_k",  # pico-quantized fixed-k product per problem
    "search_query_likelihood",  # raw-double ln ranking, trunc6 output
    "sim_cosine_histogram",  # float decile bucket from exact integers
    "text_rake_keywords",  # ppm word scores (one float floor each) +
    # integer phrase sums + tie-free top-k
    "eval_corpus_bleu2",  # integer clipped-precision sums, one float
    # assembly
    "text_vocab_coverage",  # TakeOrdered(K) head with (cnt, w) total
    # order + integer coverage sums
    "dedup_source_matrix",  # production pair stream + grouped counts
    "stats_runs_test",  # doubled-median order statistic + integer runs
    "ml_logreg_gd",  # micro-integer GD weight trajectory (per-row
    # sigmoid floored to the grid before every cross-row sum)
]


@pytest.fixture(scope="module")
def spark():
    from speech_data_pipeline_spark.session import get_spark

    return get_spark("test-determinism")


def _rows(spark, name):
    import __spark_entry__ as ent

    df = ent.queries()[name](spark, SF_DIR)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", PERTURB_QUERIES)
def test_partition_count_invariance(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name} drifted under partition-count change"
