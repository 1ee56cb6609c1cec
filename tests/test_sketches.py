"""Approximate-aggregate surface (sketches): the reference computes
nothing approximate (SURVEY §2.5 note), but at 100 TB exact
distinct-counts and percentiles over high-cardinality columns are
shuffle-heavy; Spark's HLL++ and t-digest-style sketches are the
standard substitutes. These tests pin their error bounds against exact
answers on the test corpus, so the engine can advertise them with a
measured contract (sketches are engine-dependent, so no DuckDB
value-hash oracle — bounded-error assertions are the right check).
"""

from pyspark.sql import functions as F

from speech_data_pipeline_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select(F.countDistinct("event_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("event_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05  # 2% rsd, generous bound


def test_approx_count_distinct_grouped(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) / max(exact[k], 1) < 0.05


def test_percentile_approx_vs_exact(spark):
    cust = load_table(spark, SF_DIR, "customer")
    got = cust.select(
        F.percentile_approx("c_acctbal", [0.25, 0.5, 0.75], 10_000).alias("q")
    ).first()[0]
    exact = cust.select(
        F.expr("percentile(c_acctbal, array(0.25, 0.5, 0.75))").alias("q")
    ).first()[0]
    span = (
        cust.agg(F.max("c_acctbal") - F.min("c_acctbal")).first()[0]
    )
    for a, e in zip(got, exact):
        assert abs(a - e) / span < 0.01  # within 1% of the value range


def test_hll_sketch_merge_across_partitions(spark):
    """hll_sketch_agg / hll_union_agg: sketches built per source merge
    to the corpus-level distinct estimate — the two-level rollup shape
    that avoids re-scanning raw data at 100 TB."""
    docs = load_table(spark, SF_DIR, "documents")
    per_source = docs.groupBy("source").agg(
        F.expr("hll_sketch_agg(doc_id)").alias("sk")
    )
    merged = per_source.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("n")
    ).first()[0]
    exact = docs.select(F.countDistinct("doc_id")).first()[0]
    assert abs(merged - exact) / exact < 0.05


def test_portable_hll_merge_equals_rescan(spark):
    """Portable HLL (operators/sketches.py): merging per-type register
    tables (max per j) must produce EXACTLY the registers of a direct
    build over the whole corpus — sketch union is lossless."""
    from speech_data_pipeline_spark.operators.sketches import hll_registers

    ev = load_table(spark, SF_DIR, "events")
    per_type = hll_registers(ev, "user_id", ["event_type"])
    merged = {
        (r.j): r.rho
        for r in per_type.groupBy("j").agg(F.max("rho").alias("rho")).collect()
    }
    direct = {(r.j): r.rho for r in hll_registers(ev, "user_id").collect()}
    assert merged == direct


def test_portable_hll_estimate_accuracy(spark):
    """Raw HLL estimate with m=16 has theoretical rsd ~1.04/4 = 26%;
    assert the estimate lands within 2 rsd of exact on the fixture."""
    from speech_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    est = hll_estimate(hll_registers(ev, "user_id")).first().hll_distinct
    assert abs(est - exact) / exact < 0.52


def test_histogram_quantile_accuracy(spark):
    """Histogram quantile estimates land within one bin width of the
    exact percentiles (the estimator's structural error bound)."""
    from speech_data_pipeline_spark.queries.corpus_q import (
        _HIST_B,
        sketch_histogram_quantile,
    )

    o = load_table(spark, SF_DIR, "orders")
    mn, mx = o.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    width = (mx - mn) / _HIST_B
    exact = dict(
        zip(
            [0.25, 0.5, 0.75, 0.9],
            o.select(
                F.expr(
                    "percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9))"
                )
            ).first()[0],
        )
    )
    got = {r.q: r.est for r in sketch_histogram_quantile(spark, SF_DIR).collect()}
    for q, e in exact.items():
        assert abs(got[q] - e) <= width, (q, got[q], e, width)


def test_kmv_sketch_is_k_smallest_distinct_hashes(spark):
    """Sketch contents = exactly the k smallest distinct hashes."""
    from pyspark.sql import functions as F

    from speech_data_pipeline_spark.operators.sketches import (
        _hex15,
        kmv_sketches,
    )

    df = spark.createDataFrame(
        [(i % 40, "g%d" % (i % 2)) for i in range(400)], "k long, g string"
    )
    got = {
        r["g"]: r["sk"]
        for r in kmv_sketches(df, "k", "g", k=8).collect()
    }
    hashes = df.select(
        "g", _hex15(F.col("k").cast("string")).alias("h")
    ).distinct()
    for g in ("g0", "g1"):
        exp = sorted(
            r["h"] for r in hashes.where(F.col("g") == g).collect()
        )[:8]
        assert got[g] == exp


def test_theta_intersection_exact_when_k_covers_universe(spark):
    """With k ≥ |A∪B| the KMV estimates collapse to the exact sets:
    est_union = |A∪B|, matches = |A∩B|, est_intersection = |A∩B|."""
    from speech_data_pipeline_spark.queries.corpus_q import (
        sketch_theta_intersection,
        _KMV_K,
    )
    from speech_data_pipeline_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    users = {
        t: {
            r["user_id"]
            for r in ev.where(ev.event_type == t)
            .select("user_id")
            .distinct()
            .collect()
        }
        for t in ("click", "error", "purchase", "signup", "view")
    }
    # exactness needs every PAIR's union strictly under k (ku == k
    # flips to the (k-1)*2^60/theta estimator branch)
    types = sorted(users)
    assert all(
        len(users[a] | users[b]) < _KMV_K
        for i, a in enumerate(types)
        for b in types[i + 1 :]
    )
    out = sketch_theta_intersection(spark, sf).collect()
    assert len(out) == 10
    for r in out:
        a, b = users[r["type_a"]], users[r["type_b"]]
        assert r["ku"] == len(a | b)
        assert r["matches"] == len(a & b)
        assert r["est_union"] == float(len(a | b))
        assert abs(r["est_intersection"] - len(a & b)) < 1e-6
