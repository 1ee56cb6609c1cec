"""Privacy queries (privacy_q) and the mutual-kNN graph: semantic
properties beyond oracle value equality."""

import math

from pyspark.sql import functions as F

from speech_data_pipeline_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_k_anonymity_reports_only_small_groups(spark):
    rows = QUERIES["privacy_k_anonymity"](spark, SF).collect()
    assert all(0 < r["n"] < 5 for r in rows)
    # the audit must be consistent with a direct regroup
    from speech_data_pipeline_spark.sources.catalog import load_table

    c = load_table(spark, SF, "customer")
    g = (
        c.select(
            "c_mktsegment",
            "c_nationkey",
            F.expr(
                "(cast(floor(c_acctbal * 100.0 + 0.5) as bigint)"
                " - -100000) div 200000"
            ).alias("bal_band"),
        )
        .groupBy("c_mktsegment", "c_nationkey", "bal_band")
        .count()
    )
    n_small = g.where(F.col("count") < 5).count()
    assert len(rows) == n_small


def test_dp_noise_is_laplace_inverse_cdf(spark):
    """Replay the hash → uniform → Laplace transform in Python."""
    import hashlib

    rows = QUERIES["privacy_dp_counts"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        h = int(hashlib.md5(r["event_type"].encode()).hexdigest()[:15], 16)
        u = ((h % (1 << 20)) + 0.5) / (1 << 20)
        noise = -1.0 * math.copysign(1.0, u - 0.5) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        ) if u != 0.5 else 0.0
        want = r["n"] + noise
        assert abs(r["noisy_count"] - want) < 2e-6
        # Laplace(b=1) noise is almost surely small at these u grids
        assert abs(r["noisy_count"] - r["n"]) < 15.0


def test_mutual_knn_edges_are_mutual_and_unique(spark):
    from speech_data_pipeline_spark.operators.similarity import knn_in_buckets
    from speech_data_pipeline_spark.sources.catalog import load_table

    e = load_table(spark, SF, "embeddings")
    knn = knn_in_buckets(e, k=5, n_planes=6, dim=64)
    lists = {}
    for r in knn.collect():
        lists.setdefault(r["src"], set()).add(r["dst"])
    edges = [
        (r["id_a"], r["id_b"])
        for r in QUERIES["embed_mutual_knn"](spark, SF).collect()
    ]
    assert len(edges) == len(set(edges))
    for a, b in edges:
        assert a < b
        assert b in lists[a] and a in lists[b]
    # and no mutual pair was missed
    want = {
        (a, b)
        for a, nb in lists.items()
        for b in nb
        if a < b and a in lists.get(b, set())
    }
    assert set(edges) == want


def test_knn_lists_respect_k_and_exclude_self(spark):
    from speech_data_pipeline_spark.operators.similarity import knn_in_buckets
    from speech_data_pipeline_spark.sources.catalog import load_table

    e = load_table(spark, SF, "embeddings")
    knn = knn_in_buckets(e, k=3, n_planes=6, dim=64)
    per_src = knn.groupBy("src").count().collect()
    assert all(r["count"] <= 3 for r in per_src)
    assert knn.where(F.col("src") == F.col("dst")).count() == 0


class TestLDiversity:
    def test_entropy_identity_on_fixture(self, spark):
        # entropy must equal the direct -sum(p ln p) within the nano
        # quantization error of the cell count terms.
        import math

        from collections import Counter

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        rows = QUERIES["privacy_l_diversity"](spark, sf).collect()
        o = load_table(spark, sf, "orders")
        c = load_table(spark, sf, "customer")
        j = (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .select("c_mktsegment", "c_nationkey", "o_orderpriority")
            .collect()
        )
        cells = Counter(
            (r["c_mktsegment"], r["c_nationkey"], r["o_orderpriority"])
            for r in j
        )
        for r in rows:
            cs = [
                v
                for (seg, nat, _), v in cells.items()
                if seg == r["c_mktsegment"] and nat == r["c_nationkey"]
            ]
            n = sum(cs)
            want = -sum((x / n) * math.log(x / n) for x in cs)
            assert abs(r["entropy"] - want) < 1e-4
            assert r["distinct_l"] == len(cs)
            assert r["ok_l"] == (1 if len(cs) >= 3 else 0)
