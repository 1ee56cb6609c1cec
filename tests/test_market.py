"""Market-basket queries + decay score: semantic checks beyond the
oracle's value equality."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_copurchase_pairs_on_crafted_baskets(spark, tmp_path):
    """Hand-built baskets with known support/confidence/lift."""
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d)
    # baskets: {1,2,3}, {1,2}, {1,4}, {2,3}
    rows = []
    for o, parts in enumerate([(1, 2, 3), (1, 2), (1, 4), (2, 3)]):
        for p in parts:
            rows.append((o, p, 0, 0, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).write.parquet(f"{d}/lineitem.parquet")
    from speech_data_pipeline_spark.queries.market_q import (
        basket_copurchase_pairs,
    )

    got = {
        (r["pa"], r["pb"]): r for r in basket_copurchase_pairs(spark, d).collect()
    }
    # pairs with support>=2: (1,2) cnt=2, (2,3) cnt=2
    assert set(got) == {(1, 2), (2, 3)}
    r = got[(1, 2)]
    assert r["cnt"] == 2
    # c1=3 orders contain part 1, c2=3 contain part 2, n_orders=4
    assert r["conf_a_to_b"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["lift"] == pytest.approx(2 * 4 / (3 * 3), abs=1e-6)


def test_recs_topk_and_symmetry(spark):
    from speech_data_pipeline_spark.queries.market_q import (
        _REC_K,
        recs_item_cosine,
    )

    rows = recs_item_cosine(spark, SF).collect()
    assert rows
    per_item = {}
    scores = {}
    for r in rows:
        per_item.setdefault(r["item"], []).append(r)
        scores[(r["item"], r["rec"])] = r["score"]
        assert 0.0 < r["score"] <= 1.0
    for item, rs in per_item.items():
        assert len(rs) <= _REC_K
        ss = [x["score"] for x in sorted(rs, key=lambda x: (-x["score"], x["rec"]))]
        assert ss == sorted(ss, reverse=True)
    # cosine is symmetric: where both directions survived the top-k,
    # the scores agree
    for (i, j), s in scores.items():
        if (j, i) in scores:
            assert scores[(j, i)] == s


def test_engagement_decay_halving(spark, tmp_path):
    """An event one week older contributes exactly half (integer
    shift), regardless of partitioning."""
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d)
    week_us = 604_800_000_000
    base = 1_700_000_000_000_000  # epoch micros
    rows = [
        (0, base + 0 * week_us, 1, "click", 8.0, "{}"),
        (1, base + 1 * week_us, 1, "click", 8.0, "{}"),
        (2, base + 3 * week_us, 1, "click", 8.0, "{}"),  # newest => now
        (3, base + 2 * week_us, 2, "click", 100.0, "{}"),
    ]
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    import datetime

    def us2dt(us):
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)

    spark.createDataFrame(
        [(e, us2dt(t), u, ty, v, p) for e, t, u, ty, v, p in rows], schema
    ).write.parquet(f"{d}/events.parquet")
    from speech_data_pipeline_spark.queries.behavior_q import (
        engagement_decay_score,
    )

    got = {r["user_id"]: r for r in engagement_decay_score(spark, d).collect()}
    # user 1: ages 3w, 2w, 0w => 8/8 + 8/4 + 8/1 = 1 + 2 + 8 = 11
    assert got[1]["score"] == pytest.approx(11.0, abs=1e-9)
    assert got[1]["n_events"] == 3
    # user 2: age 1w => 100/2 = 50
    assert got[2]["score"] == pytest.approx(50.0, abs=1e-9)


def test_rfm_scores_and_segments(spark):
    from speech_data_pipeline_spark.queries.market_q import rfm_customer_segments

    rows = rfm_customer_segments(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4
        assert r["r_days"] >= 0 and r["n_orders"] >= 1 and r["monetary"] > 0
        if r["segment"] == "champion":
            assert r["r_score"] >= 3 and r["f_score"] >= 3 and r["m_score"] >= 3
    segs = {r["segment"] for r in rows}
    assert segs <= {"champion", "new", "at_risk", "hibernating"}
    assert len(segs) >= 2  # the fixture actually spreads


def test_pmi_collocations_exceed_independence(spark):
    from speech_data_pipeline_spark.queries.mining_q import (
        _PMI_MIN_PAIR,
        text_pmi_collocations,
    )

    rows = text_pmi_collocations(spark, SF).collect()
    assert 0 < len(rows) <= 20
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r["cxy"] >= _PMI_MIN_PAIR
    # the strongest collocations genuinely co-occur above independence
    assert pmis[0] > 0


def test_lead_time_percentiles_ordered(spark):
    from speech_data_pipeline_spark.queries.market_q import (
        supplier_lead_time_percentiles,
    )

    rows = supplier_lead_time_percentiles(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["med_days"] <= r["p90_days"] <= r["max_days"]
        assert r["n_shipments"] >= 1


class TestApriori:
    def test_crafted_triple_mining(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        # Baskets: {1,2,3} x3 (frequent triple), {1,2,4} once (pair
        # (1,4),(2,4) infrequent -> no triple), {1,2} once.
        baskets = [[1, 2, 3], [1, 2, 3], [1, 2, 3], [1, 2, 4], [1, 2]]
        rows = []
        for o, items in enumerate(baskets):
            for p in items:
                rows.append((o, p, 1.0, 1.0, 0.0, 0.0, "N", "O",
                             pd.Timestamp("2024-01-02")))
        df = pd.DataFrame(
            rows,
            columns=["l_orderkey", "l_partkey", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate"],
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "lineitem.parquet"))
            out = QUERIES["mine_itemsets_apriori"](spark, d).collect()
        got = {(r["p1"], r["p2"], r["p3"]): r["support"] for r in out}
        assert got == {(1, 2, 3): 3}

    def test_fixture_triples_satisfy_support(self, spark):
        from speech_data_pipeline_spark.queries.registry import QUERIES

        rows = QUERIES["mine_itemsets_apriori"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        for r in rows:
            assert r["support"] >= 2
            assert r["p1"] < r["p2"] < r["p3"]
