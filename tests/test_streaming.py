"""Structured Streaming ingest tests: availableNow trigger over the
static test parquet, results compared to the equivalent batch query.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from speech_data_pipeline_spark.sources.catalog import load_table
from speech_data_pipeline_spark.streaming.ingest import (
    read_event_stream,
    streaming_sessionize,
    streaming_type_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "raw" else "complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture(scope="module")
def landing(spark):
    tmp = tempfile.mkdtemp()
    shutil.copy(f"{SF_DIR}/events.parquet", f"{tmp}/events.parquet")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_type_counts_match_batch(spark, landing):
    stream = streaming_type_counts(read_event_stream(spark, landing))
    got = run_stream(spark, stream, "type_counts")
    batch = (
        load_table(spark, landing, "events")
        .withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("ts_ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_sessionize_matches_batch_session_window(spark, landing):
    stream = streaming_sessionize(read_event_stream(spark, landing), gap="10 minutes")
    got = run_stream(spark, stream, "sessions")
    batch = (
        load_table(spark, landing, "events")
        .withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.session_window("ts_ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
    )
    got = got.withColumn("total_value", F.round("total_value", 6))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    assert got.count() > 0


def test_stream_capped_sessions_foreachbatch(spark, landing):
    import tempfile

    from speech_data_pipeline_spark.streaming.ingest import stream_capped_sessions

    out = tempfile.mkdtemp() + "/sessions"
    q = stream_capped_sessions(
        read_event_stream(spark, landing), out, tempfile.mkdtemp()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    # single availableNow batch over static data == batch kernel output
    from speech_data_pipeline_spark.operators.sessions import sessionize_capped

    iv = (
        load_table(spark, landing, "events")
        .selectExpr(
            "user_id",
            "ts div 1000 as start_us",
            "ts div 1000 + cast(floor(value * 60000000.0) as long) as end_us",
        )
    )
    want = sessionize_capped(iv, interval=600_000_000, max_duration=1_800_000_000)
    assert sorted(map(tuple, got.drop("batch_id").collect())) == sorted(
        map(tuple, want.collect())
    )


def test_streaming_stateful_sessions_cross_batch(spark):
    """applyInPandasWithState: per-user open-session state across
    micro-batches; every emitted session matches the batch fold, and
    trailing sessions flush via event-time timeout."""
    import os
    import time

    from speech_data_pipeline_spark.streaming.ingest import (
        read_event_stream,
        streaming_stateful_sessions,
    )

    import pandas as pd

    gap_us = 600_000_000
    ev = (
        load_table(spark, SF_DIR, "events")  # ts = epoch-nanos long
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts")
        .toPandas()
    )
    tmp = tempfile.mkdtemp()
    # three time-ordered files -> three micro-batches, watermark advances
    # between them so earlier users' trailing sessions time out.
    # Files are written with NTZ timestamps so read_event_stream's declared
    # schema matches the original landing format.
    old_ts_type = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        thirds = [ev.iloc[: len(ev) // 3], ev.iloc[len(ev) // 3 : 2 * len(ev) // 3],
                  ev.iloc[2 * len(ev) // 3 :]]
        for i, part in enumerate(thirds):
            part = part.assign(ts=pd.to_datetime(part["ts"]))
            spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
                f"{tmp}/stage{i}"
            )
            src = [
                f for f in os.listdir(f"{tmp}/stage{i}") if f.endswith(".parquet")
            ][0]
            os.rename(f"{tmp}/stage{i}/{src}", f"{tmp}/events_{i}.parquet")
            time.sleep(1.1)  # distinct mtimes keep file-source ordering
    finally:
        spark.conf.set("spark.sql.timestampType", old_ts_type)

    stream = streaming_stateful_sessions(
        read_event_stream(spark, tmp), gap_us=gap_us, watermark="0 seconds"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("maxFilesPerTrigger", "1")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("stateful_sessions").collect()
    assert len(got) > 0
    assert {r.closed_by for r in got} == {"event", "timeout"}

    # pure-python batch fold = expected full session list
    want = set()
    for uid, grp in ev.groupby("user_id"):
        sessions = []
        cur = None
        rows = sorted(
            (int(t) // 1000, float(v)) for t, v in zip(grp["ts"], grp["value"])
        )
        for ts_us, v in rows:
            if cur is None:
                cur = [ts_us, ts_us, 1, v]
            elif ts_us - cur[1] <= gap_us:
                cur[1] = max(cur[1], ts_us)
                cur[2] += 1
                cur[3] += v
            else:
                sessions.append(tuple(cur))
                cur = [ts_us, ts_us, 1, v]
        sessions.append(tuple(cur))
        for s, e, n, tv in sessions:
            want.add((int(uid), s, e, n, round(tv, 6)))

    got_keys = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events,
         round(r.total_value, 6))
        for r in got
    }
    # every emitted session is exactly a batch session (no partial or
    # duplicated emission across batch boundaries)
    assert got_keys <= want
    assert len(got_keys) == len(got)  # no dupes
    # the stream saw everything except sessions still open at shutdown
    assert len(want) - len(got_keys) <= ev["user_id"].nunique()


def test_streaming_asof_enrich_matches_batch_asof_join(spark):
    """applyInPandasWithState as-of enrichment across micro-batches:
    every emitted row equals the batch asof_join on the same data, no
    duplicates, and everything inside the final watermark is emitted
    (exactness, not best-effort carry-forward)."""
    import os
    import time

    import pandas as pd

    from speech_data_pipeline_spark.operators.intervals import asof_join
    from speech_data_pipeline_spark.streaming.ingest import (
        read_event_stream,
        streaming_asof_enrich,
    )

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts")
        .toPandas()
    )
    tmp = tempfile.mkdtemp()
    old_ts_type = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        thirds = [ev.iloc[: len(ev) // 3], ev.iloc[len(ev) // 3 : 2 * len(ev) // 3],
                  ev.iloc[2 * len(ev) // 3 :]]
        for i, part in enumerate(thirds):
            part = part.assign(ts=pd.to_datetime(part["ts"]))
            spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
                f"{tmp}/stage{i}"
            )
            src = [
                f for f in os.listdir(f"{tmp}/stage{i}") if f.endswith(".parquet")
            ][0]
            os.rename(f"{tmp}/stage{i}/{src}", f"{tmp}/events_{i}.parquet")
            time.sleep(1.1)
    finally:
        spark.conf.set("spark.sql.timestampType", old_ts_type)

    stream = streaming_asof_enrich(
        read_event_stream(spark, tmp), right_type="view", watermark="0 seconds"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("asof_enrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("maxFilesPerTrigger", "1")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("asof_enrich").collect()

    batch_ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value", F.expr("ts div 1000").alias("ts_us")
    )
    right = batch_ev.where(F.col("event_type") == "view").select(
        "user_id", "ts_us", "value"
    )
    want = {
        (r.user_id, r.event_id, r.ts_us, r.asof_value)
        for r in asof_join(
            batch_ev.select("event_id", "user_id", "ts_us"),
            right,
            key="user_id",
            left_ts="ts_us",
            right_ts="ts_us",
            payload_cols=("value",),
        ).collect()
    }
    got_keys = {(r.user_id, r.event_id, r.ts_us, r.asof_value) for r in got}
    assert got_keys <= want  # every emission equals the batch join row
    assert len(got_keys) == len(got)  # no duplicate emissions
    # everything whose event time the watermark passed must be out: the
    # final watermark is max(ts of first two files), so at minimum the
    # first two thirds are all emitted.
    assert len(got_keys) >= 2 * len(ev) // 3


def test_streaming_exact_dedup_matches_batch_distinct(spark, landing):
    """Duplicate rows in the landing feed collapse to the batch
    distinct-by-key result."""
    import os
    import shutil

    from speech_data_pipeline_spark.streaming.ingest import streaming_exact_dedup

    dup_dir = tempfile.mkdtemp()
    shutil.copy(f"{landing}/events.parquet", f"{dup_dir}/events_a.parquet")
    shutil.copy(f"{landing}/events.parquet", f"{dup_dir}/events_b.parquet")
    stream = streaming_exact_dedup(read_event_stream(spark, dup_dir))
    got = run_stream(spark, stream.select("event_id"), "raw")
    n_unique = load_table(spark, landing, "events").select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.distinct().count() == n_unique
    shutil.rmtree(dup_dir, ignore_errors=True)


def test_stream_bloom_dedup_matches_sequential_replay(spark):
    """Cross-batch Bloom dedup: kept set equals an exact sequential
    replay of the same seeded-md5 bitmap arithmetic (first batch wins,
    later re-sights dropped, O(m) carried state); every surviving key
    is unique."""
    import hashlib
    import os

    from speech_data_pipeline_spark.streaming.ingest import stream_bloom_dedup

    m, k = 1024, 3
    tmp = tempfile.mkdtemp()
    out = f"{tmp}/out"
    batches = [
        [(i, 1000 + i) for i in range(100)],          # new keys 0-99
        [(i, 2000 + i) for i in range(50, 150)],      # 50 dups, 50 new
        [(i, 3000 + i) for i in range(0, 200)],       # all prior + 50 new
    ]
    # drive the batches as three sequential availableNow passes over a
    # growing landing dir with ONE shared checkpoint (each pass sees
    # only the new file) and the carried bitmap dict — file-source
    # micro-batch grouping is not guaranteed per-file, so relying on
    # maxFilesPerTrigger makes batch boundaries nondeterministic
    landing = f"{tmp}/stream"
    os.makedirs(landing)
    carried: dict = {}
    for b, rows_ in enumerate(batches):
        spark.createDataFrame(
            [(kk, tt, f"p{kk}") for kk, tt in rows_],
            "event_id long, ts long, payload string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/land/b{b}")
        src = [
            f for f in os.listdir(f"{tmp}/land/b{b}") if f.endswith(".parquet")
        ][0]
        shutil.copy(f"{tmp}/land/b{b}/{src}", f"{landing}/{b:03d}.parquet")
        sdf = spark.readStream.schema(
            "event_id long, ts long, payload string"
        ).parquet(landing)
        q = stream_bloom_dedup(
            sdf, out, f"{tmp}/ck", key_col="event_id", m=m, k=k, state=carried
        )
        q.awaitTermination(180)

    got = sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    )
    assert len(got) == len(set(got))  # no key survives twice

    # exact sequential replay of the bitmap arithmetic
    def positions(key):
        return [
            int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:7], 16) % m
            for i in range(k)
        ]

    bits = 0
    expect = []
    for rows_ in batches:
        kept_now = []
        for key, _ts in rows_:  # keys unique within a batch already
            ps = positions(key)
            if not all((bits >> p) & 1 for p in ps):
                kept_now.append(key)
        for key in kept_now:
            for p in positions(key):
                bits |= 1 << p
        expect += kept_now
    assert got == sorted(expect)
    # and the dedup actually dropped the cross-batch duplicates
    assert len(got) < sum(len(b) for b in batches)
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_cms_counters_match_batch_sketch(spark):
    """Streaming CMS: counters accumulated across micro-batches equal
    the batch sketch computed over all rows at once — mergeable-sketch
    exactness (counters are pure sums), pinned against a pure-Python
    reference with the same seeded hashes."""
    import hashlib
    import os
    import re

    import pandas as pd

    from speech_data_pipeline_spark.streaming.ingest import (
        cms_lookup,
        stream_cms_counters,
    )

    d, w = 4, 256
    pdf = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")[
        ["doc_id", "text"]
    ]
    tmp = tempfile.mkdtemp()
    landing = f"{tmp}/land"
    os.makedirs(landing)
    carried: dict = {}
    halves = [pdf.iloc[: len(pdf) // 2], pdf.iloc[len(pdf) // 2 :]]
    for b, part in enumerate(halves):
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp}/b{b}"
        )
        src = [f for f in os.listdir(f"{tmp}/b{b}") if f.endswith(".parquet")][0]
        shutil.copy(f"{tmp}/b{b}/{src}", f"{landing}/{b:03d}.parquet")
        sdf = spark.readStream.schema("doc_id long, text string").parquet(landing)
        q = stream_cms_counters(sdf, f"{tmp}/ck", d=d, w=w, state=carried)
        q.awaitTermination(180)

    # pure-Python reference over the full table
    ref = [[0] * w for _ in range(d)]
    for text in pdf["text"]:
        for tok in re.findall("[a-z]+", text.lower()):
            for j in range(d):
                b = int(
                    hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:7], 16
                ) % w
                ref[j][b] += 1
    assert carried["counters"] == ref
    # point estimates: CMS overestimates, never under
    counts: dict = {}
    for text in pdf["text"]:
        for tok in re.findall("[a-z]+", text.lower()):
            counts[tok] = counts.get(tok, 0) + 1
    top = sorted(counts, key=lambda t: -counts[t])[:10]
    for tok in top:
        assert cms_lookup(carried, tok) >= counts[tok]
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_stream_join_matches_batch(spark, landing):
    """The watermarked stream-stream view⋈purchase interval join must
    equal the identical batch join over the same landing data (all
    events are inside the watermark under availableNow)."""
    import tempfile

    from speech_data_pipeline_spark.streaming.ingest import (
        streaming_view_purchase_join,
    )

    stream = streaming_view_purchase_join(read_event_stream(spark, landing))
    q = (
        stream.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ssj")

    ev = load_table(spark, landing, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("view_id"),
        F.col("ts_us").alias("view_us"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
        F.col("ts_us").alias("purchase_us"),
    )
    batch = v.join(
        p,
        (v["u"] == p["u"])
        & (p["purchase_us"] >= v["view_us"])
        & (p["purchase_us"] <= v["view_us"] + 30 * 60_000_000),
    ).select(
        v["u"].alias("user_id"),
        "view_id", "purchase_id", "view_us", "purchase_us", "amount",
    )
    key = lambda r: (r.user_id, r.view_id, r.purchase_id)
    assert sorted(map(key, got.collect())) == sorted(map(key, batch.collect()))
    assert got.count() > 0


def test_transform_with_state_running_totals(spark, landing):
    """transformWithStateInPandas running per-user totals equal the
    batch aggregate over the same landing data (last update per user
    wins under Update output mode). Skipped where the container lacks
    protobuf (the tWS python worker's wire dependency) — the
    applyInPandasWithState tests above cover the same semantics."""
    import tempfile

    pytest.importorskip("google.protobuf")

    from speech_data_pipeline_spark.streaming.ingest import (
        streaming_user_totals_tws,
    )

    stream = streaming_user_totals_tws(read_event_stream(spark, landing))
    q = (
        stream.writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user is the running total after all batches
    got = {
        r.user_id: (r.n_events, r.n_purchases, round(r.total_value, 6))
        for r in spark.table("tws_totals").collect()
    }
    batch = {
        r.user_id: (r.n, r.np, round(r.tv, 6))
        for r in load_table(spark, landing, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("np"),
            F.sum("value").alias("tv"),
        )
        .collect()
    }
    assert got == batch


def test_stream_minhash_neardup_matches_greedy_replay(spark):
    """Streaming LSH near-dup: across micro-batches arriving in doc_id
    order, the kept set equals a driver-side greedy replay (keep a doc
    iff no earlier KEPT doc shares a band), and every dup's anchor is
    the minimum such earlier kept doc."""
    import hashlib
    import os

    from speech_data_pipeline_spark.operators.dedup import (
        minhash_signatures,
    )
    from speech_data_pipeline_spark.streaming.ingest import (
        stream_minhash_neardup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays on and the crowd cheers loudly for more "
    )
    alt = (
        "completely different content about spark shuffles and "
        "parquet row groups living in object storage happily "
    )
    docs = [
        (0, base * 4),
        (1, base * 4 + "tiny suffix change"),   # near-dup of 0
        (2, alt * 4),
        (3, alt * 4 + "another small edit"),    # near-dup of 2
        (4, "unique short document about nothing in particular at all "
            "with plenty of extra words to shingle over properly"),
        (5, base * 4 + "yet another minor twist"),  # near-dup of 0/1
        (6, alt * 4),                                # exact dup of 2
        (7, "entirely fresh text regarding distributed joins and "
            "broadcast hash tables under adaptive execution plans"),
    ]
    k, bands, shingle_len = 16, 4, 5
    rows_per_band = k // bands

    tmp = tempfile.mkdtemp()
    landing = f"{tmp}/stream"
    os.makedirs(landing)
    batches = [docs[:4], docs[4:]]
    for b, rows_ in enumerate(batches):
        spark.createDataFrame(
            rows_, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/land/b{b}")
        src = [
            f for f in os.listdir(f"{tmp}/land/b{b}") if f.endswith(".parquet")
        ][0]
        shutil.copy(f"{tmp}/land/b{b}/{src}", f"{landing}/{b:03d}.parquet")
        sdf = spark.readStream.schema("doc_id long, text string").parquet(landing)
        q = stream_minhash_neardup(
            sdf,
            f"{tmp}/kept",
            f"{tmp}/dups",
            f"{tmp}/bands",
            f"{tmp}/ck",
            k=k,
            bands=bands,
            shingle_len=shingle_len,
        )
        q.awaitTermination(300)

    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{tmp}/kept").collect()
    )
    dups = {
        r["doc_id"]: r["anchor_id"]
        for r in spark.read.parquet(f"{tmp}/dups").collect()
    }

    # driver-side greedy replay from the SAME signatures
    sig_rows = minhash_signatures(
        spark.createDataFrame(docs, "doc_id long, text string"),
        id_col="doc_id",
        k=k,
        shingle_len=shingle_len,
    ).collect()
    band_sets = {}
    for r in sorted(sig_rows, key=lambda r: r["id"]):
        bset = set()
        for b in range(bands):
            part = "|".join(
                str(r["sig"][b * rows_per_band + i]) for i in range(rows_per_band)
            )
            bset.add((b, hashlib.md5(part.encode()).hexdigest()))
        band_sets[r["id"]] = bset
    kept_ref, dup_ref = [], {}
    for did in sorted(band_sets):
        anchors = [
            kid
            for kid in kept_ref
            if band_sets[kid] & band_sets[did]
        ]
        if anchors:
            dup_ref[did] = min(anchors)
        else:
            kept_ref.append(did)

    assert kept == sorted(kept_ref)
    assert dups == dup_ref
    # sanity: the fixture genuinely exercises both paths
    assert len(dup_ref) >= 3 and len(kept_ref) >= 3
    shutil.rmtree(tmp, ignore_errors=True)


def test_stateful_sessions_late_event_exactness(spark):
    """The review-found defect: a late (out-of-order) event inside the
    watermark horizon must merge into ITS OWN time-local session, not
    the currently-open one, and nothing may be emitted before the
    watermark makes it final. Fixture: events at t=0 and t=20min in
    batch 1, a LATE t=5min in batch 2 (gap=10min, watermark=30min),
    then t=2h to flush. Exact result: [0..5min] (2 events) and
    [20min] (1 event)."""
    import datetime
    import os
    import time

    from speech_data_pipeline_spark.streaming.ingest import (
        read_event_stream,
        streaming_stateful_sessions,
    )

    minute = 60_000_000  # us
    t0 = 1_700_000_000_000_000
    batches = [
        [(1, t0 + 0 * minute, 1, "click", 1.0, "{}"),
         (2, t0 + 20 * minute, 1, "click", 2.0, "{}")],
        [(3, t0 + 5 * minute, 1, "click", 4.0, "{}")],       # late arrival
        [(4, t0 + 120 * minute, 1, "click", 8.0, "{}")],     # flushes all
    ]
    tmp = tempfile.mkdtemp()
    old_ts_type = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        for i, rows in enumerate(batches):
            import pandas as pd

            pdf = pd.DataFrame(
                rows,
                columns=["event_id", "ts", "user_id", "event_type", "value",
                         "props"],
            )
            pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
            spark.createDataFrame(pdf).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/stage{i}")
            src = [
                f for f in os.listdir(f"{tmp}/stage{i}") if f.endswith(".parquet")
            ][0]
            os.rename(f"{tmp}/stage{i}/{src}", f"{tmp}/events_{i}.parquet")
            time.sleep(1.1)
    finally:
        spark.conf.set("spark.sql.timestampType", old_ts_type)

    stream = streaming_stateful_sessions(
        read_event_stream(spark, tmp),
        gap_us=10 * minute,
        watermark="30 minutes",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("maxFilesPerTrigger", "1")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.session_start_us, r.session_end_us, r.n_events, r.total_value)
        for r in spark.table("late_sessions").collect()
    )
    assert got == [
        (t0 + 0 * minute, t0 + 5 * minute, 2, 5.0),
        (t0 + 20 * minute, t0 + 20 * minute, 1, 2.0),
    ]
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_trending_topk_matches_replay(spark):
    """Decayed trending counters across micro-batches equal a
    sequential integer replay (halve-then-add per batch), and each
    batch's emitted top-k reflects the post-merge snapshot."""
    import os
    import time
    from collections import Counter

    from speech_data_pipeline_spark.streaming.ingest import stream_trending_topk

    batches = [
        ["a"] * 8 + ["b"] * 4 + ["c"] * 2,
        ["b"] * 10 + ["c"] * 1,
        ["c"] * 6,
    ]
    tmp = tempfile.mkdtemp()
    landing = f"{tmp}/stream"
    os.makedirs(landing)
    for i, keys in enumerate(batches):
        spark.createDataFrame(
            [(j, kk) for j, kk in enumerate(keys)], "event_id long, event_type string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/land/b{i}")
        src = [
            f for f in os.listdir(f"{tmp}/land/b{i}") if f.endswith(".parquet")
        ][0]
        shutil.copy(f"{tmp}/land/b{i}/{src}", f"{landing}/{i:03d}.parquet")
        sdf = spark.readStream.schema("event_id long, event_type string").parquet(
            landing
        )
        q = stream_trending_topk(
            sdf, f"{tmp}/out", f"{tmp}/state", f"{tmp}/ck", k=2
        )
        q.awaitTermination(180)
        time.sleep(0.2)

    got = {}
    for r in spark.read.parquet(f"{tmp}/out").collect():
        got.setdefault(r["batch_id"], []).append((r["cnt"], r["event_type"]))

    # sequential integer replay
    state: Counter = Counter()
    expect = {}
    for i, keys in enumerate(batches):
        decayed = Counter({kk: c >> 1 for kk, c in state.items() if c >> 1 > 0})
        for kk in keys:
            decayed[kk] += 1
        state = Counter({kk: c for kk, c in decayed.items() if c > 0})
        top = sorted(state.items(), key=lambda it: (-it[1], it[0]))[:2]
        expect[i] = [(c, kk) for kk, c in top]
    for b in expect:
        assert sorted(got[b]) == sorted(expect[b]), (b, got[b], expect[b])
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_trending_topk_restart_and_replay_exactly_once(spark):
    """Kill/restart recovery for the versioned side-table state
    (VERDICT r3 #6): (a) a restart from the checkpoint processes only
    NEW files and the final counters equal one sequential replay; (b)
    a re-executed batch (foreachBatch is at-least-once) is a NO-OP —
    state versions are keyed by batch_id and guarded, outputs are
    overwrite-partitioned — so state is exactly-once end to end."""
    import os
    import time
    from collections import Counter

    from speech_data_pipeline_spark.streaming.ingest import stream_trending_topk

    batches = [
        ["a"] * 8 + ["b"] * 4 + ["c"] * 2,
        ["b"] * 10 + ["c"] * 1,
        ["c"] * 6,
    ]
    tmp = tempfile.mkdtemp()
    landing = f"{tmp}/stream"
    os.makedirs(landing)

    def land(i, keys):
        spark.createDataFrame(
            [(j, kk) for j, kk in enumerate(keys)],
            "event_id long, event_type string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/land/b{i}")
        src = [
            f for f in os.listdir(f"{tmp}/land/b{i}") if f.endswith(".parquet")
        ][0]
        shutil.copy(f"{tmp}/land/b{i}/{src}", f"{landing}/{i:03d}.parquet")

    def run():
        sdf = spark.readStream.schema(
            "event_id long, event_type string"
        ).parquet(landing)
        q = stream_trending_topk(
            sdf, f"{tmp}/out", f"{tmp}/state", f"{tmp}/ck", k=2
        )
        q.awaitTermination(180)
        time.sleep(0.2)

    # first life of the query: batch 0 only, then the process "dies"
    land(0, batches[0])
    run()
    v_after_first = sorted(os.listdir(f"{tmp}/state"))
    assert v_after_first == ["v=0"]

    # two more lives of the query, each restarting from the same
    # checkpoint with one new file landed
    land(1, batches[1])
    run()
    land(2, batches[2])
    run()
    versions = sorted(os.listdir(f"{tmp}/state"))
    # exactly one snapshot per processed batch, no duplicates/gaps —
    # earlier files were NOT reprocessed after either restart
    assert versions == ["v=0", "v=1", "v=2"]

    # final counters equal one uninterrupted sequential replay
    state: Counter = Counter()
    for keys in batches:
        decayed = Counter(
            {kk: c >> 1 for kk, c in state.items() if c >> 1 > 0}
        )
        for kk in keys:
            decayed[kk] += 1
        state = Counter({kk: c for kk, c in decayed.items() if c > 0})
    got_state = {
        r["event_type"]: r["cnt"]
        for r in spark.read.parquet(f"{tmp}/state/v=2").collect()
    }
    assert got_state == dict(state)

    # (b) restart with NO new data: pure no-op (idempotent head replay
    # is allowed; nothing to process, nothing written)
    before = sorted(
        (r["batch_id"], r["event_type"], r["cnt"])
        for r in spark.read.parquet(f"{tmp}/out").collect()
    )
    run()
    assert sorted(os.listdir(f"{tmp}/state")) == versions
    assert before == sorted(
        (r["batch_id"], r["event_type"], r["cnt"])
        for r in spark.read.parquet(f"{tmp}/out").collect()
    )

    # (c) checkpoint reset while state survives: batch ids restart at
    # 0 below the committed head — the guard must FAIL SAFE (raise),
    # never silently skip (new data could hide under the reused id),
    # and must leave state untouched
    shutil.rmtree(f"{tmp}/ck")  # lose the checkpoint entirely
    sdf = spark.readStream.schema("event_id long, event_type string").parquet(
        landing
    )
    q = stream_trending_topk(
        sdf, f"{tmp}/out", f"{tmp}/state", f"{tmp}/ck", k=2
    )
    import pyspark.errors

    with pytest.raises(pyspark.errors.StreamingQueryException) as ei:
        q.awaitTermination(180)
        raise q.exception()
    assert "state/checkpoint mismatch" in str(ei.value)
    assert sorted(os.listdir(f"{tmp}/state")) == versions
    assert got_state == {
        r["event_type"]: r["cnt"]
        for r in spark.read.parquet(f"{tmp}/state/v=2").collect()
    }
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_bloom_dedup_recovery_and_fp_bound(spark):
    """Bloom-dedup restart recovery (VERDICT r3 #6): the carried bit
    array round-trips through DISK between query lives (the documented
    persist-beside-the-checkpoint contract), the kept set across the
    restart equals one sequential replay (no duplicate survives the
    crash), and the recovered filter's measured false-positive rate
    stays under the analytic (1-e^{-kn/m})^k bound with margin."""
    import json
    import math
    import os

    from speech_data_pipeline_spark.operators.sketches import bloom_probe
    from speech_data_pipeline_spark.streaming.ingest import stream_bloom_dedup

    m, k = 4096, 3
    tmp = tempfile.mkdtemp()
    out = f"{tmp}/out"
    landing = f"{tmp}/stream"
    os.makedirs(landing)
    state_file = f"{tmp}/bloom_state.json"

    def land(i, rows_):
        spark.createDataFrame(
            [(kk, tt, f"p{kk}") for kk, tt in rows_],
            "event_id long, ts long, payload string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/land/b{i}")
        src = [
            f for f in os.listdir(f"{tmp}/land/b{i}") if f.endswith(".parquet")
        ][0]
        shutil.copy(f"{tmp}/land/b{i}/{src}", f"{landing}/{i:03d}.parquet")

    def run(state):
        sdf = spark.readStream.schema(
            "event_id long, ts long, payload string"
        ).parquet(landing)
        q = stream_bloom_dedup(
            sdf, out, f"{tmp}/ck", key_col="event_id", m=m, k=k, state=state
        )
        q.awaitTermination(180)

    # life 1: 300 keys, then persist the bits beside the checkpoint
    land(0, [(i, 1000 + i) for i in range(300)])
    st: dict = {}
    run(st)
    with open(state_file, "w") as f:
        json.dump(st, f)

    # crash; life 2 reloads the bits from disk, sees 150 dups + 100 new
    st2 = json.load(open(state_file))
    land(1, [(i, 2000 + i) for i in range(150, 400)])
    run(st2)

    kept = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert len(kept) == len(set(kept))  # nothing survives twice
    # every re-sighted key (150..299) was dropped in life 2
    assert sum(1 for x in kept if 150 <= x < 300) == sum(
        1 for x in set(kept) if 150 <= x < 300
    )
    # recovered-filter FP rate on 2000 fresh keys vs analytic bound
    n = len(kept)  # distinct keys folded into the filter
    bound = (1.0 - math.exp(-k * n / m)) ** k
    bits_df = spark.createDataFrame([(st2["bits"],)], "bits array<long>")
    fresh = spark.range(10_000, 12_000).withColumnRenamed("id", "event_id")
    fp = (
        bloom_probe(fresh, bits_df, "event_id", m, k)
        .where(F.col("bloom_member"))
        .count()
    )
    assert fp / 2000 <= max(2.5 * bound, 0.02), (fp / 2000, bound)
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_ohlc_bars_match_batch_query(spark, landing):
    """The streaming OHLC bars equal the batch ts_ohlc_bars rows on
    the same landed data (bar index ↔ window start)."""
    from speech_data_pipeline_spark.queries.behavior_q import (
        _BAR_US,
        ts_ohlc_bars,
    )
    from speech_data_pipeline_spark.streaming.ingest import (
        streaming_ohlc_bars,
    )

    stream = streaming_ohlc_bars(read_event_stream(spark, landing))
    got = run_stream(spark, stream, "ohlc_bars")
    batch = ts_ohlc_bars(spark, landing).select(
        F.timestamp_micros(F.expr(f"bar * {_BAR_US}")).alias("window_start"),
        "event_type",
        "n_events",
        "open",
        "high",
        "low",
        "close",
        "sum_mv",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
    assert got.count() > 0


def test_streaming_cusum_matches_batch_kernel(spark):
    """Streaming CUSUM across micro-batches: with the watermark driven
    past every real event by sentinel files, the emitted alarms are
    ROW-EQUAL to the batch kernel on the same landed data."""
    import os
    import time

    import pandas as pd

    from speech_data_pipeline_spark.operators.recurrence import cusum_alarms
    from speech_data_pipeline_spark.streaming.ingest import (
        read_event_stream,
        streaming_cusum_alarms,
    )

    target, slack, h = 100_000, 20_000, 250_000
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts")
        .toPandas()
    )
    max_ts = int(ev["ts"].max())
    sentinels = [
        pd.DataFrame(
            {
                "event_id": [10**12 + i],
                "ts": [max_ts + (i + 1) * 3_600_000_000_000],
                "user_id": [999_999_999],
                "event_type": ["sentinel"],
                "value": [0.0],
                "props": ["{}"],
            }
        )
        for i in range(2)
    ]
    tmp = tempfile.mkdtemp()
    old_ts_type = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        parts = [
            ev.iloc[: len(ev) // 3],
            ev.iloc[len(ev) // 3 : 2 * len(ev) // 3],
            ev.iloc[2 * len(ev) // 3 :],
            *sentinels,
        ]
        for i, part in enumerate(parts):
            part = part.assign(ts=pd.to_datetime(part["ts"]))
            spark.createDataFrame(part).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/stage{i}")
            src = [
                f for f in os.listdir(f"{tmp}/stage{i}")
                if f.endswith(".parquet")
            ][0]
            os.rename(f"{tmp}/stage{i}/{src}", f"{tmp}/events_{i}.parquet")
            time.sleep(1.1)  # distinct mtimes keep file-source ordering
    finally:
        spark.conf.set("spark.sql.timestampType", old_ts_type)

    stream = streaming_cusum_alarms(
        read_event_stream(spark, tmp),
        target=target, slack=slack, threshold=h, watermark="0 seconds",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cusum_alarms")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("maxFilesPerTrigger", "1")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.user_id, r.event_id, r.t_us, r.side, r.stat, r.alarm_no)
        for r in spark.table("cusum_alarms").collect()
        if r.user_id != 999_999_999
    )
    assert len(got) > 0

    base = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "user_id", "event_id", "ts div 1000 as t_us",
            "cast(floor(value * 1000.0 + 0.5) as bigint) as mv",
        )
    )
    want = sorted(
        (r.user_id, r.event_id, r.t_us, r.side, r.stat, r.alarm_no)
        for r in cusum_alarms(
            base, "user_id", ["t_us", "event_id"], "mv",
            target=target, slack=slack, threshold=h,
        ).collect()
    )
    assert got == want


def test_streaming_drift_psi_matches_batch_replay(spark, landing):
    """Per-window PSI vs a python-precomputed reference: the streaming
    windowed counters + in-row PSI equal the batch replay (same bucket
    expression, same window math) on the same landed data."""
    import math

    from speech_data_pipeline_spark.streaming.ingest import (
        DRIFT_EDGES_CENTS,
        _drift_bucket,
        read_event_stream,
        streaming_drift_psi,
    )

    n_b = len(DRIFT_EDGES_CENTS) + 1
    # reference = the corpus's own overall distribution (ppm)
    ev = load_table(spark, landing, "events").where(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    bkts = (
        ev.select(_drift_bucket(cents).alias("bkt"))
        .groupBy("bkt")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in bkts)
    by = {r["bkt"]: r["count"] for r in bkts}
    ref_ppm = [by.get(i, 0) * 1_000_000 // total for i in range(n_b)]

    stream = streaming_drift_psi(
        read_event_stream(spark, landing), ref_ppm, window="10 days"
    )
    got = {
        (r["win_start"], r["win_end"]): (r["n"], r["psi_ppm"])
        for r in run_stream(spark, stream, "drift_psi").collect()
    }
    assert got

    # batch replay: identical expressions over static windows
    # (load_table's ts is epoch-nanos long; rebuild the event-time col)
    batch = (
        ev.withColumn(
            "ts_ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
        .select(
            F.window(F.col("ts_ts"), "10 days").alias("w"),
            _drift_bucket(cents).alias("bkt"),
        )
        .groupBy("w", "bkt")
        .count()
        .collect()
    )
    from collections import defaultdict

    wins = defaultdict(dict)
    for r in batch:
        wins[(r["w"]["start"], r["w"]["end"])][r["bkt"]] = r["count"]
    assert set(got) == set(wins)
    for w, cnts in wins.items():
        tot = sum(cnts.values())
        psi = 0.0
        for i in range(n_b):
            obs = max(cnts.get(i, 0) * 1_000_000 / tot, 5000.0)
            exp = float(max(ref_ppm[i], 5000))
            psi += (obs - exp) / 1e6 * (math.log(obs) - math.log(exp))
        assert got[w][0] == tot
        assert abs(got[w][1] - math.floor(psi * 1e6)) <= 1
    # sanity on the self-reference corpus: PSI is a large-sample
    # statistic (n≈60/window over 10 buckets wobbles to ~0.2 from
    # sampling alone), so only bound it away from "shifted
    # distribution" territory; exactness is pinned by the replay above
    big = [v for v in got.values() if v[0] >= 50]
    assert big
    assert all(abs(v[1]) < 450_000 for v in big)


def test_streaming_drift_psi_detects_planted_shift(spark):
    """A landing whose second window's values shift to a different
    bucket range must show near-zero PSI in window 1 and LARGE PSI in
    window 2 against a window-1 reference."""
    import os
    import tempfile

    import pandas as pd

    from speech_data_pipeline_spark.streaming.ingest import (
        DRIFT_EDGES_CENTS,
        read_event_stream,
        streaming_drift_psi,
    )

    n_b = len(DRIFT_EDGES_CENTS) + 1
    base_ns = 1_700_000_000_000_000_000
    day_ns = 86_400_000_000_000
    rows = []
    eid = 0
    # window 1 (days 0-9): values ~ uniform over 5..55 (buckets 0-5)
    for d in range(10):
        for i in range(40):
            v = 5.0 + (i % 50)
            rows.append((eid, base_ns + d * day_ns + i * 1000, 1,
                         "purchase", v, "{}"))
            eid += 1
    # window 2 (days 10-19): values ~ 85..95 (buckets 8-9) — shifted
    for d in range(10, 20):
        for i in range(40):
            v = 85.0 + (i % 10)
            rows.append((eid, base_ns + d * day_ns + i * 1000, 1,
                         "purchase", v, "{}"))
            eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"])
    tmp = tempfile.mkdtemp()
    df.to_parquet(os.path.join(tmp, "events.parquet"))

    # reference = window-1's own distribution
    from collections import Counter

    def bkt(v):
        c = round(v * 100)
        for i, e in enumerate(DRIFT_EDGES_CENTS):
            if c < e:
                return i
        return len(DRIFT_EDGES_CENTS)

    w1 = Counter(bkt(5.0 + (i % 50)) for i in range(40) for _ in range(10))
    tot = sum(w1.values())
    ref_ppm = [w1.get(i, 0) * 1_000_000 // tot for i in range(n_b)]

    stream = streaming_drift_psi(
        read_event_stream(spark, tmp), ref_ppm, window="10 days"
    )
    got = sorted(
        (r["win_start"], r["psi_ppm"])
        for r in run_stream(spark, stream, "drift_shift").collect()
    )
    # tumbling windows align to the epoch, so 20 days of data
    # straddle 3 windows: pure window-1 values, the mixed boundary,
    # then pure-shifted values
    assert len(got) == 3
    assert abs(got[0][1]) < 50_000  # self-reference: no drift
    assert got[1][1] > 500_000  # boundary window already drifting
    assert got[2][1] > 1_000_000  # pure planted shift: massive drift
