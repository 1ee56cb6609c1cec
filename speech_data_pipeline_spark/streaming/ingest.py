"""Structured Streaming ingest (SURVEY.md §2.11 — an extension, not
reference parity: the reference is pure batch; its per-dataset loop
over a landing folder, scripts/data_pipeline.sh:18-70, maps to a file
stream source + checkpointed incremental processing).

- ``read_event_stream`` — file-source stream over a parquet landing
  dir (schema pinned; new files picked up per micro-batch; the
  streaming-native replacement for the J9 anti-join pattern, since the
  source checkpoint already dedups processed files).
- ``streaming_sessionize`` — ``session_window`` gap sessionization
  with a watermark: the streaming form of W1's *uncapped* variant
  (session_window cannot express the span cap — same limitation
  documented for batch in operators/sessions.py; the capped kernel
  stays a batch/foreachBatch concern).
- ``streaming_type_counts`` — windowed counts with late-data handling,
  the canonical watermark + tumbling-window aggregate.

Tests drive these with ``trigger(availableNow=True)`` against the
static parquet test data and compare to the equivalent batch query.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def event_schema(ts_type: T.DataType | None = None) -> T.StructType:
    """The landing-table schema, with ``ts`` typed per Spark build.

    parquet TIMESTAMP(NANOS) surfaces as TIMESTAMP_NTZ on Spark >= 4.1
    (the legacy ``nanosAsLong`` conf is ignored) but as a raw LONG on
    builds that still honor it — mirror catalog.load_table's version
    tolerance instead of pinning one.
    """
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type or T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: Spark >= 4.1 shape, kept for callers that pin schemas statically.
EVENT_SCHEMA = event_schema()


def read_event_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over a parquet landing directory.

    The ``ts`` physical type is probed with a one-off batch schema read
    (driver-side footer only) so the declared stream schema matches
    however THIS Spark build surfaces TIMESTAMP(NANOS) — NTZ timestamp
    or raw long (see :func:`event_schema`). Either way ``ts`` is
    normalized to epoch-nanos long (timezone-independent NTZ
    arithmetic; see sources/catalog.py EPOCH_NANOS_SQL), and an
    event-time ``ts_ts`` timestamp column is added for
    watermarking/windowing.
    """
    from speech_data_pipeline_spark.sources.catalog import epoch_nanos_expr

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed in some builds; the probe below covers it
    probe = (
        spark.read.option("pathGlobFilter", "events*.parquet")
        .parquet(landing_dir)
        .schema["ts"]
        .dataType
    )
    raw = (
        spark.readStream.schema(event_schema(probe))
        .option("pathGlobFilter", "events*.parquet")
        .parquet(landing_dir)
    )
    if isinstance(probe, (T.TimestampNTZType, T.TimestampType)):
        raw = raw.withColumn("ts", epoch_nanos_expr().cast("long"))
    return raw.withColumn(
        "ts_ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def streaming_sessionize(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Gap sessionization with ``session_window`` + watermark.

    Emits one row per closed session: (user_id, session start/end,
    n_events, total_value). Late events beyond the watermark are
    dropped — the streaming tradeoff the batch kernel does not make.
    """
    return (
        events.withWatermark("ts_ts", watermark)
        .groupBy(F.session_window("ts_ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_type_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark."""
    return (
        events.withWatermark("ts_ts", watermark)
        .groupBy(F.window("ts_ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def streaming_exact_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exact dedup on ingest — the streaming form of the batch
    ``dedup_exact`` operator, for at-least-once upstream feeds.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes it, so state is bounded by (event rate ×
    watermark), not by stream lifetime — the only dedup form that
    survives an unbounded 100 TB/day feed. Duplicates arriving later
    than the watermark are the documented tradeoff (batch dedup of the
    landed table catches them).
    """
    return events.withWatermark("ts_ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_capped_sessions(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    interval_us: int = 600_000_000,
    cap_us: int = 1_800_000_000,
):
    """Capped sessionization over a stream via ``foreachBatch``.

    ``session_window`` cannot express the span cap (non-associative),
    so each micro-batch runs the batch kernel and appends its sessions.
    Sessions are correct within a micro-batch; cross-batch stitching is
    a downstream merge (the same gap-merge kernel over the session
    table) — the standard pattern for non-windowable stateful logic.
    Returns the started StreamingQuery.
    """
    from speech_data_pipeline_spark.operators.sessions import sessionize_capped

    def process(batch_df: DataFrame, batch_id: int) -> None:
        iv = batch_df.select(
            "user_id",
            F.expr("ts div 1000").alias("start_us"),
            (
                F.expr("ts div 1000")
                + F.floor(F.col("value") * F.lit(60_000_000.0)).cast("long")
            ).alias("end_us"),
        )
        out = sessionize_capped(iv, interval=interval_us, max_duration=cap_us)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )

    return (
        events.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


ASOF_STATE_SCHEMA = (
    "pend_id array<long>, pend_ts array<long>, "
    "r_ts array<long>, r_val array<double>"
)
ASOF_OUT_SCHEMA = (
    "user_id long, event_id long, ts_us long, asof_value double"
)


def streaming_asof_enrich(
    events: DataFrame,
    right_type: str = "view",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming as-of enrichment via ``applyInPandasWithState`` — the
    streaming analogue of the batch :func:`~speech_data_pipeline_spark.
    operators.intervals.asof_join` (each event gets the value of the
    key's latest ``right_type`` event at-or-before its timestamp).

    EXACT against the batch join for all data inside the watermark, not
    a best-effort carry-forward: a left row is buffered in state until
    the watermark passes its event time — only then is it guaranteed
    that every right row at-or-before it has been seen — and emitted
    with a ``bisect`` lookup into the right-row history. Late left
    emission is the price of exactness (the same tradeoff
    session_window makes for session finality).

    Bounded state per key: pending lefts shrink as the watermark
    advances, and the right history is pruned to rows at-or-after the
    watermark plus the single latest row before it (the only one any
    future left can still match). An event-time timeout flushes pending
    lefts when the watermark advances without new rows for the key.
    """
    import bisect

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = ["user_id", "event_id", "ts_us", "asof_value"]

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        pend_id, pend_ts, r_ts, r_val = (
            ([*state.get[0]], [*state.get[1]], [*state.get[2]], [*state.get[3]])
            if state.exists
            else ([], [], [], [])
        )
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows["ts_us"] = rows["ts_ts"].astype("int64") // 1000
            rows = rows.sort_values("ts_us", kind="stable")
            for eid, ts_us, etype, val in zip(
                rows["event_id"], rows["ts_us"], rows["event_type"], rows["value"]
            ):
                pend_id.append(int(eid))
                pend_ts.append(int(ts_us))
                if etype == right_type:
                    # insort keeps the history sorted under cross-batch
                    # disorder inside the watermark
                    i = bisect.bisect_right(r_ts, int(ts_us))
                    r_ts.insert(i, int(ts_us))
                    r_val.insert(i, float(val))
        wm_us = state.getCurrentWatermarkMs() * 1000
        out, keep_id, keep_ts = [], [], []
        for eid, ts_us in zip(pend_id, pend_ts):
            if ts_us <= wm_us:
                i = bisect.bisect_right(r_ts, ts_us) - 1
                out.append(
                    (user_id, eid, ts_us, r_val[i] if i >= 0 else None)
                )
            else:
                keep_id.append(eid)
                keep_ts.append(ts_us)
        # prune right history: everything before the latest row <= wm is
        # unreachable by any future (post-watermark) left row
        cut = max(bisect.bisect_right(r_ts, wm_us) - 1, 0)
        state.update((keep_id, keep_ts, r_ts[cut:], r_val[cut:]))
        if keep_ts:
            state.setTimeoutTimestamp(
                max(min(keep_ts) // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(out, columns=cols)

    return (
        events.withWatermark("ts_ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            ASOF_OUT_SCHEMA,
            ASOF_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


SESSION_STATE_SCHEMA = (
    "start_us long, end_us long, n_events long, total_value double"
)
SESSION_OUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, total_value double, closed_by string"
)


def streaming_stateful_sessions(
    events: DataFrame,
    gap_us: int = 600_000_000,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState`` —
    the streaming-native form that is exact ACROSS micro-batches
    (unlike the per-batch ``foreachBatch`` variant above).

    Per-user state holds the one open session (start, end, count, sum).
    Each batch folds its rows in event-time order: within ``gap_us`` of
    the open end → extend; beyond → emit the closed session, open a new
    one. An event-time timeout at ``session_end + gap`` flushes the
    trailing session once the watermark passes it, so every session is
    eventually emitted exactly once (``closed_by`` records whether a
    successor event or the timeout closed it).

    Scale shape: state is O(1) per active user key, partitioned by the
    groupBy hash — the canonical Structured Streaming stateful-operator
    layout; nothing here is per-event state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_us // 1000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            s, e, n, tv = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, s, e, n, tv, "timeout")],
                columns=[
                    "user_id", "session_start_us", "session_end_us",
                    "n_events", "total_value", "closed_by",
                ],
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows["ts_us"] = rows["ts_ts"].astype("int64") // 1000
        rows = rows.sort_values("ts_us")
        cur = state.get if state.exists else None
        closed = []
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            if cur is None:
                cur = (int(ts_us), int(ts_us), 1, float(value))
            elif ts_us - cur[1] <= gap_us:
                cur = (
                    min(cur[0], int(ts_us)),
                    max(cur[1], int(ts_us)),
                    cur[2] + 1,
                    cur[3] + float(value),
                )
            else:
                closed.append(cur)
                cur = (int(ts_us), int(ts_us), 1, float(value))
        state.update(cur)
        # flush the open session once the watermark passes end + gap
        state.setTimeoutTimestamp(
            max(cur[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                [(user_id, s, e, n, tv, "event") for s, e, n, tv in closed],
                columns=[
                    "user_id", "session_start_us", "session_end_us",
                    "n_events", "total_value", "closed_by",
                ],
            )

    return (
        events.withWatermark("ts_ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_bloom_dedup(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    key_col: str = "event_id",
    m: int = 4096,
    k: int = 3,
    state: dict | None = None,
):
    """Approximate dedup on ingest with a cross-batch Bloom filter —
    the BOUNDED-MEMORY companion to :func:`streaming_exact_dedup`.

    Exact streaming dedup keeps one state row per key inside the
    watermark horizon; over an unbounded horizon ("drop anything ever
    seen") that state grows with stream lifetime. The Bloom form keeps
    O(m) bits forever: each micro-batch (1) exact-dedups within itself
    (bounded work), (2) probes the accumulated bitmap and drops
    probable re-sights, (3) folds its OWN kept keys into the bitmap
    with one `bloom_build` aggregate and ORs the 64-long words into
    the carried filter — per batch the driver exchanges exactly
    ceil(m/64) longs, never per-key state. The documented tradeoff is
    inverted vs exact dedup: duplicates are ALWAYS dropped (no
    watermark horizon), and the error is a false DROP of a new key at
    rate ≈ (1-e^{-kn/m})^k — acceptable for training-data ingest,
    where a lost sample is cheap and a kept duplicate costs quality.

    Deterministic end to end (seeded md5 positions, first-in-key by
    (ts, key) within a batch), so a sequential replay reproduces the
    kept set exactly — pinned in tests/test_streaming.py.

    ``state`` carries the bitmap (``{"bits": [ceil(m/64) longs]}``)
    across restarts: pass the same dict to a re-started query to
    resume the filter (in production the caller persists those few
    longs beside the checkpoint — they are NOT in Spark's checkpoint,
    which only tracks source progress).

    Returns the started query; kept rows land under ``out_path``.
    """
    from pyspark.sql import Window

    from speech_data_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    n_words = (m + 63) // 64
    if state is None:
        state = {}
    state.setdefault("bits", [0] * n_words)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # (1) exact within-batch dedup, deterministic first-per-key
        w = Window.partitionBy(key_col).orderBy("ts", key_col)
        firsts = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        # (2) probe the carried filter
        bits_df = spark.createDataFrame([(state["bits"],)], f"bits array<long>")
        kept = (
            bloom_probe(firsts, bits_df, key_col, m, k)
            .where(~F.col("bloom_member"))
            .drop("bloom_member")
        )
        kept.write.mode("append").parquet(out_path)
        # (3) fold this batch's kept keys into the filter: one O(m) row
        row = bloom_build(kept.select(key_col), key_col, m, k).collect()
        if row and row[0]["bits"] is not None:
            state["bits"] = [
                a | b for a, b in zip(state["bits"], row[0]["bits"])
            ]

    return (
        events.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_cms_counters(
    docs: DataFrame,
    checkpoint: str,
    text_col: str = "text",
    d: int = 4,
    w: int = 256,
    state: dict | None = None,
):
    """Streaming Count-Min sketch over an ingest stream's token
    frequencies — the mergeable-sketch pattern: CMS counters are pure
    sums, so per-batch counter tables merge by addition and the
    streamed sketch is EXACTLY the batch sketch over the same rows
    (no watermark, no approximation beyond CMS itself; pinned against
    the batch `sketch_count_min` construction in
    tests/test_streaming.py).

    Each micro-batch runs one grouped aggregate producing at most d·w
    rows, which fold into the caller-owned ``state["counters"]``
    (a d×w int list-of-lists) driver-side — O(d·w) carried state and
    per-batch traffic, independent of stream volume; same hashes as
    queries/curation_q.py (``hex7(md5('j:tok')) % w``).

    Returns the started query. ``cms_lookup(state, tok)`` estimates a
    token's count from the carried counters.
    """
    if state is None:
        state = {}
    state.setdefault("counters", [[0] * w for _ in range(d)])

    def process(batch_df: DataFrame, batch_id: int) -> None:
        toks = batch_df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit("([a-z]+)"), 1
                )
            ).alias("tok")
        )
        bucket = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("j").cast("string"), F.lit(":"), F.col("tok"))
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % w
        )
        rows = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                "tok", "c",
                F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
            )
            .withColumn("bucket", bucket)
            .groupBy("j", "bucket")
            .agg(F.sum("c").alias("n"))
            .collect()
        )
        for r in rows:
            state["counters"][r["j"]][r["bucket"]] += r["n"]

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cms_lookup(state: dict, tok: str) -> int:
    """Point estimate from carried CMS counters (min over rows)."""
    import hashlib

    counters = state["counters"]
    d = len(counters)
    w = len(counters[0])
    return min(
        counters[j][int(hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:7], 16) % w]
        for j in range(d)
    )


def streaming_view_purchase_join(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native watermarked stream-stream interval join: every purchase
    matched to the same user's views in the preceding ``horizon`` —
    the streaming form of the batch attribution join behind
    ``funnel_view_to_purchase``.

    Both sides carry their own watermark and the join condition bounds
    ``purchase_ts - view_ts`` to ``[0, horizon]``, which is what lets
    Spark PRUNE join state: a buffered view is droppable once the
    purchase-side watermark passes ``view_ts + horizon`` (state bound =
    rate × (watermark + horizon), independent of stream length). An
    unbounded-time condition would accumulate state forever — the
    stream-stream equivalent of the partition-less window rule.

    Inner join ⇒ append-mode output with no emission delay beyond
    arrival of both rows. Exactly equals the batch join over the same
    data for events inside the watermark (pinned in
    tests/test_streaming.py).
    """
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts_ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
            F.col("ts_ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = views.join(
        purchases,
        F.expr(
            f"""v_user_id = p_user_id
                AND purchase_ts >= view_ts
                AND purchase_ts <= view_ts + interval {horizon}"""
        ),
    )
    return joined.select(
        F.col("v_user_id").alias("user_id"),
        "view_id",
        "purchase_id",
        F.unix_micros("view_ts").alias("view_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "amount",
    )


def streaming_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` —
    the Spark 4.1 arbitrary-stateful API (typed state variables
    instead of one opaque tuple), kept alongside the
    ``applyInPandasWithState`` operators as the forward path: value
    state here, but the same processor can hold list/map state and
    event-time timers, which the old API packs into a single struct.

    Emits one updated ``(user_id, n_events, total_value,
    n_purchases)`` row per user per micro-batch containing that user
    — update semantics, state is one fixed-width row per user.

    ENVIRONMENT SEAM: the transformWithState Python worker speaks
    protobuf to the JVM state server; containers without
    ``google.protobuf`` cannot run it (raises ImportError here, at
    declaration, instead of crashing the stream driver mid-query).
    ``applyInPandasWithState`` operators above cover the same
    semantics wherever this seam is closed.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf "
            "(absent in this container); use the applyInPandasWithState "
            "operators instead"
        ) from e

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n_events long, total_value double, n_purchases long"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, npur = (
                self._state.get() if self._state.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                npur += int((pdf["event_type"] == "purchase").sum())
            self._state.update((n, total, npur))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "n_purchases": [npur],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        UserTotals(),
        "user_id long, n_events long, total_value double, n_purchases long",
        "Update",
        "ProcessingTime",
    )
