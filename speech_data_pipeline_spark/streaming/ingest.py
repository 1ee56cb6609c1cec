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
    try:
        probe = (
            spark.read.option("pathGlobFilter", "events*.parquet")
            .parquet(landing_dir)
            .schema["ts"]
            .dataType
        )
    except Exception:
        # empty landing dir (stream started before the first file
        # lands) — declare the current-build default and let the
        # stream wait for files like any file source
        probe = None
    raw = (
        spark.readStream.schema(event_schema(probe))
        .option("pathGlobFilter", "events*.parquet")
        .parquet(landing_dir)
    )
    if probe is None or isinstance(probe, (T.TimestampNTZType, T.TimestampType)):
        # probe=None declared the NTZ default, which also needs the
        # epoch-nanos normalization
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


SESSION_STATE_SCHEMA = "buf_ts array<long>, buf_val array<double>"
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
    exact ACROSS micro-batches, including late/out-of-order arrivals
    inside the watermark horizon.

    Exactness argument: per-user state buffers the (ts, value) events
    of every session not yet finalized; a session is emitted only once
    ``session_end + gap < watermark``. Spark drops input rows older
    than the watermark before they reach the operator, so any future
    event has ``ts ≥ watermark > end + gap`` — it can neither extend,
    bridge, nor precede a finalized session. Sessions followed by a
    later session in the buffer are ``closed_by='event'``; the trailing
    session flushes by event-time timeout (``closed_by='timeout'``)
    when the watermark passes ``end + gap``. (The previous open-session
    fold emitted eagerly and merged ANY late event into the open
    session regardless of gap — wrong on out-of-order input; this
    buffer-until-watermark form is the standard exact construction.)

    Scale shape: per-user state is bounded by the events inside the
    (watermark + gap) horizon — rate-bounded, never stream-lifetime —
    partitioned by the groupBy hash.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_us // 1000

    def sessions_of(ts_list, val_list):
        order = sorted(range(len(ts_list)), key=lambda i: (ts_list[i], val_list[i]))
        out = []  # (start, end, n, total, member_indices)
        cur = None
        for i in order:
            t = int(ts_list[i])
            if cur is None or t - cur[1] > gap_us:
                if cur is not None:
                    out.append(cur)
                cur = [t, t, 1, float(val_list[i]), [i]]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += float(val_list[i])
                cur[4].append(i)
        if cur is not None:
            out.append(cur)
        return out

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            buf_ts, buf_val = state.get
            buf_ts, buf_val = list(buf_ts), list(buf_val)
        else:
            buf_ts, buf_val = [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = (pdf["ts_ts"].astype("int64") // 1000).tolist()
                buf_ts.extend(int(t) for t in ts_us)
                buf_val.extend(float(v) for v in pdf["value"])
        wm_us = state.getCurrentWatermarkMs() * 1000

        sess = sessions_of(buf_ts, buf_val)
        emitted = []
        keep_idx = []
        for j, (s, e, n, tv, members) in enumerate(sess):
            if e + gap_us < wm_us:
                closed_by = "event" if j + 1 < len(sess) else "timeout"
                emitted.append((user_id, s, e, n, tv, closed_by))
            else:
                keep_idx.extend(members)

        if keep_idx:
            state.update(
                (
                    [buf_ts[i] for i in keep_idx],
                    [buf_val[i] for i in keep_idx],
                )
            )
            first_open_end = min(
                e for (s, e, n, tv, m) in sess if not e + gap_us < wm_us
            )
            state.setTimeoutTimestamp(
                max(
                    first_open_end // 1000 + gap_ms + 1,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        else:
            state.remove()

        if emitted:
            yield pd.DataFrame(
                emitted,
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


def stream_minhash_neardup(
    docs: DataFrame,
    out_path: str,
    dup_path: str,
    bands_path: str,
    checkpoint: str,
    k: int = 16,
    bands: int = 4,
    shingle_len: int = 5,
):
    """Streaming MinHash/LSH NEAR-duplicate dedup — the streaming form
    of the batch ``dedup_minhash_lsh`` chain, with its cross-batch
    state in a lakehouse side TABLE instead of operator memory.

    Per micro-batch (foreachBatch):

    1. signatures + band hashes for the batch's docs (the same
       ``minhash_signatures`` column algebra as batch — no UDFs);
    2. GREEDY within-batch resolution in doc_id order: a doc is kept
       iff no lower-id KEPT doc of the same batch shares a band
       (iterated band-join contraction, deterministic);
    3. cross-batch probe: surviving docs that share a band with the
       accumulated kept-band table are flagged as dups (anchor = the
       minimum earlier kept doc sharing a band); the rest are kept;
    4. the kept docs' bands are APPENDED to the band table.

    Scale shape: state is ``bands×n_kept`` rows of
    ``(band_idx, band_hash, id)`` in partitioned parquet — it grows
    with the KEPT corpus, not the stream, lives off-heap/off-driver,
    and both the probe join and the append are ordinary distributed
    ops (shuffle on the band key). Driver memory stays O(1); nothing
    is collected. The greedy keep-first-by-id semantics is pinned
    against a driver-side replay in tests/test_streaming.py.
    """
    from speech_data_pipeline_spark.operators.dedup import minhash_signatures

    def band_rows(sigs: DataFrame, rows_per_band: int) -> DataFrame:
        return sigs.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    *[
                                        F.col("sig")[b * rows_per_band + r].cast(
                                            "string"
                                        )
                                        for r in range(rows_per_band)
                                    ],
                                )
                            ).alias("band_hash"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band"),
        ).select("id", "band.band_idx", "band.band_hash")

    rows_per_band = k // bands

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = minhash_signatures(
            batch_df, id_col="doc_id", k=k, shingle_len=shingle_len
        ).persist()
        banded = band_rows(sigs, rows_per_band).persist()

        # (2) within-batch greedy keep-first in doc_id order. The
        # keep set is the unique fixed point of T(S) = {d : no d' in S
        # with d' < d sharing a band}. T is antitone, so iterating
        # from S0 = all docs alternates under- (odd) and over- (even)
        # approximations of the greedy set; when consecutive iterates
        # have equal cardinality the sandwich closes and both equal
        # the greedy set. Chains are short in practice (1-2 rounds).
        def t_step(s: DataFrame) -> DataFrame:
            a, b = banded.alias("a"), s.alias("b")
            drops = (
                a.join(
                    b,
                    (F.col("a.band_idx") == F.col("b.band_idx"))
                    & (F.col("a.band_hash") == F.col("b.band_hash"))
                    & (F.col("a.id") > F.col("b.id")),
                    "left_semi",
                )
                .select("a.id")
                .distinct()
            )
            return banded.join(drops, "id", "left_anti")

        cur = banded
        prev_over = None
        while True:
            under = t_step(cur).persist()
            over = t_step(under).persist()
            n_under = under.select("id").distinct().count()
            n_over = over.select("id").distinct().count()
            under.unpersist()
            if prev_over is not None:
                prev_over.unpersist()
            if n_under == n_over:
                kept_b = over
                break
            cur = over
            prev_over = over

        # (3) dup flagging with a SINGLE anchor rule: a doc is a dup
        # iff some lower-id doc sharing a band was kept — either in
        # the accumulated side table (prior batches) or in this
        # batch's greedy keep set — and its anchor is the MINIMUM such
        # id across both sources (so an in-batch dup that also matches
        # an older doc anchors to the oldest). Prior state is detected
        # by READING the table, not by driver-local os.path probes —
        # the side table may live on any Hadoop filesystem (S3/HDFS),
        # where os.listdir would silently disable cross-batch dedup.
        try:
            prior = spark.read.parquet(bands_path).select(
                "id", "band_idx", "band_hash"
            )
            anchor_src = prior.unionByName(
                kept_b.select("id", "band_idx", "band_hash")
            )
        except Exception:  # path does not exist yet: first batch
            anchor_src = kept_b.select("id", "band_idx", "band_hash")

        d_, s_ = banded.alias("d"), anchor_src.alias("s")
        anchors = (
            d_.join(
                s_,
                (F.col("d.band_idx") == F.col("s.band_idx"))
                & (F.col("d.band_hash") == F.col("s.band_hash"))
                & (F.col("s.id") < F.col("d.id")),
            )
            .groupBy(F.col("d.id").alias("id"))
            .agg(F.min("s.id").alias("anchor_id"))
        )
        # a doc with an anchor IS a dup (dropped docs always have one
        # by the greedy property; a kept_b doc's anchor can only come
        # from prior batches); docs without anchors are kept
        dup_ids = anchors
        kept_ids = (
            banded.select("id").distinct().join(anchors, "id", "left_anti")
        )

        kept_docs = batch_df.join(
            kept_ids.withColumnRenamed("id", "doc_id"), "doc_id", "left_semi"
        )
        dup_docs = batch_df.join(
            dup_ids.withColumnRenamed("id", "doc_id"), "doc_id"
        ).select("doc_id", "anchor_id")

        kept_docs.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_path)
        dup_docs.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(dup_path)
        # (4) fold the kept docs' bands into the side table
        kept_b.join(
            kept_ids, "id", "left_semi"
        ).write.mode("append").parquet(bands_path)
        sigs.unpersist()
        banded.unpersist()
        kept_b.unpersist()

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_trending_topk(
    events: DataFrame,
    out_path: str,
    state_path: str,
    checkpoint: str,
    key_col: str = "event_type",
    k: int = 5,
    decay_shift: int = 1,
):
    """Streaming trending top-k: exponentially decayed key counters
    with cross-batch state in a VERSIONED parquet side table — the
    "what's hot right now" operator.

    Per micro-batch (foreachBatch):

    1. REPLAY GUARD: snapshots are versioned by ``batch_id``
       (``state_path/v=<batch_id>``, committed = the parquet job's
       ``_SUCCESS`` marker — bare directory existence is NOT a commit,
       a crash mid-write leaves a partial dir). A re-announced HEAD
       batch (id == committed max) completed before a crash/restart —
       return without touching state or output; foreachBatch is only
       at-least-once, so exactly-once comes from this idempotence. A
       re-announced id BELOW the head means the checkpoint was reset
       while state survived (ids restarted) — RAISE instead of
       silently dropping whatever new data reuses the id; checkpoint
       and state_path live and die together, Spark's own
       stateful-operator rule;
    2. count the batch's keys (one grouped agg);
    3. read the LATEST existing snapshot (the previous batch — batch
       ids are monotone under a preserved checkpoint), decay it by an
       integer right-shift (``decay_shift=1`` halves per batch —
       bucketed exponential decay, exact under any fold order, same
       rationale as the batch engagement_decay_score), and outer-merge
       the batch counts;
    4. write the snapshot's top-``k`` (count desc, key) to
       ``out_path/batch=<batch_id>`` with OVERWRITE (re-executed
       batches rewrite the identical partition, never append dupes);
    5. write the merged counters as snapshot ``v=<batch_id>`` — the
       COMMIT POINT, written last: a crash anywhere earlier replays
       the whole batch from the same checkpointed file set; a crash
       after it makes the replay a no-op via the guard. Never
       overwrites the snapshot being read (lakehouse copy-on-write;
       compaction/vacuum of NON-HEAD versions is the table format's
       job — the head snapshot is the live state and must be retained,
       which is also all the replay/reset guard depends on: it
       compares the announced id against the committed head, never
       against old snapshots, so vacuuming history cannot disarm it).

    Scale shape: counters are key-cardinality rows in parquet —
    distributed state, never a driver dict; decay+merge is one outer
    join; zero-count keys are dropped so the table self-prunes.
    Deterministic end to end (integer counters, lexicographic
    tie-breaks) — pinned against a sequential replay AND across a
    kill/restart, an idempotent head-batch replay, and a fail-safe
    abort on checkpoint/state mismatch in tests/test_streaming.py.
    """

    def latest_version(spark: SparkSession) -> int:
        # only COMMITTED snapshots count — a crash mid-write leaves the
        # v=<n> directory without its _SUCCESS marker, and reading a
        # partial snapshot would corrupt every later merge
        try:
            import re

            vs = []
            jvm_path = spark._jvm.org.apache.hadoop.fs.Path(state_path)
            fs = jvm_path.getFileSystem(
                spark._jsc.hadoopConfiguration()
            )
            if not fs.exists(jvm_path):
                return -1
            for st in fs.listStatus(jvm_path):
                m = re.fullmatch(r"v=(\d+)", st.getPath().getName())
                if m and fs.exists(
                    spark._jvm.org.apache.hadoop.fs.Path(
                        f"{state_path}/v={m.group(1)}/_SUCCESS"
                    )
                ):
                    vs.append(int(m.group(1)))
            return max(vs) if vs else -1
        except Exception:
            return -1

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        latest = latest_version(spark)
        if batch_id < latest:
            # A batch id BELOW the committed head is not a normal crash
            # replay (that replays only the head batch) — it means the
            # CHECKPOINT was reset/relocated while state_path survived,
            # and batch ids restarted. A silent skip would drop any
            # genuinely new data hiding under the reused id; fail safe
            # instead. The check compares against the HEAD only — never
            # against the reused id's old snapshot — so it survives
            # compaction/vacuum of non-head versions (the head is the
            # live state and must always be retained). The operator
            # contract: checkpoint and state_path live and die TOGETHER
            # (exactly Spark's own stateful-operator rule).
            raise ValueError(
                f"trending-topk state/checkpoint mismatch: batch "
                f"{batch_id} re-announced while state is at "
                f"v={latest}. The checkpoint was reset without "
                f"resetting {state_path}; reconcile them (restore "
                f"the checkpoint, or archive the state dir) before "
                f"restarting."
            )
        if batch_id == latest:
            return  # crash replay of the head batch: already durable
        batch_cnt = batch_df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("bc")
        )
        v = latest
        if v >= 0:
            prior = spark.read.parquet(f"{state_path}/v={v}").select(
                key_col, F.shiftright("cnt", decay_shift).alias("pc")
            )
        else:
            prior = spark.createDataFrame(
                [], f"{key_col} string, pc long"
            )
        merged = (
            batch_cnt.join(prior, key_col, "full_outer")
            .select(
                key_col,
                (
                    F.coalesce(F.col("bc"), F.lit(0))
                    + F.coalesce(F.col("pc"), F.lit(0))
                ).alias("cnt"),
            )
            .where(F.col("cnt") > 0)
            .persist()
        )
        try:
            top = (
                merged.orderBy(F.col("cnt").desc(), key_col)
                .limit(k)
                .withColumn("batch_id", F.lit(batch_id))
            )
            top.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
            # commit point LAST: once v=<batch_id> lands, a replay of
            # this batch is a no-op
            merged.write.mode("overwrite").parquet(f"{state_path}/v={batch_id}")
        finally:
            merged.unpersist(blocking=False)

    return (
        events.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_ohlc_bars(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming OHLC time bars — the live form of the batch
    ``ts_ohlc_bars`` query: per (event_type, tumbling window) the
    opening/highest/lowest/closing value plus count and exact integer
    sum, emitted incrementally with late-data watermarking.

    Everything is a plain declarative aggregate, so Spark maintains
    O(1) state per open (type, window) group: open/close are
    ``min_by``/``max_by`` over the (ts, event_id) struct (lexicographic
    struct ordering = the batch query's deterministic tie-break — no
    rank window, which streaming couldn't run anyway), extremes are
    min/max, and values are quantized to integer milli-units at the
    boundary so merge order never changes a result. Identical rows to
    the batch query on the same landed data (pinned by test).
    """
    from speech_data_pipeline_spark.functions import trunc6

    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    k = F.struct(F.col("ts_ts").alias("t"), F.col("event_id").alias("e"))
    milli = lambda c: trunc6(c.cast("double") / F.lit(1000.0))  # noqa: E731
    return (
        events.withColumn("mv", mv)
        .withColumn("k", k)
        .withWatermark("ts_ts", watermark)
        .groupBy(F.window("ts_ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            milli(F.min_by("mv", "k")).alias("open"),
            milli(F.max("mv")).alias("high"),
            milli(F.min("mv")).alias("low"),
            milli(F.max_by("mv", "k")).alias("close"),
            F.sum("mv").alias("sum_mv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "open",
            "high",
            "low",
            "close",
            "sum_mv",
        )
    )


CUSUM_STATE_SCHEMA = (
    "s long, t long, n_hi long, n_lo long, "
    "buf_ts array<long>, buf_eid array<long>, buf_mv array<long>"
)
CUSUM_OUT_SCHEMA = (
    "user_id long, event_id long, t_us long, side string, "
    "stat long, alarm_no long"
)


def streaming_cusum_alarms(
    events: DataFrame,
    target: int = 50_000,
    slack: int = 25_000,
    threshold: int = 200_000,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming two-sided CUSUM — the live form of the batch
    ``operators/recurrence.py cusum_alarms`` kernel, exact across
    micro-batches including out-of-order arrivals inside the watermark
    horizon (the buffer-until-watermark construction of
    :func:`streaming_stateful_sessions`).

    Exactness argument: CUSUM is order-dependent, so an event may only
    enter the recursion once NO future event can sort before it.
    Future events have ``ts ≥ watermark``; buffered events with
    ``ts < watermark`` are therefore order-final — they are sorted by
    (ts, event_id), folded through the integer recursion from the
    carried (s, t, alarm counters) state, and their alarms emitted
    exactly once. The suffix at/above the watermark stays buffered.
    All state is BIGINT — identical rows to the batch kernel on the
    same landed data (pinned by test).

    Scale shape: per-user carried state is two counters + the events
    inside the watermark horizon (rate-bounded, never stream-lifetime),
    partitioned by the groupBy hash.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            s, t, n_hi, n_lo, buf_ts, buf_eid, buf_mv = state.get
            buf_ts, buf_eid, buf_mv = list(buf_ts), list(buf_eid), list(buf_mv)
        else:
            s = t = n_hi = n_lo = 0
            buf_ts, buf_eid, buf_mv = [], [], []
        if not state.hasTimedOut:
            import math

            for pdf in pdfs:
                ts_us = (pdf["ts_ts"].astype("int64") // 1000).tolist()
                # same IEEE quantization as the batch scan:
                # floor(value * 1000.0 + 0.5)
                mv = [
                    int(math.floor(float(v) * 1000.0 + 0.5))
                    for v in pdf["value"]
                ]
                buf_ts.extend(int(x) for x in ts_us)
                buf_eid.extend(int(x) for x in pdf["event_id"])
                buf_mv.extend(mv)
        wm_us = state.getCurrentWatermarkMs() * 1000

        order = sorted(range(len(buf_ts)), key=lambda i: (buf_ts[i], buf_eid[i]))
        emitted = []
        keep = []
        for i in order:
            if buf_ts[i] >= wm_us:
                keep.append(i)
                continue
            x = buf_mv[i]
            s = max(0, s + (x - target - slack))
            t = max(0, t + (target - x - slack))
            if s > threshold:
                n_hi += 1
                emitted.append(
                    (user_id, buf_eid[i], buf_ts[i], "high", s, n_hi)
                )
                s = 0
            if t > threshold:
                n_lo += 1
                emitted.append(
                    (user_id, buf_eid[i], buf_ts[i], "low", t, n_lo)
                )
                t = 0

        if keep or s or t or n_hi or n_lo:
            state.update(
                (
                    s, t, n_hi, n_lo,
                    [buf_ts[i] for i in keep],
                    [buf_eid[i] for i in keep],
                    [buf_mv[i] for i in keep],
                )
            )
            if keep:
                # wake when the watermark passes the earliest buffered
                # event so it finalizes even with no further input
                state.setTimeoutTimestamp(
                    max(
                        min(buf_ts[i] for i in keep) // 1000 + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        else:
            state.remove()

        if emitted:
            yield pd.DataFrame(
                emitted,
                columns=[
                    "user_id", "event_id", "t_us", "side", "stat", "alarm_no",
                ],
            )

    return (
        events.withWatermark("ts_ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            CUSUM_OUT_SCHEMA,
            CUSUM_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


#: Fixed value-histogram bucket edges (cents) for the drift monitor —
#: deciles of the reference fixture, Python-side constants so the
#: streaming and batch forms share one definition.
DRIFT_EDGES_CENTS = (1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000, 9000)


def _drift_bucket(col):
    """Bucket index 0..len(edges) for a cents column (shared by the
    streaming query and its batch-replay test)."""
    b = F.lit(len(DRIFT_EDGES_CENTS))
    for i in range(len(DRIFT_EDGES_CENTS) - 1, -1, -1):
        b = F.when(col < DRIFT_EDGES_CENTS[i], i).otherwise(b)
    return b


def streaming_drift_psi(
    events: DataFrame,
    ref_ppm: list[int],
    window: str = "6 hours",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming distribution-drift monitor: Population Stability
    Index of the purchase-value histogram per event-time tumbling
    window vs a REFERENCE distribution (``ref_ppm``: per-bucket
    expected mass in ppm, Python-precomputed from the training
    corpus) — the live companion of the batch ``drift_psi_value``.

    Engine shape: ONE watermarked stateful aggregation — the
    ``len(ref_ppm)`` bucket counters are conditional sums inside a
    single groupBy(window), so no second stateful operator is needed;
    PSI assembles IN-ROW from the counters on each emitted window
    (0.5% ppm floors on both sides avoid log(0), the standard PSI
    convention). Exact vs the batch replay on the same landed data
    (pinned by test).
    """
    n_b = len(DRIFT_EDGES_CENTS) + 1
    assert len(ref_ppm) == n_b
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    src = events.where(F.col("event_type") == "purchase").select(
        F.col("ts_ts").alias("ts"), _drift_bucket(cents).alias("bkt")
    )
    counters = [
        F.sum(F.when(F.col("bkt") == i, 1).otherwise(0)).alias(f"c{i}")
        for i in range(n_b)
    ]
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(*counters)
    )
    tot = sum(F.col(f"c{i}") for i in range(n_b))
    floor_ppm = F.lit(5000)  # 0.5% mass floor, both sides

    def term(i: int):
        obs_ppm = F.greatest(
            (F.col(f"c{i}") * F.lit(1_000_000)) / tot, floor_ppm
        )
        exp_ppm = F.greatest(F.lit(ref_ppm[i]), floor_ppm).cast("double")
        d = (obs_ppm - exp_ppm) / F.lit(1e6)
        return d * (F.log(obs_ppm.cast("double")) - F.log(exp_ppm))

    psi = sum(term(i) for i in range(n_b))
    return agg.select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        tot.cast("long").alias("n"),
        F.floor(psi * F.lit(1e6)).cast("long").alias("psi_ppm"),
    )
