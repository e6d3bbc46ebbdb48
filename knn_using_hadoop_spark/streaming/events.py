"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY.md §2.10) — this is
engine completeness for the driver's ``events`` stream table:
tumbling-window counts with a watermark for late data. The batch twin
(``contract.q_events_windowed_agg``) is the oracle-checked version;
the streaming query here produces the same aggregates incrementally
and is exercised in tests with a file source + memory sink +
``processAllAvailable`` (the documented pattern for deterministic
local verification of streaming graphs).

Scale notes: in production the source is Kafka/queue; the watermark
bounds state (windows older than watermark are finalized + evicted),
and the shuffle is keyed on (window, event_type) — a bounded-
cardinality key space, so state size is O(windows x types), not
O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # ts physical encoding varies by generator version: parquet
        # TIMESTAMP(NANOS) reads as int64 under nanosAsLong, plain
        # micros (isAdjustedToUTC=false) reads as TIMESTAMP_NTZ.
        # _read_events_stream derives the real schema from the footer
        # and normalizes; this struct documents the logical shape.
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# static event_type -> category lookup for stream-static enrichment
EVENT_CATEGORIES = (
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "conversion"),
    ("signup", "conversion"),
    ("error", "ops"),
)


def _read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream with ts normalized to timestamp.

    File-source streams take directories; a single-file path is split
    into (parent, pathGlobFilter). Streaming readers require an
    explicit schema, so the footer schema is probed with a metadata-
    only batch read (no data scan) — hardcoding it would silently
    misread when the generator's timestamp encoding changes (it has:
    TIMESTAMP(NANOS) -> int64, then plain micros -> TIMESTAMP_NTZ).
    """
    from knn_using_hadoop_spark.sources.tables import ensure_engine_confs

    ensure_engine_confs(spark)
    physical = spark.read.parquet(path).schema
    reader = spark.readStream.schema(physical).format("parquet")
    if path.endswith(".parquet"):
        import os

        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.load(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):  # nanos-as-long
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def streaming_event_counts(
    spark: SparkSession,
    path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream(parquet) -> watermark -> tumbling-window agg.

    Returns the unstarted streaming DataFrame; callers pick the sink.
    Output: (window_start, event_type, n_events, total_value).
    """
    events = _read_events_stream(spark, path)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_sessionize(
    spark: SparkSession,
    path: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) over the event stream.

    Native ``session_window`` — state is merged per (user, session)
    and evicted past the watermark. Batch twin: the contract's
    ``sessionization`` query (lag + cumsum), which produces the same
    (user_id, session_start, n_events) partitioning of events.
    """
    events = _read_events_stream(spark, path)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


def streaming_dedup(
    spark: SparkSession,
    path: str,
    *,
    key: str = "event_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins.

    ``dropDuplicatesWithinWatermark`` — the streaming twin of
    ``operators.dedup.dedup_exact``: dedup state for a key is held
    only until the watermark passes its event time, so state is
    bounded by (arrival-skew window x key rate) instead of growing
    with the whole stream — the required shape for an always-on
    ingestion pipeline that must suppress redelivered events.
    """
    events = _read_events_stream(spark, path)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def streaming_user_totals_stateful(
    spark: SparkSession, path: str
) -> DataFrame:
    """Custom stateful operator: running per-user event totals.

    ``applyInPandasWithState`` — the escape hatch for stateful logic
    Spark's built-in aggregates can't express (here a simple running
    (count, sum) so the state protocol itself is testable against the
    batch aggregate). State is one row per user_id; per micro-batch
    each updated user emits its new running totals ('update' mode).
    At scale, state lives in the state store keyed by user_id — add a
    timeout (ProcessingTimeTimeout) to evict idle users.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = _read_events_stream(spark, path)

    def update_totals(key, batches, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_category_counts(
    spark: SparkSession,
    path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment join + windowed agg per category.

    The canonical ingestion pattern the module lacked: a streaming
    fact joined to a STATIC dimension (event_type -> category) before
    aggregation. Spark plans the static side as a broadcast against
    every micro-batch, so enrichment adds no shuffle and no state;
    only the downstream windowed agg keeps (bounded) state. Batch
    twin: ``contract.q_events_category_counts``.
    """
    events = _read_events_stream(spark, path)
    cats = spark.createDataFrame(
        list(EVENT_CATEGORIES), "event_type string, category string"
    )
    return (
        events.join(F.broadcast(cats), "event_type")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "category")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "category",
            "n_events",
            "total_value",
        )
    )


def streaming_attribution_join(
    spark: SparkSession,
    path: str,
    *,
    effect_type: str = "purchase",
    cause_type: str = "click",
    window_minutes: int = 10,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join (click→purchase
    attribution).

    The hardest streaming join shape: both sides are unbounded, so
    Spark must buffer rows in the state store until the time-range
    condition plus watermarks prove no future match can arrive. The
    interval predicate (cause_ts in (effect_ts − W, effect_ts]) gives
    the planner the bound it needs: a cause row is evictable once the
    effect-side watermark passes cause_ts + W, an effect row once the
    cause-side watermark passes effect_ts — state is O(rate × (W +
    watermark)), never O(stream). Batch twin (the oracle-checked
    semantics): ``operators/analytics.py::attribution_join`` — same
    predicate, same output columns, verified equal in
    tests/test_streaming.py.
    """
    causes = (
        _read_events_stream(spark, path)
        .filter(F.col("event_type") == cause_type)
        .select(
            F.col("event_id").alias("cause_id"),
            F.col("user_id").alias("cause_user"),
            F.col("ts").alias("cause_ts"),
        )
        .withWatermark("cause_ts", watermark)
    )
    effects = (
        _read_events_stream(spark, path)
        .filter(F.col("event_type") == effect_type)
        .select(
            F.col("event_id").alias("effect_id"),
            "user_id",
            F.col("ts").alias("effect_ts"),
        )
        .withWatermark("effect_ts", watermark)
    )
    return effects.join(
        causes,
        (F.col("user_id") == F.col("cause_user"))
        & (F.col("cause_ts") <= F.col("effect_ts"))
        & (
            F.col("cause_ts")
            > F.col("effect_ts")
            - F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
    ).select(
        "effect_id",
        "cause_id",
        "user_id",
        F.round(
            F.col("effect_ts").cast("double")
            - F.col("cause_ts").cast("double"),
            3,
        ).alias("lag_secs"),
    )


def run_stream_to_memory(
    agg: DataFrame, spark: SparkSession, name: str = "stream_out"
) -> DataFrame:
    """Drive a streaming aggregate to completion into a memory sink.

    ``processAllAvailable`` makes the run synchronous and
    deterministic for a bounded file source; ``complete`` output mode
    emits final per-window rows.
    """
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")  # noqa: S608 (temp view name)


def foreach_batch_parquet_sink(stream_df: DataFrame, out_dir: str):
    """Idempotent exactly-once-per-batch parquet sink via foreachBatch.

    The standard production sink pattern when the target lacks a
    transactional streaming writer: each micro-batch lands in its own
    ``batch_id=N`` directory with mode=overwrite, so a replayed batch
    (restart between sink write and offset commit) REPLACES its own
    output instead of duplicating it — end-to-end effectively-once on
    top of the source's replayability, no sink transaction needed.
    Returns the unstarted DataStreamWriter; callers .start() it.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return stream_df.writeStream.foreachBatch(write_batch).outputMode(
        "append"
    )


def streaming_user_stats_tws(spark: SparkSession, path: str) -> DataFrame:
    """Running per-user stats via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-state API (the applyInPandasWithState
    successor: typed state variables, composable value/list/map
    state, timers).

    State here is one ValueState row per user: (n_events, total,
    max_value). Each micro-batch the handler folds its rows into the
    state and emits the user's updated totals — same contract as
    ``streaming_user_totals_stateful``, so the batch aggregate is the
    verification twin for BOTH stateful APIs. At scale the state
    store shards by user_id; TTL/timers (handle.registerTimer) bolt
    on idle-user eviction without restructuring.
    """
    try:  # the v2 state protocol serializes over protobuf
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package, "
            "which this container lacks — the operator definition and "
            "its batch-twin test are real; install protobuf to run it "
            "(applyInPandasWithState covers stateful processing "
            "without it: streaming_user_totals_stateful)"
        ) from e

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # transformWithState requires the RocksDB state store (the
    # production-standard provider; the default HDFS-backed store
    # doesn't implement the v2 state protocol)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n long, total double, mx double"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, mx = self._state.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    events = _read_events_stream(spark, path)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=(
            "user_id long, n_events long, total_value double,"
            " max_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )


def streaming_sliding_counts(
    spark: SparkSession,
    path: str,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream -> watermark -> SLIDING-window agg (overlapping
    windows: each event lands in window/slide buckets; Spark expands
    the assignment at plan time, state is per-(window, type) like the
    tumbling case — the overlap multiplies state rows by
    window/slide, not by events).

    Batch twin: contract.py::events_sliding_windowed_agg (the oracle
    states the two-starts-per-event expansion explicitly).
    Output: (window_start, event_type, n_events, total_value).
    """
    events = _read_events_stream(spark, path)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_top_types(
    spark: SparkSession,
    path: str,
    k: int = 3,
) -> DataFrame:
    """Streaming global top-k: event types ranked by all-time count,
    limited to k — sorting is only legal in COMPLETE output mode
    (the sink rewrites the whole result each trigger, so a total
    order exists to sort; append/update modes forbid it). State is
    one row per event type — the ranking happens on the tiny
    aggregated relation at emit time, never on the stream.

    Batch twin: the same groupBy-count + orderBy-limit over the
    static table (verified row-equal in test_streaming.py).
    """
    events = _read_events_stream(spark, path)
    return (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("n_events").desc(), "event_type")
        .limit(k)
    )
