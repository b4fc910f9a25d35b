"""Structured Streaming over the ``events`` table (SURVEY.md §2.10).

The reference has no data streaming (its ``run_stream`` is LLM token
streaming to a console — ``zc_agent/main.py:76-78``); this is the EXT
surface the driver's ``events`` table exists for. Each streaming query
has a batch twin declared in ``plans.streaming_q`` that the DuckDB
oracle checks; the streaming path is additionally pinned to the batch
result by the ``tests/test_streaming.py`` equivalence tests (the
documented correctness story for non-SQL-checkable state).

Watermarks bound state at scale: hourly tumbling windows with a 1-hour
watermark hold ~2 windows of partial aggregates per key regardless of
input volume.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _table_stream(
    spark: SparkSession, sf_dir: str, table: str, files_per_trigger: int | None = 1
) -> DataFrame:
    """File-stream source over one testdata table, layout-aware. The
    file stream source wants a directory; two layouts exist: the
    driver testdata ships ``<table>.parquet`` as a single FILE (point
    the source at sf_dir and glob-filter down to it), while any
    Spark-written table is a DIRECTORY of part files (load it directly
    — a glob for the table name filtered the part-*.parquet files out,
    so the stream silently saw ZERO files and every stream query
    returned empty; caught by the round-7 sf1 soak).

    ``files_per_trigger`` sets ``maxFilesPerTrigger`` (default 1: one
    micro-batch per file, maximal state-machine exercise). Pass ``None``
    to leave it unset — availableNow then drains ALL files in ONE data
    batch, which is REQUIRED for watermarked operators replaying a
    multi-file table: part files are hash-partitioned, so each spans
    the full event-time range, and per-file batches advance the
    watermark to ~max(ts)−delay after the FIRST file — every older row
    in files 2..N is then silently dropped as late (measured: 6% of
    rows survived a 32-file replay through the hourly watermark agg).
    A real deployment tails an arrival-ordered source, where per-batch
    watermark advance is correct; a historical REPLAY is only
    order-correct as a single batch (or as event-time-sorted files)."""
    import os

    table_path = f"{sf_dir}/{table}.parquet"
    raw_schema = spark.read.parquet(table_path).schema
    reader = spark.readStream.schema(raw_schema).format("parquet")
    if files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    if os.path.isdir(table_path):
        return reader.load(table_path)
    return reader.option("pathGlobFilter", f"{table}.parquet").load(sf_dir)


def _event_stream(
    spark: SparkSession, sf_dir: str, files_per_trigger: int | None = 1
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _table_stream(spark, sf_dir, "events", files_per_trigger=files_per_trigger)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        # on NTZ). The session pins UTC, so the cast is value-preserving
        # and the batch twins (which keep NTZ) collect identical naive
        # datetimes.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_memory(stream: DataFrame, output_mode: str) -> DataFrame:
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark_q = q.sparkSession if hasattr(q, "sparkSession") else None
    spark = spark_q or stream.sparkSession
    out = spark.table(name)
    # r17 (VERDICT r16 item 2): every drain used to LEAK its memory-sink
    # registration — warm-up + reps + soak legs accumulated mem_<uuid>
    # temp views (and their rows) in the driver for the process
    # lifetime. The DataFrame above is already resolved to the sink's
    # plan, so dropping the catalog name neither unbinds it nor discards
    # the rows (pinned by tests/test_streaming.py::test_drain_leaves_no
    # _sink_tables); the rows are then freed with the DataFrame instead
    # of never. availableNow + awaitTermination means the query has
    # terminated; resetTerminated() drops the manager's handle list so
    # finished StreamExecutions are collectable too.
    spark.catalog.dropTempView(name)
    spark.streams.resetTerminated()
    return out


def hourly_event_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows with a 1-hour watermark: count + value
    sum per (window, event_type). availableNow drains the table as a
    bounded stream — same code runs unbounded on a cluster. Watermarked
    replay: single data batch (see ``_table_stream``) so multi-file
    layouts don't late-drop rows behind the first file's watermark."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias("sum_value"),
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        F.col("win.start").alias("hour_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def sessionize_stream(spark: SparkSession, sf_dir: str, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user (gap-based), streaming-native state.
    Watermarked replay → single data batch (see ``_table_stream``)."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.session_window("ts", gap).alias("sw"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = _run_to_memory(agg, "append")
    # session_window.end = last event + gap; report the last-event time
    # so the output aligns with the batch gaps-and-islands definition.
    return out.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        (F.col("sw.end") - F.expr(f"INTERVAL {gap}")).alias("session_end"),
        "n_events",
    )


def sliding_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour, slide 30 min) per event_type — each
    event lands in 2 windows; watermark finalizes both. Watermarked
    replay → single data batch (see ``_table_stream``)."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None).withWatermark("ts", "1 hour")
    agg = ev.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = _run_to_memory(agg, "append")
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "event_type",
        "n_events",
    )


def dedup_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on user_id+event_type within the
    watermark (dropDuplicatesWithinWatermark): keeps the first arrival
    per key per watermark horizon — the streaming twin of an exact-dedup
    pass, with bounded state. Watermarked replay → single data batch
    (see ``_table_stream``)."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None).withWatermark("ts", "2 hours")
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_first_arrivals"))
    return _run_to_memory(agg, "complete")


def view_purchase_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time bound: purchases
    joined to the same user's views from the preceding 30 minutes.
    Watermarks bound both join states; the time condition lets Spark
    evict rows that can no longer match. Watermarked replay → single
    data batch (see ``_table_stream``)."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    out = _run_to_memory(joined, "append")
    return out.select(
        F.col("v_user").alias("user_id"), "view_id", "purchase_id", "view_ts", "purchase_ts"
    )


def user_totals_stateful_stream(
    spark: SparkSession, sf_dir: str, files_per_trigger: int | None = 1
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, value-sum) kept in explicit state — the escape
    hatch for semantics window aggregations can't express. State is
    per-key and Arrow-batched; at scale it shards across executors by
    the groupBy key.

    Deliberately KEEPS per-file micro-batches (unlike the watermarked
    aggregates, which drain in one batch — see ``_table_stream``):
    with ``NoTimeout`` the watermark never filters this operator's
    input, so unordered multi-file replay is order-insensitive —
    proven by the multi-batch equivalence test
    (test_stateful_stream_survives_multiple_microbatches), which
    REQUIRES >1 micro-batch to exercise the state-read path.

    ``files_per_trigger=None`` is the COARSE-TRIGGER escape hatch for
    replay/backfill: one availableNow drain = one ``update()`` call per
    user instead of one per (file, user) — ~|files|× fewer Python state
    calls for identical final totals (the per-call cost model is exact:
    scripts/profile_stateful_stream.py). Production streams ingesting
    live micro-batches pay the per-batch rate by definition."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = _event_stream(
        spark, sf_dir, files_per_trigger=files_per_trigger
    ).withWatermark("ts", "1 hour")

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        # GroupState.get is a PROPERTY (raises when absent), not a
        # method — calling it returned the tuple then crashed on the
        # second micro-batch's call. Latent until the round-7 sf1 soak:
        # single-file sources produce exactly one batch, so
        # state.exists was never True in any smaller run.
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(agg, "update")


def enriched_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    per-user profile built batch-side (first_seen + historical event
    count). The static side re-plans per micro-batch; at scale it's a
    broadcast against each batch."""
    # static side goes through the normalized loader (ns → µs)
    from ..sources.catalog import read_parquet_table

    hist = (
        read_parquet_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("hist_events"), F.min("ts").alias("first_seen"))
    )
    ev = _event_stream(spark, sf_dir)
    joined = ev.join(F.broadcast(hist), "user_id", "left").select(
        "event_id", "user_id", "event_type", "hist_events", "first_seen"
    )
    return _run_to_memory(joined, "append")


def hourly_stats_to_parquet(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Production sink pattern: stream → foreachBatch → idempotent
    partition-overwrite parquet. Each micro-batch rewrites exactly the
    hour partitions it touches (dynamic partition overwrite), so
    replayed batches converge instead of duplicating — the exactly-once
    recipe for file sinks that don't support streaming upsert.
    Watermarked replay → single data batch (see ``_table_stream``)."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    flat = agg.select(
        F.date_format("win.start", "yyyyMMddHH").alias("hour_part"),
        F.col("win.start").alias("hour_start"),
        "event_type",
        "n_events",
    )

    def write_batch(batch_df, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour_part")
            .parquet(out_dir)
        )

    q = (
        flat.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def replay_filtered_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static LEFT ANTI join: drop incoming events whose
    event_id is already in a static processed-ids table — the streaming
    twin of incremental dedup (``operators/incremental.py``) and the
    standard replay/contamination gate in front of a training-data
    ingest. The static side is ids only (8 bytes/row) → broadcast
    against every micro-batch."""
    from ..sources.catalog import read_parquet_table

    seen = (
        read_parquet_table(spark, sf_dir, "events")
        .where(F.col("event_id") % 2 == 0)
        .select("event_id")
    )
    ev = _event_stream(spark, sf_dir)
    kept = ev.join(F.broadcast(seen), "event_id", "left_anti")
    return _run_to_memory(kept.select("event_id", "user_id", "event_type"), "append")


def _document_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the documents table (same layout-aware source
    as ``_event_stream``): the shape of a landing-zone text ingest."""
    return _table_stream(spark, sf_dir, "documents")


def doc_dedup_gate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup gate — the streaming twin of
    ``plans/pipelineq.py::dedup_incremental_batch``: documents with
    doc_id%5=4 arrive as the stream, the rest are the already-deduped
    corpus. Each micro-batch drops (a) rows whose md5(text) exists in
    the static corpus-hash table (stream-static LEFT ANTI join — the
    static side ships 16-byte hashes only, broadcast per batch) and
    (b) within-stream repeats via streaming dropDuplicates on the hash
    (first arrival wins; state holds one 16-byte hash per distinct
    incoming text — at production scale, bound it with an ingest-time
    watermark + dropDuplicatesWithinWatermark as in
    ``dedup_events_stream``).

    Equivalence with the batch twin is pinned in tests/test_streaming.py."""
    from ..sources.catalog import read_parquet_table

    corpus_hashes = (
        read_parquet_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 != 4)
        .select(F.md5(F.col("text")).alias("_h"))
        .distinct()
    )
    inc = (
        _document_stream(spark, sf_dir)
        .where(F.col("doc_id") % 5 == 4)
        .withColumn("_h", F.md5(F.col("text")))
    )
    kept = (
        inc.join(F.broadcast(corpus_hashes), "_h", "left_anti")
        .dropDuplicates(["_h"])
        .select("doc_id", "lang")
    )
    return _run_to_memory(kept, "append")


def daily_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained DAILY pre-aggregate (the streaming
    operationalization of ``events_daily_rollup_merge``'s contract:
    raw events are consumed once, the rollup table absorbs them as
    1-day tumbling windows). A 1-day watermark bounds state to ~2 open
    days per event type; downstream monthly/backfill queries re-
    aggregate the rollup, never the raw stream. Counts and decimal
    value-sums are mergeable, so late re-emits (update mode) overwrite
    cleanly by (day, type) key. Watermarked replay → single data batch
    (see ``_table_stream``)."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None).withWatermark("ts", "1 day")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )
        .select(
            F.col("win.start").cast("date").alias("d"),
            "event_type",
            "n",
            "sv",
        )
    )


def _run_v2_to_memory(spark: SparkSession, stream: DataFrame) -> DataFrame:
    """Run a state-v2 (``transformWithStateInPandas``) stream to a
    memory table in update mode. State-v2 keeps each state variable in
    its own column family — only the RocksDB provider supports that
    (the default HDFS-backed store refuses with
    MULTIPLE_COLUMN_FAMILIES). Set for this query, restore after (the
    provider choice pins at query start)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        return _run_to_memory(stream, "update")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def user_totals_state_v2_stream(
    spark: SparkSession, sf_dir: str, files_per_trigger: int | None = 1
) -> DataFrame:
    """Per-user running (count, value-sum) via the Spark 4 state-v2
    API — the ``transformWithStateInPandas`` twin of
    ``user_totals_stateful_stream`` (VERDICT r9 item 6): byte-for-byte
    the same output contract as the ``applyInPandasWithState`` (v1)
    operator, re-expressed with a ``StatefulProcessor`` holding a
    single typed ``ValueState``. The running-aggregate shape is the
    complement of ``first_type_occurrence_stream``'s ``MapState``
    novelty set: one fixed-width state row per key, every batch
    read-modify-writes it. State shards by the groupBy key exactly
    like v1; the equivalence test pins BOTH twins to the same batch
    aggregate, so v1 ≡ v2 ≡ batch is transitive. This v2 form is the
    GATED primary (r14, VERDICT item 3 — 423.5 vs v1's 626.4 s at
    sf10 for identical output); ``files_per_trigger=None`` is the same
    coarse-trigger replay escape hatch as v1's."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState("tot", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._tot.get() if self._tot.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                # pandas float sum skips NaN — same NULL semantics as
                # the v1 twin's update function
                total += float(pdf["value"].sum())
            self._tot.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
            )

        def close(self) -> None:
            pass

    ev = _event_stream(spark, sf_dir, files_per_trigger=files_per_trigger).select(
        "user_id", "value"
    )
    agg = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )
    return _run_v2_to_memory(spark, agg)


def first_type_occurrence_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty detection with the Spark 4 state-v2 API
    (``transformWithStateInPandas``): emit each (user, event_type)
    combination the FIRST time it appears in the stream, keeping the
    seen-set in a per-key ``MapState``.

    vs ``applyInPandasWithState`` (state v1, ``user_totals_stateful``):
    v2 gives typed composable state primitives (value/list/map) with
    per-entry operations — here the map grows by |event_types| per
    user, and only touched entries serialize per batch, the property
    that matters when keys are hot and state is wide. State shards by
    the groupBy key exactly like v1.

    Within a micro-batch, rows are reduced to their (ts, event_id)
    argmin per type BEFORE consulting state, so emission is
    deterministic regardless of Arrow batch order."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getMapState("seen", "event_type string", "marker int")

        def handleInputRows(self, key, rows, timerValues):
            best: dict[str, tuple] = {}
            for pdf in rows:
                for r in pdf.itertuples(index=False):
                    cur = best.get(r.event_type)
                    cand = (r.ts, r.event_id)
                    if cur is None or cand < cur:
                        best[r.event_type] = cand
            out = []
            for et in sorted(best):
                if not self._seen.containsKey((et,)):
                    self._seen.updateValue((et,), (1,))
                    ts, eid = best[et]
                    out.append((key[0], et, ts, eid))
            if out:
                yield pd.DataFrame(
                    out, columns=["user_id", "event_type", "first_ts", "first_event_id"]
                )

        def close(self) -> None:
            pass

    ev = _event_stream(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    firsts = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FirstSeen(),
        outputStructType="user_id bigint, event_type string, first_ts timestamp, first_event_id bigint",
        outputMode="Update",
        timeMode="None",
    )
    return _run_v2_to_memory(spark, firsts)


def view_purchase_left_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: every view emits — joined to a
    same-user purchase in the following 30 minutes when one exists,
    with nulls once the watermark proves no match can arrive. The
    distinct outer-join state machine: matched rows emit eagerly,
    unmatched rows are held until the watermark passes their join
    horizon, then emit exactly once. availableNow's final empty batch
    advances the watermark to max(event time) − 1h, so views newer
    than that horizon stay unemitted (asserted in the equivalence
    test's finalized-prefix comparison). Watermarked replay → single
    data batch (see ``_table_stream``)."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    out = _run_to_memory(joined, "append")
    return out.select(
        F.col("v_user").alias("user_id"), "view_id", "purchase_id", "view_ts", "purchase_ts"
    )


def session_journeys_stream(spark: SparkSession, sf_dir: str, gap: str = "10 minutes") -> DataFrame:
    """Per-(user, session) journey strings, streaming-native: a
    ``session_window`` aggregation whose payload is the ordered
    event-type-initial string (collect structs, ``array_sort`` AFTER
    the aggregate — collect order inside a streaming agg is arrival-
    dependent, the sort makes the emitted journey deterministic). The
    streaming half of ``events_journey_patterns``'s per-session
    collect; watermark-bounded session state, append-mode finalized
    sessions only. Watermarked replay → single data batch (see
    ``_table_stream``)."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.session_window("ts", gap).alias("sw"), "user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("ch"))
                    )
                ),
                lambda x: x.ch,
            ),
            "",
        ).alias("journey"),
        F.count(F.lit(1)).alias("n_events"),
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        "journey",
        F.col("n_events").cast("long").alias("n_events"),
    )


def rolling_actives_stream(
    spark: SparkSession, sf_dir: str, days: int = 7, delay: str = "7 days"
) -> DataFrame:
    """Rolling {days}-day DISTINCT active users as a streaming chain of
    TWO stateful operators — the pattern a naive sliding count(*)
    cannot express (count(DISTINCT) is not a streaming aggregate):

      1. fan each event's day out to the {days} window-days it
         supports (a stateless explode of a day sequence),
      2. ``dropDuplicates`` on (user, window_day) — watermark-aged
         dedup state, so each user counts once per window,
      3. a 1-day tumbling count over the deduped pairs, append mode —
         only watermark-finalized window-days emit.

    The streaming half of ``rolling_7d_active_users`` (same dedup-
    then-bounded-fan-out shape, incremental instead of re-scanned);
    state per operator is bounded by users x {days} inside the
    watermark horizon, independent of event volume. Watermarked replay
    → single data batch (see ``_table_stream``)."""
    ev = _event_stream(spark, sf_dir, files_per_trigger=None)
    pairs = ev.select(
        "user_id",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("ts")),
                F.date_trunc("day", F.col("ts")) + F.expr(f"INTERVAL {days - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("wday_ts"),
    )
    deduped = pairs.withWatermark("wday_ts", delay).dropDuplicates(["user_id", "wday_ts"])
    agg = deduped.groupBy(F.window("wday_ts", "1 day").alias("w")).agg(
        F.count(F.lit(1)).alias("active_users_7d")
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        F.col("w.start").cast("date").alias("window_day"),
        F.col("active_users_7d").cast("long").alias("active_users_7d"),
    )


def cdc_upsert_to_parquet(
    spark: SparkSession, feed_dir: str, target_dir: str, feed_schema
) -> None:
    """Streaming CDC apply — the foreachBatch-upsert pattern every
    lakehouse runbook ships: a change-feed file stream is applied
    micro-batch by micro-batch into a parquet "table" with MERGE
    semantics (tombstone status 'X' → DELETE, matched key → UPDATE,
    new key → INSERT; same clauses as ``plans/cdcq.py::
    merge_upsert_orders``). Each batch does read-target → full-outer
    hash join → write-new → atomic swap, which is exactly what
    Delta's MERGE does per commit minus the transaction log; replaying
    a batch whose keys were already applied converges (idempotent on
    key-disjoint feeds).

    The swap goes through a sibling directory + rename so a reader
    never sees a half-written table (the poor man's commit protocol —
    at 100 TB use a real table format; the JOIN SHAPE is identical)."""
    import os
    import shutil

    def apply_batch(batch_df, batch_id: int) -> None:
        sp = batch_df.sparkSession
        target = sp.read.parquet(target_dir).alias("t")
        b = batch_df.alias("s")
        tk, sk = F.col("t.o_orderkey"), F.col("s.o_orderkey")
        merged = (
            target.join(b, tk == sk, "full_outer")
            .select(
                F.coalesce(tk, sk).alias("o_orderkey"),
                F.when(sk.isNotNull(), F.col("s.s_status"))
                .otherwise(F.col("t.o_orderstatus"))
                .alias("o_orderstatus"),
                F.when(sk.isNotNull(), F.col("s.s_price"))
                .otherwise(F.col("t.o_totalprice"))
                .alias("o_totalprice"),
            )
            .where(F.col("o_orderstatus") != "X")
        )
        tmp = target_dir + f"_swap{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = target_dir + f"_old{batch_id}"
        os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old)

    stream = (
        spark.readStream.schema(feed_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(feed_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def user_totals_state_snapshot(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Run the per-user event-count aggregation as a stream, then read
    the query's RAW STATE back as a DataFrame via Spark 4's
    ``statestore`` data source (SPARK-45511) — the ops surface for
    debugging stateful queries at scale: state cardinality, skewed
    keys, and orphaned entries become a queryable table instead of a
    black box inside the checkpoint.

    For an unwatermarked streaming aggregate drained with availableNow,
    the state IS the full per-key aggregate (nothing ever evicts), so
    the snapshot equals the batch ``groupBy(user_id).count()`` exactly
    — which is what makes this oracle-checkable, not just smoke-
    testable. The value column's field name is provider-internal, so
    it is resolved from the state schema rather than hard-coded."""
    ev = _event_stream(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # r17 sink hygiene (same defect class as _run_to_memory): the
    # memory-sink rows are never read here — the OUTPUT comes from the
    # statestore below — so the mem_<uuid> view was a pure per-call
    # leak of the full update-mode aggregate in driver memory.
    spark.catalog.dropTempView(name)
    spark.streams.resetTerminated()
    state = spark.read.format("statestore").load(checkpoint_dir)
    value_field = state.schema["value"].dataType.fieldNames()[0]
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value").getField(value_field).cast("long").alias("n_events"),
    )


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator-level state metadata for a checkpoint (Spark 4
    ``state-metadata`` source): operator/store names, partition counts,
    min/max retained batch ids — the first table to consult when a
    production stateful query misbehaves."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def ivm_cdc_stream_merge(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    split_day: int,
    delete_mod: int,
) -> DataFrame:
    """STREAMING twin of ``plans/round8q.ivm_agg_delta_merge`` — the
    incremental-view-maintenance loop operationalized with
    ``foreachBatch``: the raw event stream is consumed once, each
    micro-batch folds to per-type (±count, ±decimal-sum) PARTIALS
    (inserts +1; retractions of delete-tagged base rows −1) appended to
    a tiny parquet state table, and the served view is the merge of the
    partials with empty groups dropped. Because count and decimal-sum
    partials form an abelian group, ANY micro-batch split of the input
    yields the same merged view as a from-scratch recompute — which is
    exactly what the DuckDB oracle computes, so the driver hash check
    proves the streaming-IVM invariant, not just row counts.

    Scale shape: each batch shuffles only its |event_types|-row rollup;
    the state table grows by |types| rows per batch and the final merge
    is a tiny aggregation. The raw stream is never rescanned — the
    100 TB pattern where history was consumed weeks ago and today's
    job touches only today's files.

    The base/insert split needs min(ts) over the WHOLE table; a global
    min is not streamable, so it comes from a one-row batch-read bound
    (static-bound pattern, cf. ``enriched_events_stream``)."""
    from ..sources.catalog import read_parquet_table

    static = read_parquet_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    d0 = static.agg(F.min(F.col("ts").cast("date")).alias("d0")).collect()[0]["d0"]

    ev = _event_stream(spark, sf_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.where(F.col("value").isNotNull()).select(
            "event_type",
            "value",
            (F.datediff(F.col("ts").cast("date"), F.lit(d0)) < split_day).alias(
                "is_base"
            ),
            (F.col("event_id") % delete_mod == 0).alias("is_del"),
        )
        ins = b.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("ps"),
        )
        dels = (
            b.where("is_base AND is_del")
            .groupBy("event_type")
            .agg(
                (-F.count(F.lit(1))).cast("long").alias("pn"),
                (-F.sum(F.col("value").cast("decimal(18,6)"))).alias("ps"),
            )
        )
        ins.unionByName(dels).write.mode("append").parquet(state_dir)

    q = (
        ev.writeStream.foreachBatch(fold)
        .option("checkpointLocation", state_dir + "_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    merged = (
        spark.read.parquet(state_dir)
        .groupBy("event_type")
        .agg(F.sum("pn").cast("long").alias("n_events"), F.sum("ps").alias("ts_sum"))
        # same degenerate-input semantics as the batch twin: a type
        # whose rows were all retracted merges away entirely, matching
        # the oracle's from-scratch recompute
        .where(F.col("n_events") > 0)
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round(F.col("ts_sum").cast("double"), 6).alias("total_value"),
    ).orderBy("event_type")
