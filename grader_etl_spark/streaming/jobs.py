"""Streaming jobs (SURVEY.md §2.8) — the reference's batch design
re-expressed as Structured Streaming:

| reference behavior                          | cite             | here |
|---------------------------------------------|------------------|------|
| re-ingest overlapping 7-day window each run | main.py:25,104-105 | file/rate(Kafka-twin) source reads only new data — no re-fetch |
| dedup overlap via keyed ON CONFLICT insert  | main.py:202      | ``deduplicated_stream`` (watermark + dropDuplicates) |
| late data accepted up to 7 days             | consequence      | watermark delay = 7 days |
| daily report, run daily                     | main.py:288      | ``daily_tumbling_report`` (1-day tumbling window) |
| (ext) sliding / session windows             | north star       | ``sliding_counts`` / ``session_activity`` |

Scale notes: watermarked dropDuplicates keeps only in-watermark keys
in the state store (bounded by 7 days of distinct keys, RocksDB-ready);
the windowed aggregates are partial-aggregated before the state
shuffle. Every function takes/returns DataFrames so the same plan
fragments compose with the batch operators — the Spark contract that
batch and streaming share one logical-plan language.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from grader_etl_spark.functions.quantize import floor_quantize
from grader_etl_spark.functions.textnorm import WS_RE, norm_lower

WATERMARK_DELAY = "7 days"  # main.py:25's DAYS_BACK as a late-data bound
DEDUP_KEYS = ["user_id", "event_timestamp"]  # main.py:202


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a landing directory — the scale
    replacement for the reference's re-polled REST fetch
    (main.py:103-125): new files are discovered incrementally, each
    read exactly once, no overlap re-fetch needed.
    ``max_files_per_trigger`` bounds micro-batch size (availableNow
    honors it too — it replays the backlog as several committed
    batches, which is what the restart-recovery test leans on)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def rate_stream(
    spark: SparkSession,
    rows_per_batch: int = 1000,
    start_ts_ms: int = 1704067200000,  # 2024-01-01 UTC, inside the fixture month
    advance_ms_per_batch: int = 86_400_000,
) -> DataFrame:
    """Generator-source twin of ``file_stream`` — the broker-backed
    ingest stand-in. A production deployment swaps this one line for
    ``spark.readStream.format("kafka")...`` (same (timestamp, payload)
    shape, same downstream chain); no broker ships in this
    environment, so the built-in rate-micro-batch source plays the
    part. Unlike the plain ``rate`` source it is DETERMINISTIC per
    batch (batch k = the same rows every run), which is what lets the
    parity test assert streaming == batch on equal inputs."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", start_ts_ms)
        .option("advanceMillisPerBatch", advance_ms_per_batch)
        .load()
    )


def synthesize_events(ticks: DataFrame, base_date: str = "2024-01-01") -> DataFrame:
    """Map a (value: long, ...) tick frame onto the attempt-event
    schema, deterministically from ``value`` alone — so the same
    function shapes the streaming rate source AND its batch twin
    (spark.range) for parity tests. Every 10th tick repeats the
    previous tick's key to exercise the dedup stage; timestamps spread
    over ~5 days inside the watermark window."""
    v = F.col("value")
    key_v = F.when(v % 10 == 9, v - 1).otherwise(v)
    return ticks.select(
        F.concat(F.lit("user_"), (key_v % 37).cast("string")).alias("user_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.to_timestamp(F.lit(base_date))) + (key_v * 977) % 432_000
        ).alias("event_timestamp"),
        F.when(key_v % 3 == 0, F.lit("run"))
        .when(key_v % 3 == 1, F.lit("check"))
        .otherwise(F.lit("submit"))
        .alias("attempt_type"),
        (key_v % 2 == 0).alias("is_correct"),
    )


def _ensure_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Apply a watermark only if the (streaming) plan doesn't already
    carry one — Spark disallows redefining it, and composed jobs
    (dedup -> windowed agg) share the upstream watermark."""
    if df.isStreaming and "EventTimeWatermark" not in df._jdf.queryExecution().analyzed().toString():
        return df.withWatermark(ts_col, delay)
    return df


def deduplicated_stream(
    events: DataFrame,
    ts_col: str = "event_timestamp",
    keys: list[str] | None = None,
    delay: str = WATERMARK_DELAY,
) -> DataFrame:
    """Watermarked keyed dedup — the streaming ON CONFLICT DO NOTHING:
    first arrival per (user_id, event_timestamp) within the 7-day
    watermark wins; later duplicates are dropped from the stream, and
    the state store evicts keys older than the watermark.

    Note the classic ``dropDuplicates`` constraint this inherits: the
    event-time column must be PART of the key for state to be evicted
    (it is, here — the reference's composite key includes the
    timestamp, main.py:202). For business keys that do NOT include
    event time, use :func:`deduplicated_stream_within_watermark`."""
    return _ensure_watermark(events, ts_col, delay).dropDuplicates(keys or DEDUP_KEYS)


def deduplicated_stream_within_watermark(
    events: DataFrame,
    ts_col: str = "event_timestamp",
    keys: list[str] | None = None,
    delay: str = WATERMARK_DELAY,
) -> DataFrame:
    """Keyed dedup for keys that don't contain the event-time column
    (``dropDuplicatesWithinWatermark``, Spark 3.5+): duplicates of a
    key arriving within the watermark delay of each other collapse to
    the first arrival, and key state is evicted once the watermark
    passes — bounded state WITHOUT smuggling the timestamp into the
    key. This is the right tool when upstream retries re-emit the same
    business key with a slightly different timestamp (the case plain
    dropDuplicates([key]) would hold state for forever, and
    dropDuplicates([key, ts]) would NOT dedup at all)."""
    return _ensure_watermark(events, ts_col, delay).dropDuplicatesWithinWatermark(
        keys or ["user_id"]
    )


def daily_tumbling_report(
    events: DataFrame, ts_col: str = "event_timestamp", delay: str = WATERMARK_DELAY
) -> DataFrame:
    """The daily report (main.py:278-289) as a 1-day tumbling-window
    aggregate: one output row per day instead of one query per day.
    approx_count_distinct stands in for the exact COUNT(DISTINCT) —
    exact distinct over streams would hold every user id in state.
    """
    return (
        _ensure_watermark(events, ts_col, delay)
        .groupBy(F.window(F.col(ts_col), "1 day").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("total_attempts"),
            F.count(F.when(F.col("is_correct"), 1)).alias("successful_attempts"),
            F.approx_count_distinct("user_id").alias("unique_users"),
            F.count(F.when(F.col("attempt_type") == "run", 1)).alias("run_attempts"),
            F.count(F.when(F.col("attempt_type") == "check", 1)).alias("check_attempts"),
        )
        .select(
            F.col("day.start").cast("date").cast("string").alias("report_date"),
            "total_attempts",
            "successful_attempts",
            floor_quantize(
                F.col("successful_attempts").cast("double")
                * 100
                / F.col("total_attempts").cast("double"),
                2,
            ).alias("success_percentage"),
            "unique_users",
            "run_attempts",
            "check_attempts",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "event_timestamp",
    length: str = "7 days",
    slide: str = "1 day",
) -> DataFrame:
    """(ext) sliding-window event counts — the streaming shape of the
    reference's 'last 7 days as of each day' re-fetch window."""
    return (
        _ensure_watermark(events, ts_col, WATERMARK_DELAY)
        .groupBy(F.window(F.col(ts_col), length, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_activity(
    events: DataFrame,
    ts_col: str = "event_timestamp",
    gap: str = "30 minutes",
) -> DataFrame:
    """(ext) per-user session windows (gap-based): contiguous activity
    bursts with < gap between events collapse into one session row."""
    return (
        _ensure_watermark(events, ts_col, WATERMARK_DELAY)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "event_timestamp",
    right_ts: str = "event_timestamp",
    within: str = "1 hour",
    delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """(ext) stream-stream join with an event-time interval: each
    left event pairs with right events for the same key that happen in
    [left_ts, left_ts + within]. Both sides carry watermarks AND the
    join condition bounds right_ts relative to left_ts — together they
    let Spark evict buffered state older than (watermark - within), so
    the join's state store is bounded by the interval, not the stream
    history. This is the streaming form of the batch range join
    (operators/joins.q_join_range); same plan fragments run in both
    modes.

    ``how="leftOuter"`` additionally emits null-padded rows for left
    events that found no partner — but only once the watermark has
    passed ``left_ts + within`` (before that, a partner could still
    arrive). Consequence under an availableNow/terminating run: left
    rows younger than (max event time − delay − within) are still
    "awaiting partners" when the query ends and their null rows are
    NOT emitted — the batch-parity test pins exactly this boundary.
    Right/full outer follow the same rule on the other side.

    Output columns: key, l_ts, r_ts, plus non-key left/right columns
    prefixed l_/r_."""
    lw = _ensure_watermark(left, left_ts, delay).alias("l")
    rw = _ensure_watermark(right, right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    keep = [F.col(f"l.{key}").alias(key), F.col(f"l.{left_ts}").alias("l_ts"), F.col(f"r.{right_ts}").alias("r_ts")]
    keep += [
        F.col(f"l.{c}").alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)
    ]
    keep += [
        F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)
    ]
    return lw.join(rw, cond, how).select(*keep)


def enriched_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """(ext) stream-static dimension enrichment: join each streaming
    micro-batch against a static dimension table. The static side is
    broadcast, so enrichment adds ZERO streaming state and no shuffle
    of the stream — the canonical pattern for attaching user/product
    metadata to an event stream before windowing. The dim frame is
    re-resolved per micro-batch, so a dimension refreshed in place
    (overwritten parquet) is picked up without restarting the query.
    Stream-STREAM joins (both sides moving) are ``interval_join``."""
    return events.join(F.broadcast(dim), on, how)


def run_to_memory_sink(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Execute a streaming plan to completion over currently-available
    data (availableNow trigger) into an in-memory table — the test
    harness's sink; production uses foreachBatch/parquet instead."""
    from grader_etl_spark.session import stream_start_conf

    with stream_start_conf(stream_df.sparkSession):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return q


def curated_doc_stream(docs: DataFrame) -> DataFrame:
    """Streaming corpus curation gate: the L87 hashed-feature linear
    classifier applied to a DOCUMENT stream. The scorer is the exact
    batch expression (operators/selection.quality_logit — one
    codegen'd integer fold, stateless), so batch and streaming share
    one scoring definition by construction: the Spark property that a
    logical-plan fragment is source-agnostic. Stateless projection +
    filter ⇒ no watermark, no state store; at production scale this
    runs map-side on the ingest stream and only survivors reach the
    (stateful) dedup and the store."""
    from grader_etl_spark.operators.selection import quality_logit

    return (
        docs.withColumn("logit_int", quality_logit(F.col("text")))
        .filter(F.col("logit_int") > 0)
        .select("doc_id", "lang", "source", "logit_int")
    )


def incremental_dedup_stream(docs: DataFrame, ledger: DataFrame) -> DataFrame:
    """Streaming twin of L51 (q_incremental_dedup): label-and-drop
    arriving documents whose content fingerprint already exists in
    the corpus ledger. The ledger is a STATIC frame of 16-byte md5
    fingerprints (a maintained table at production scale) joined
    stream-static LEFT ANTI — Spark broadcasts the static side into
    every micro-batch, so the stream stays stateless (no watermark,
    no state store) and survivors are exactly the never-seen-before
    documents. In-batch duplicates are collapsed first with a plain
    dropDuplicates on the fingerprint (per-micro-batch, bounded by
    batch size).

    The gate (curated_doc_stream) + this dedup + the store append is
    the full streaming rendition of the batch curation pipeline —
    each stage the same logical-plan fragment as its batch twin."""
    fp = F.md5(F.regexp_replace(norm_lower("text"), WS_RE, " "))
    return (
        docs.withColumn("fp", fp)
        .dropDuplicates(["fp"])
        .join(ledger.select("fp"), "fp", "left_anti")
        .select("doc_id", "lang", "source", "fp")
    )


def trending_terms(events: DataFrame, window: str = "1 day", slide: str | None = None) -> DataFrame:
    """Windowed TERM counts over an event-text stream — the trending/
    top-terms building block. The stream side stays a pure windowed
    aggregate (explode is stateless; the count is a watermarked
    streaming agg with partial aggregation before the state store, so
    state is bounded by in-watermark windows × distinct terms);
    RANKING is deliberately left to the consumer (foreachBatch or a
    batch query over the sink) because window functions aren't
    streaming-legal — the same split production topologies use.
    ``events`` needs (event_timestamp, attempt_type) — attempt_type
    plays the term column in the fixture schema."""
    win = F.window("event_timestamp", window, slide) if slide else F.window(
        "event_timestamp", window
    )
    return (
        _ensure_watermark(events, "event_timestamp", WATERMARK_DELAY)
        .groupBy(win.alias("win"), F.col("attempt_type").alias("term"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "term",
            "n",
        )
    )


def top_terms_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """Batch-side ranking over a materialized trending_terms sink —
    the consumer half (runs per micro-batch in foreachBatch or on the
    sink table)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(F.col("n").desc(), "term")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("window_start", "term", "n", "rank")
    )


def upsert_stream(
    stream_df: DataFrame,
    path: str,
    *,
    keys: list[str],
    partition_col: str | None = None,
    partition_cols: list[str] | None = None,
    order_col: str,
    checkpoint: str,
    op_col: str | None = None,
    delete_op: str = "delete",
    prune_with_source_partitions: bool = True,
    when_matched_condition: str | None = None,
    update_cols: list[str] | None = None,
):
    """Streaming UPSERT: ``foreachBatch`` + ``plans.merge.merge_into``
    — the table-maintenance composition a CDC/mutable-entity feed
    needs, where ``idempotent_append`` (insert-only, first-writer-wins)
    is the wrong semantic because later versions must WIN.

    Per micro-batch: collapse to the latest version per key
    (``order_col`` desc, remaining columns as a deterministic
    tie-break — merge refuses ambiguous duplicates) and MERGE it into
    the partitioned parquet table. Exactly-once across crashes comes
    from the pairing of Spark's checkpointed replay with merge's
    idempotence: a replayed batch re-merges the same latest rows into
    the same keys, so the second application is a semantic no-op —
    same discipline the append path proves in
    tests/test_stream_to_store.py, now for updates.

    Feed contract: every event — tombstones included — must carry the
    row's partition value (a keys-only Debezium-style delete is
    refused loudly by merge's NULL-partition gate, never applied
    half-right). If the feed can move a key between partitions (e.g.
    a status-partitioned table), pass
    ``prune_with_source_partitions=False`` so merge discovers the
    key's CURRENT partition instead of trusting the event's value —
    the default pruned mode would leave the old row behind as a
    duplicate.

    CDC deletes: pass ``op_col`` naming a column whose value
    ``delete_op`` marks a tombstone. The latest-version collapse
    happens FIRST, so a key whose newest change is a delete is
    removed even if the same batch also carries its earlier upsert —
    and vice versa. The op column is stripped before merging (it is
    feed metadata, not table data). A replayed delete finds no match
    and no-ops, so exactly-once is preserved.

    Delta-parity clause passthrough: ``partition_cols`` (multi-column
    layouts), ``when_matched_condition`` (e.g. ``"s.ts > t.ts"`` to
    make stale replays/out-of-order feeds lose against the stored
    row — it gates CDC deletes too), and ``update_cols`` (narrow
    changes feeds that SET a column subset) flow straight through to
    ``merge_into``.

    Returns the started StreamingQuery (availableNow trigger; caller
    awaits)."""
    from pyspark.sql.window import Window

    from grader_etl_spark.plans.merge import merge_into

    def _sink(batch: DataFrame, _bid: int) -> None:
        tie = [c for c in batch.columns if c != order_col]
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc_nulls_last() for c in tie]
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        mkw = dict(
            keys=keys, partition_col=partition_col,
            partition_cols=partition_cols,
            prune_with_source_partitions=prune_with_source_partitions,
        )
        if op_col is None:
            merge_into(
                batch.sparkSession, path, latest,
                when_matched_condition=when_matched_condition,
                update_cols=update_cols, **mkw,
            )
            return
        # one materialization of the window collapse feeds BOTH merges
        # (each side re-persists its filtered view internally, but the
        # expensive row_number shuffle runs once)
        latest = latest.persist()
        try:
            dels = latest.filter(F.col(op_col) == delete_op).drop(op_col)
            ups = latest.filter(
                (F.col(op_col) != delete_op) | F.col(op_col).isNull()
            ).drop(op_col)
            # disjoint key sets (one latest op per key): order immaterial
            merge_into(
                batch.sparkSession, path, ups,
                when_matched_condition=when_matched_condition,
                update_cols=update_cols, **mkw,
            )
            merge_into(
                batch.sparkSession, path, dels,
                when_matched="delete", when_not_matched=None,
                when_matched_condition=when_matched_condition, **mkw,
            )
        finally:
            latest.unpersist()

    from grader_etl_spark.session import stream_start_conf

    with stream_start_conf(stream_df.sparkSession):
        return (
            stream_df.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
