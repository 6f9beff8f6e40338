"""Streaming extraction: the same Arrow-UDF operators over an unbounded
pages source.

The reference is strictly request/response (SURVEY.md §2.7) — streaming is
this engine's extension for continuous crawl ingestion: new parquet/WARC
drops land in a directory, Structured Streaming picks them up, the
extraction operator (identical code path to batch) emits result rows, and
checkpointing gives exactly-once file-level resume — the streaming analog
of the batch pipeline's url anti-join.

``trigger(availableNow=True)`` drains everything pending and stops, which
is both the test mode and the sensible cron-driven production mode;
removing the trigger gives a continuous micro-batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..corpus import PAGES_SCHEMA_DDL
from ..operators.extract import extract_operator


def read_pages_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def streaming_extract(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    ocr_available: bool = True,
    await_termination: bool = True,
):
    """File-source pages stream → extraction → parquet sink.

    Exactly-once per input file via the checkpoint; re-running with the
    same checkpoint processes only new files."""
    pages = read_pages_stream(spark, source_dir)
    extracted = extract_operator(pages, ocr_available=ocr_available)
    query = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query


# driver-side upsert stores for streaming_metrics, keyed by query name.
# Update-mode emits each window's LATEST aggregate per micro-batch; a
# memory sink would APPEND those rows, so any window updated in more than
# one batch (maxFilesPerTrigger splits, a second availableNow run, a
# restart) shows up multiple times and consumers that SUM the table
# double-count.  foreachBatch upserting by window key is the correct
# update-mode consumer (the production analog is a kafka-compacted topic
# or a MERGE INTO).  Row count is bounded by live-window cardinality.
_METRICS_STORE: dict[str, dict] = {}


def streaming_metrics(
    spark: SparkSession,
    source_dir: str,
    *,
    window: str = "1 day",
    watermark: str = "2 days",
    query_name: str = "pages_metrics",
):
    """Windowed per-crawl-day metrics over the stream: watermarked event
    time (warc_ts), tumbling windows, update mode — the watermark actually
    BINDS in update mode (state for windows older than the watermark is
    evicted and late data beyond it is dropped); in complete mode Spark
    ignores the watermark and retains every window ever seen, which grows
    state without bound on a continuous stream.

    Sink: foreachBatch upsert keyed by window_start (see _METRICS_STORE
    note).  Read results with ``metrics_snapshot``."""
    store = _METRICS_STORE.setdefault(query_name, {})
    store.clear()
    pages = read_pages_stream(spark, source_dir)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("n_pages"),
            F.col("bytes_in"),
        )
    )

    def _upsert(batch_df, _batch_id) -> None:
        # update-mode batches contain one row per window TOUCHED this
        # batch, already fully re-aggregated — last write wins
        for r in batch_df.collect():
            store[r["window_start"]] = (r["n_pages"], r["bytes_in"])

    return (
        agg.writeStream.foreachBatch(_upsert)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def metrics_snapshot(spark: SparkSession, query_name: str = "pages_metrics") -> DataFrame:
    """Current upserted window metrics as a DataFrame (exactly one row per
    window regardless of how many micro-batches updated it)."""
    store = _METRICS_STORE.get(query_name, {})
    rows = [
        (ws, n, b) for ws, (n, b) in sorted(store.items())
    ]
    return spark.createDataFrame(
        rows, "window_start timestamp, n_pages long, bytes_in long"
    )
