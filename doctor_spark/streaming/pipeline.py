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


# Update-mode emits each window's LATEST aggregate per micro-batch; a
# memory sink would APPEND those rows, so any window updated in more than
# one batch (maxFilesPerTrigger splits, a second availableNow run, a
# restart) shows up multiple times and consumers that SUM the table
# double-count.  The correct update-mode consumer is a keyed MERGE:
# foreachBatch overwrites exactly the touched windows' partitions in a
# window-keyed parquet table (dynamic partition overwrite = last write
# wins per window).  The sink lives in STORAGE — it survives a driver
# restart, is bounded by live-window cardinality (not batch count, not
# driver memory), and re-processing a batch after recovery is idempotent
# because re-writing a window partition with the same aggregate is a
# no-op.  (An Iceberg/Delta MERGE INTO replaces this 1:1 when available.)
_METRICS_SCHEMA = "window_start timestamp, n_pages long, bytes_in long"


def streaming_metrics(
    spark: SparkSession,
    source_dir: str,
    metrics_dir: str,
    *,
    window: str = "1 day",
    watermark: str = "2 days",
    checkpoint_dir: str | None = None,
):
    """Windowed per-crawl-day metrics over the stream: watermarked event
    time (warc_ts), tumbling windows, update mode — the watermark actually
    BINDS in update mode (state for windows older than the watermark is
    evicted and late data beyond it is dropped); in complete mode Spark
    ignores the watermark and retains every window ever seen, which grows
    state without bound on a continuous stream.

    Sink: foreachBatch MERGE into the window-keyed parquet table at
    ``metrics_dir`` (see note above).  Pass ``checkpoint_dir`` to make the
    query itself resumable; read results with ``metrics_snapshot``."""
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
        # batch, already fully re-aggregated — overwrite only those
        # windows' partitions (a string partition key keeps the on-disk
        # layout portable; window_start stays a typed data column)
        (
            batch_df.withColumn(
                "window_key",
                F.date_format("window_start", "yyyy-MM-dd'T'HH.mm.ss"),
            )
            .repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_key")
            .parquet(metrics_dir)
        )

    writer = agg.writeStream.foreachBatch(_upsert).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


def metrics_snapshot(spark: SparkSession, metrics_dir: str) -> DataFrame:
    """Current upserted window metrics from the storage-backed sink —
    exactly one row per window regardless of how many micro-batches (or
    restarted runs) updated it."""
    from ..pipeline import _is_fresh_start_error

    try:
        df = spark.read.parquet(metrics_dir)
    except Exception as exc:
        if _is_fresh_start_error(exc):  # no metrics written yet
            return spark.createDataFrame([], _METRICS_SCHEMA)
        raise
    return df.select("window_start", "n_pages", "bytes_in")
