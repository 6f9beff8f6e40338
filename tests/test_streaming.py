"""Structured Streaming extraction: drain-pending semantics, exactly-once
file-level resume, windowed metrics."""

import pytest
from pyspark.sql import functions as F

from doctor_spark.corpus import pages_dataframe
from doctor_spark.streaming.pipeline import streaming_extract, streaming_metrics


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src, out, ckpt = str(root / "src"), str(root / "out"), str(root / "ckpt")
    pages_dataframe(spark, 60, partitions=2).write.mode("overwrite").parquet(src)
    return src, out, ckpt


def test_streaming_extract_and_resume(spark, dirs):
    src, out, ckpt = dirs
    streaming_extract(spark, src, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 60
    assert first.where(F.col("content") != "").count() > 0

    # append a new drop; re-run processes ONLY the new files
    pages_dataframe(spark, 20, partitions=1).write.mode("append").parquet(src)
    streaming_extract(spark, src, out, ckpt)
    again = spark.read.parquet(out)
    # 60 original + 20 new + 60 duplicated? No: checkpoint skips the first
    # files, so exactly 60 + 20 (the 20-doc drop reuses ids 0-19 -> urls
    # repeat, but file-level exactly-once means no re-processing)
    assert again.count() == 80


def test_streaming_windowed_metrics(spark, dirs):
    src, _out, _ckpt = dirs
    q = streaming_metrics(spark, src, query_name="m1")
    q.awaitTermination()
    rows = spark.sql("select * from m1").collect()
    assert rows
    assert sum(r.n_pages for r in rows) == 80
    assert all(r.bytes_in > 0 for r in rows)
