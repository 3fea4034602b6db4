"""Streaming wrapper: incremental micro-batches produce exactly the
batch pipeline's output, and new files are picked up incrementally."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from pdf_extractor_spark import datagen
from pdf_extractor_spark.engine2 import pipeline as e2
from pdf_extractor_spark.streaming import stream_extract_ficha


def _await(q, timeout=120):
    q.awaitTermination(timeout)


def test_stream_matches_batch_and_is_incremental(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = spark.createDataFrame(datagen.corpus_pandas(20))
    first.write.mode("append").parquet(pages_dir)

    q = stream_extract_ficha(spark, pages_dir, out, ckpt)
    _await(q)

    got1 = spark.read.parquet(out)
    batch = e2.extract_ficha(spark.read.parquet(pages_dir))
    assert got1.drop("batch_id").count() == batch.count()

    # new arrivals only → second trigger processes just the delta
    second = spark.createDataFrame(datagen.corpus_pandas(12, start=1000))
    second.write.mode("append").parquet(pages_dir)
    q2 = stream_extract_ficha(spark, pages_dir, out, ckpt)
    _await(q2)
    time.sleep(0.5)

    got2 = spark.read.parquet(out)
    full_batch = e2.extract_ficha(spark.read.parquet(pages_dir))
    assert got2.drop("batch_id").count() == full_batch.count()
    # urls from the first batch were not re-processed (exactly-once)
    dups = (got2.filter(F.col("code") == "__metrics__")
            .groupBy("url").count().filter(F.col("count") > 1).count())
    assert dups == 0
