"""Checkpoint/resume via a processed-url manifest.

The north rule requires resumability from checkpoint via Iceberg
snapshot-id incremental reads. On Iceberg the incremental read is:

    spark.read.format("iceberg")
         .option("start-snapshot-id", last_done)
         .option("end-snapshot-id", current).table("pages")

On plain parquet (sandbox) the same contract is kept with an explicit
manifest of processed urls: a resumed run anti-joins the input against
the manifest, processes only the remainder, then appends to the
manifest. Both are exactly-once at document granularity because the
extraction itself is deterministic and the sinks are idempotent
(merge_if_empty) or append-keyed by run_id (audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def filter_resumable(pages_df: DataFrame, manifest_path: str) -> DataFrame:
    """Drop documents already recorded in the manifest (anti-join —
    broadcast when the manifest is small, shuffle-hash otherwise; AQE
    picks at runtime)."""
    spark = pages_df.sparkSession
    try:
        done = spark.read.parquet(manifest_path).select("url")
    except Exception:
        return pages_df  # first run: no manifest yet
    return pages_df.join(done, "url", "left_anti")


def update_manifest(processed_urls: DataFrame, manifest_path: str,
                    run_id: str) -> None:
    (processed_urls.select("url").distinct()
     .withColumn("run_id", F.lit(run_id))
     .withColumn("ts", F.current_timestamp())
     .write.mode("append").parquet(manifest_path))


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    return spark.read.parquet(manifest_path)
