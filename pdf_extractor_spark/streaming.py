"""Structured-Streaming wrapper around the batch extraction pipeline.

The reference has no streaming surface (SURVEY §2.10) and its only
cross-input state (G5 block carry) is confined within one document, so
the correct streaming mapping is micro-batch reuse of the exact batch
pipeline: `readStream` over the pages location → `foreachBatch` running
the same Engine-1/Engine-2 dataflows → append sinks. No watermarks or
`transformWithState` are needed — there is no event-time or
cross-document state by construction.

On Iceberg this is `spark.readStream.format("iceberg")` (snapshot-id
incremental micro-batches); on the sandbox's plain parquet it's the
file stream source. `Trigger.AvailableNow` gives the catch-up /
backfill mode; continuous incremental ingestion just drops the trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datagen import PAGES_SCHEMA
from .engine2 import pipeline as e2


def stream_extract_ficha(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Incrementally extract newly-arrived page files.

    Exactly-once at document granularity: the file-source (or Iceberg
    snapshot range) tracks progress in the checkpoint; each micro-batch
    runs the deterministic batch pipeline and appends.
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .parquet(pages_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        long_df = e2.extract_ficha(batch_df)
        (long_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_path))

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
