"""Training-sequence packing plan: assign every document a byte/token
offset in the concatenated training stream and the sequence ids it
lands in (concat-and-chunk packing, the standard pre-training shape).

The core is a DISTRIBUTED PREFIX SUM — the naive formulation
(`sum() over (order by doc_id rows unbounded preceding)`) puts the
whole corpus through one task (a global, un-partitioned window), which
is exactly what must not happen at 10^12 documents. Instead:

1. bucket docs by `doc_id // bucket` (deterministic, order-preserving),
2. aggregate per-bucket token sums (map-side combined, tiny output),
3. cumulative-sum the BUCKET TOTALS with a single-partition window —
   over n_docs/bucket rows, not n_docs (for 10^12 docs / 64k bucket
   that is ~15M rows of 16 bytes; raise `bucket` to shrink it further),
4. window within each bucket (partitioned, parallel) and add the
   bucket's base offset.

Every row's `offset` equals the exact global running sum, with no
stage ever holding more than a bucket in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count


def packing_plan(docs: DataFrame, seq_len: int = 2048,
                 id_col: str = "doc_id", text_col: str = "text",
                 bucket: int = 65536) -> DataFrame:
    """(doc_id, n_tokens, offset, start_seq, end_seq): the placement of
    each document in the concatenated fixed-length training sequences.
    Deterministic (ordered by doc_id) and independent of partitioning.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
    ).withColumn(
        # integer `div`, not float division: double rounding would
        # misbucket ids above 2^53 (the module targets 10^12 docs).
        # Assumes non-negative doc_id (div truncates toward zero).
        "bucket", F.expr(f"doc_id div {int(bucket)}").cast("long"))

    bucket_sums = base.groupBy("bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens"))
    w_buckets = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    bucket_base = bucket_sums.withColumn(
        "bucket_base",
        F.coalesce(F.sum("bucket_tokens").over(w_buckets), F.lit(0)))

    w_local = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1)
    placed = (
        base.withColumn("local_base",
                        F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)))
        # join strategy left to AQE: bucket_base is bucket-count-sized —
        # broadcastable in almost every real configuration, but forcing
        # the hint would OOM if someone shrinks `bucket` to pathology
        .join(bucket_base.select("bucket", "bucket_base"), "bucket")
        .withColumn("offset", F.col("bucket_base") + F.col("local_base"))
    )
    return placed.select(
        "doc_id", "n_tokens", "offset",
        F.floor(F.col("offset") / seq_len).alias("start_seq"),
        F.floor((F.col("offset") + F.greatest(F.col("n_tokens"), F.lit(1))
                 - 1) / seq_len).alias("end_seq"),
    )
