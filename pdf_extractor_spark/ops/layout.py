"""Input-layout guards (guide §2.5 "input skew", §6).

The driver's testdata tables are single-file parquet with ONE row
group (50k docs in one 5.9 MB group at sf1.0). Parquet is splittable
only at row-group boundaries, so no matter how many scan splits Spark
plans, exactly one task materializes every row — and every expensive
stage fused onto that scan (shingle explode, PDF render/parse, HTML
flatten, regex gates) runs single-threaded while 31 cores idle. That
is the guide's "one huge unsplittable file" case: repartition
immediately after the read.

`rebalance_narrow` is size-gated so it stays scale-adaptive rather
than local-tuned: it fires only when the optimizer's size estimate for
the input is below cores × 32 MB — i.e. when the whole table is
smaller than one healthy scan split per core, so the round-robin
shuffle it introduces is bounded by that same budget (a few MB here).
At 100 TB the estimate is far above the gate, no exchange is added,
and the plans keep their shuffle-free scan→kernel shape (the plan
tests pin both regimes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# one healthy scan split per core; inputs smaller than this per core
# cannot be relied on to feed every core from file layout alone
_BYTES_PER_CORE = 32 << 20


def _estimated_bytes(df: DataFrame) -> int | None:
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:  # stats unavailable → treat as huge (no rebalance)
        return None


def rebalance_narrow(df: DataFrame, bytes_per_core: int = _BYTES_PER_CORE
                     ) -> DataFrame:
    """Round-robin repartition of a provably-small input to full core
    width before an expensive per-row stage; identity for anything the
    optimizer estimates above cores × bytes_per_core, and for inputs
    the caller already repartitioned (no double exchange when a query
    rebalances once and feeds several ops that each guard themselves)."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    try:
        top = df._jdf.queryExecution().analyzed().getClass().getSimpleName()
        if top in ("Repartition", "RepartitionByExpression"):
            return df
    except Exception:
        pass
    est = _estimated_bytes(df)
    if est is not None and est < cores * bytes_per_core:
        return df.repartition(cores)
    return df


def dim_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Literal dimension table with an HONEST size estimate.

    `spark.createDataFrame(rows, ...)` plans as a node whose
    sizeInBytes is Long.MaxValue (stats unknown), and that estimate is
    contagious: a union of a 5 MB corpus with a 2-row literal table is
    estimated at ~8 EB, which (measured, sf1.0 replica) silently
    disables BOTH the `rebalance_narrow` gate (the planted curation
    corpus ran its shingle explode and gate regexes on one core) and
    broadcast-join selection downstream (the Jaccard verify joins fell
    back to SortMergeJoin) — ~3x on the whole MinHash pass.

    Building the same rows as a projection over `spark.range(n)` keeps
    exact row-count stats, so the estimate stays a few hundred bytes.
    `schema` is the same DDL string createDataFrame takes; column
    order must match the tuples."""
    n = len(rows)
    names = [c.strip().split()[0] for c in schema.split(",")]
    types = [c.strip().split(None, 1)[1] for c in schema.split(",")]
    idx = (F.col("id") + 1).cast("int")
    cols = [
        F.element_at(F.array(*[F.lit(r[i]) for r in rows]), idx)
        .cast(types[i]).alias(names[i])
        for i in range(len(names))
    ]
    return spark.range(n).select(*cols)
