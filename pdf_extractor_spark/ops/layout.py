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

from pyspark.sql import DataFrame

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
