#!/usr/bin/env python
"""N vs 4N scaling evidence for the curation pipeline (the LLM-data
side of the engine), matching bench_scaling.py's protocol for the
extraction side:

    python tools/bench_curate_scaling.py            # 100k docs, pair 2,8
    CURATE_DOCS=200000 CURATE_PAIR=2,8 python tools/bench_curate_scaling.py

Workload per measured pass: MinHash-LSH near-dup pair generation over
the synthetic documents corpus + the full curate_corpus composition
(quality gate → lang filter → exact dedup → near-dup anti-join),
counted to force execution. Corpus is generated once to parquet and
shared by both JVMs. Prints one JSON line; paste results into
BENCH/BASELINE.md (this script does NOT rewrite it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKLOAD = r"""
import json, time, sys
sys.path.insert(0, {repo!r})
from pdf_extractor_spark.session import get_spark
spark = get_spark("curate-scaling", master=f"local[{cpus}]",
                  shuffle_partitions=max(8, {cpus}))
docs = spark.read.parquet({docs_path!r})
from pdf_extractor_spark.ops.curate import curate_corpus
from pdf_extractor_spark.ops.dedup import minhash_lsh_pairs

n_iters = int(__import__("os").environ.get("CURATE_ITERS", "3"))
best = float("inf")
for it in range(n_iters):
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    kept = curate_corpus(docs, near_dup_pairs=pairs).count()
    dt = time.time() - t0
    spark.catalog.clearCache()
    if it >= 1:
        best = min(best, dt)
n = docs.count()
print("RESULT " + json.dumps({{
    "cpus": {cpus}, "wall_s": round(best, 2), "docs": n,
    "kept": kept, "docs_per_s": round(n / best, 1)}}))
"""


def run_at(cpus: int, docs_path: str, repo: str) -> dict:
    code = WORKLOAD.format(cpus=cpus, docs_path=docs_path, repo=repo)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT; stderr tail:\n{out.stderr[-2000:]}")


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    n_docs = int(os.environ.get("CURATE_DOCS", "100000"))
    pair = os.environ.get("CURATE_PAIR", "2,8")
    n_lo, n_hi = (int(x) for x in pair.split(","))
    assert n_hi == 4 * n_lo, "pair must be N,4N"

    docs_path = f"/tmp/spark_graft_bench/docs_{n_docs}"
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        from pdf_extractor_spark.datagen import documents_df
        from pdf_extractor_spark.session import get_spark

        spark = get_spark("curate-datagen", master="local[32]")
        documents_df(spark, n_docs).write.mode("overwrite").parquet(docs_path)
        spark.stop()

    # CURATE_ROUNDS > 1: alternate legs, keep best per config
    # (steal-robust — same rationale as bench_scaling SCALING_ROUNDS)
    rounds = int(os.environ.get("CURATE_ROUNDS", "1"))
    lo = hi = None
    for _ in range(rounds):
        r = run_at(n_lo, docs_path, repo)
        lo = r if lo is None or r["docs_per_s"] > lo["docs_per_s"] else lo
        r = run_at(n_hi, docs_path, repo)
        hi = r if hi is None or r["docs_per_s"] > hi["docs_per_s"] else hi
    eff = (hi["docs_per_s"] / lo["docs_per_s"]) / 4
    print(json.dumps({"lo": lo, "hi": hi, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
