#!/usr/bin/env python
"""N vs 4N scaling of the FULL PRODUCT JOB from raw PDF bytes —
`jobs.py --pdf-col pdf`: object-stream parse → word boxes → BOTH
engines → all nine sinks (fill-if-empty merge, four series tables,
two audit tables, attention, manifest). The end-to-end answer to
"run the reference's workload on actual PDF files, at two cluster
sizes". Alternating legs, fresh out dir + JVM per leg, best
throughput per config:

    python tools/bench_jobs_pdf_scaling.py              # pair 2,8
    JOBS_PDF_ROUNDS=2 python tools/bench_jobs_pdf_scaling.py

Reuses the bench corpus of tools/bench_pdf_e2_scaling.py (11k ficha
PDFs at the default 24000 ids). Prints one JSON line; paste into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_leg(cpus: int, pdf_path: str, repo: str, n_docs: int) -> dict:
    out = f"/tmp/spark_graft_bench/jobs_out_{cpus}"
    shutil.rmtree(out, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs.py"),
         "--pages", pdf_path, "--pdf-col", "pdf",
         "--out", out, "--run-id", f"bench{cpus}",
         "--start", "2019-01", "--end", "2021-12"],
        capture_output=True, text=True, env=env, timeout=3600, cwd=repo)
    wall = time.time() - t0
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return {"cpus": cpus, "wall_s": round(wall, 2),
            "docs_per_s": round(n_docs / wall, 1)}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    n_ids = int(os.environ.get("E2PDF_DOCS", "24000"))
    pdf_path = f"/tmp/spark_graft_bench/e2pdf_{n_ids}"
    if not os.path.exists(os.path.join(pdf_path, "_SUCCESS")):
        from pdf_extractor_spark.datagen import e2_pdf_corpus_df
        from pdf_extractor_spark.session import get_spark

        spark = get_spark("e2pdf-datagen", master="local[32]")
        e2_pdf_corpus_df(spark, n_ids).write.mode("overwrite") \
            .parquet(pdf_path)
        spark.stop()
    import duckdb

    n_docs = duckdb.sql(
        f"select count(*) from parquet_scan('{pdf_path}/*.parquet')"
    ).fetchone()[0]

    rounds = int(os.environ.get("JOBS_PDF_ROUNDS", "1"))
    lo = hi = None

    def better(a, b):
        return b if a is None or b["docs_per_s"] > a["docs_per_s"] else a

    for _ in range(rounds):
        lo = better(lo, run_leg(2, pdf_path, repo, n_docs))
        hi = better(hi, run_leg(8, pdf_path, repo, n_docs))
    print(json.dumps({
        "lo": lo, "hi": hi, "docs": n_docs,
        "efficiency": round((hi["docs_per_s"] / lo["docs_per_s"]) / 4, 3),
    }))


if __name__ == "__main__":
    main()
