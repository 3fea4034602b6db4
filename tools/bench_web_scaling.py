#!/usr/bin/env python
"""N vs 4N scaling evidence for the north rule's two extraction front
doors — the HTML boilerplate strip (`ops/boilerplate.py`) and the PDF
object-stream parse (`ops/pdfstream.py`) — matching the steal-robust
protocol of bench_scaling.py / tools/bench_curate_scaling.py:

    python tools/bench_web_scaling.py                 # 200k html / 50k pdf, pair 2,8
    WEB_DOCS=400000 PDF_DOCS=100000 WEB_PAIR=2,8 WEB_ROUNDS=2 \
        python tools/bench_web_scaling.py

Both corpora are synthesized once at local[32] and shared by every
measured JVM (html pages via the same wrap rule the driver queries
use; PDFs via datagen.gen_pdf_bytes with its per-doc representation
variants). Workloads are the tiers exactly as the curation front
doors run them: scan → mapInPandas kernel → count-forcing aggregate.
Per leg: 1 warm-up + min of the remaining iters; WEB_ROUNDS alternates
the two legs in fresh JVMs and keeps the best throughput per config
per tier. Prints one JSON line; paste into BENCH/BASELINE.md (this
script does NOT rewrite it).
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
from pyspark.sql import functions as F
spark = get_spark("web-scaling", master="local[{cpus}]",
                  shuffle_partitions=max(8, {cpus}))
from pdf_extractor_spark.ops.boilerplate import extract_main_content
from pdf_extractor_spark.ops.pdfstream import parse_pdf_pages

html = spark.read.parquet({html_path!r})
pdfs = spark.read.parquet({pdf_path!r})
n_iters = int(__import__("os").environ.get("WEB_ITERS", "3"))
best_h = best_p = float("inf")
for it in range(n_iters):
    t0 = time.time()
    n_h = (extract_main_content(html, html_col="html_text")
           .agg(F.count("*"), F.sum("n_kept")).first()[0])
    d_h = time.time() - t0
    t0 = time.time()
    n_p = parse_pdf_pages(pdfs).agg(
        F.countDistinct("doc_id"), F.count("*")).first()[0]
    d_p = time.time() - t0
    spark.catalog.clearCache()
    if it >= 1:
        best_h, best_p = min(best_h, d_h), min(best_p, d_p)
nh, np_ = html.count(), pdfs.count()
print("RESULT " + json.dumps({{
    "cpus": {cpus},
    "html_wall_s": round(best_h, 2), "html_docs": nh,
    "html_docs_per_s": round(nh / best_h, 1),
    "pdf_wall_s": round(best_p, 2), "pdf_docs": np_,
    "pdf_docs_per_s": round(np_ / best_p, 1)}}))
"""


def run_at(cpus: int, html_path: str, pdf_path: str, repo: str) -> dict:
    code = WORKLOAD.format(cpus=cpus, html_path=html_path,
                           pdf_path=pdf_path, repo=repo)
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
    n_html = int(os.environ.get("WEB_DOCS", "200000"))
    n_pdf = int(os.environ.get("PDF_DOCS", "50000"))
    pair = os.environ.get("WEB_PAIR", "2,8")
    n_lo, n_hi = (int(x) for x in pair.split(","))
    assert n_hi == 4 * n_lo, "pair must be N,4N"

    html_path = f"/tmp/spark_graft_bench/html_{n_html}"
    pdf_path = f"/tmp/spark_graft_bench/pdf_{n_pdf}"
    if not (os.path.exists(os.path.join(html_path, "_SUCCESS"))
            and os.path.exists(os.path.join(pdf_path, "_SUCCESS"))):
        from pdf_extractor_spark.datagen import documents_df, pdfs_from_documents
        from pdf_extractor_spark.queries import _wrap_html_col
        from pdf_extractor_spark.session import get_spark
        from pyspark.sql import functions as F

        spark = get_spark("web-datagen", master="local[32]")
        d = documents_df(spark, n_html)
        (d.select("doc_id",
                  _wrap_html_col(F.col("doc_id"), F.col("text"))
                  .alias("html_text"))
         .write.mode("overwrite").parquet(html_path))
        (pdfs_from_documents(d.filter(F.col("doc_id") < n_pdf))
         .write.mode("overwrite").parquet(pdf_path))
        spark.stop()

    rounds = int(os.environ.get("WEB_ROUNDS", "1"))
    lo = hi = None

    def better(a, b):
        if a is None:
            return b
        return {k: (b[k] if b[f"{t}_docs_per_s"] > a[f"{t}_docs_per_s"] else a[k])
                for t in ("html", "pdf")
                for k in (f"{t}_wall_s", f"{t}_docs", f"{t}_docs_per_s")} | {
                    "cpus": a["cpus"]}

    for _ in range(rounds):
        lo = better(lo, run_at(n_lo, html_path, pdf_path, repo))
        hi = better(hi, run_at(n_hi, html_path, pdf_path, repo))
    ratio = n_hi // n_lo
    print(json.dumps({
        "lo": lo, "hi": hi,
        "efficiency_html": round(
            (hi["html_docs_per_s"] / lo["html_docs_per_s"]) / ratio, 3),
        "efficiency_pdf": round(
            (hi["pdf_docs_per_s"] / lo["pdf_docs_per_s"]) / ratio, 3),
    }))


if __name__ == "__main__":
    main()
