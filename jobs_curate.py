"""spark-submit entry point: corpus curation, end to end.

    spark-submit --py-files dist/pdf_extractor_spark.zip jobs_curate.py \
        --documents /path/to/documents_parquet --out /path/to/out \
        --run-id c1 [--near-dup minhash|simhash|none] \
        [--min-tokens 5 --max-digit-ratio 0.2 --max-punct-ratio 0.3] \
        [--langs pt,en] [--threshold 0.8]

Stages (the `ops.curate` composition over a documents table):
  quality gate → language filter → exact dedup → near-dup pair
  generation (MinHash-LSH or SimHash) → near-dup removal →
  curated corpus + pair table + curation audit row.

Outputs under --out:
  curated/         kept documents, all input columns preserved
  near_dup_pairs/  (a, b, …) pair evidence (when --near-dup != none)
  audit/           one row: input/kept/pair counts + parameters
  stage_counts/    per-stage drop accounting (stage, n_docs): each
                   document's first failing gate — quality / language /
                   exact_dup / near_dup / kept; sums to input_docs

Optional Gopher-style repetition ceilings (--max-dup-word-frac /
--max-top-word-frac / --max-dup-bigram-frac) join the quality gate.

Web tier: pass --html-col <col> to treat that column as raw HTML —
the job then composes boilerplate strip (ops.boilerplate) with the
stages above, curating the EXTRACTED main text; curated/ additionally
carries a main_text column. Pass --pdf-col <col> instead to compose
the PDF object-stream parse (ops.pdfstream) the same way.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from pdf_extractor_spark.ops.curate import (  # noqa: E402
    curate_corpus, curation_stage_counts, extract_main_text,
    extract_pdf_text)
from pdf_extractor_spark.ops.dedup import (  # noqa: E402
    minhash_lsh_pairs, pick_minhash_shape, simhash_pairs)
from pdf_extractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--near-dup", choices=["minhash", "simhash", "none"],
                    default="minhash")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="MinHash Jaccard threshold (minhash mode)")
    ap.add_argument("--max-hamming", type=int, default=3,
                    help="SimHash hamming radius (simhash mode)")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-digit-ratio", type=float, default=0.2)
    ap.add_argument("--max-punct-ratio", type=float, default=0.3)
    ap.add_argument("--max-dup-word-frac", type=float, default=None)
    ap.add_argument("--max-top-word-frac", type=float, default=None)
    ap.add_argument("--max-dup-bigram-frac", type=float, default=None)
    ap.add_argument("--langs", default="pt,en")
    ap.add_argument("--html-col", default=None,
                    help="treat this column as raw HTML: boilerplate-"
                         "strip it first (web tier) and curate the "
                         "extracted main text")
    ap.add_argument("--pdf-col", default=None,
                    help="treat this column as PDF bytes: parse the "
                         "object streams (pdf tier) and curate the "
                         "reassembled page text")
    args = ap.parse_args()
    if args.html_col and args.pdf_col:
        ap.error("--html-col and --pdf-col are mutually exclusive")

    spark = get_spark(f"curate-{args.run_id}")
    out = args.out.rstrip("/")
    raw = spark.read.parquet(args.documents).persist()
    orig_id = args.id_col
    extracted = args.html_col or args.pdf_col
    if args.html_col:
        # composed web tier: scan → mapInPandas boilerplate strip →
        # everything below (gates, dedup, pairs) runs on main text.
        # Persisted because pairs + curate + stage counts all read it —
        # the flatten kernel must run once, not per consumer.
        docs = extract_main_text(raw, html_col=args.html_col,
                                 id_col=args.id_col).persist()
        args.id_col, args.text_col = "doc_id", "text"
    elif args.pdf_col:
        # composed pdf tier: scan → mapInPandas object-stream parse →
        # one keyed exchange reassembling pages → gates/dedup
        docs = extract_pdf_text(raw, pdf_col=args.pdf_col,
                                id_col=args.id_col).persist()
        args.id_col, args.text_col = "doc_id", "text"
    else:
        docs = raw
    n_in = docs.count()          # warms the persist; also the audit row

    if args.near_dup == "minhash":
        # the scale-safe single-exchange plan becomes the default once
        # the corpus outgrows the shared-distinct shingle exchange
        pairs = minhash_lsh_pairs(docs, id_col=args.id_col,
                                  text_col=args.text_col,
                                  threshold=args.threshold,
                                  scale_shape=pick_minhash_shape(n_in))
    elif args.near_dup == "simhash":
        pairs = simhash_pairs(docs, id_col=args.id_col,
                              text_col=args.text_col,
                              max_hamming=args.max_hamming)
    else:
        pairs = None
    if pairs is not None:
        # materialized once: pair evidence is both an output artifact
        # and the anti-join input of the kept-set below
        pairs = pairs.persist()
        pairs.write.mode("overwrite").parquet(f"{out}/near_dup_pairs")

    gate_kwargs = dict(
        id_col=args.id_col, text_col=args.text_col,
        min_tokens=args.min_tokens,
        max_digit_ratio=args.max_digit_ratio,
        max_punct_ratio=args.max_punct_ratio,
        keep_langs=tuple(args.langs.split(",")),
        max_dup_word_frac=args.max_dup_word_frac,
        max_top_word_frac=args.max_top_word_frac,
        max_dup_bigram_frac=args.max_dup_bigram_frac)
    kept = curate_corpus(docs, near_dup_pairs=pairs, **gate_kwargs)
    if extracted:
        # curated output = original columns + the extracted main_text
        curated = raw.join(
            docs.join(kept.select("doc_id"), "doc_id", "left_semi")
            .select(F.col("doc_id").alias(orig_id),
                    F.col("text").alias("main_text")),
            orig_id)
    else:
        curated = docs.join(
            kept.select(F.col("doc_id").alias(args.id_col)),
            args.id_col, "left_semi")
    curated.write.mode("overwrite").parquet(f"{out}/curated")

    n_kept = curated.count()
    n_pairs = pairs.count() if pairs is not None else 0
    audit = spark.createDataFrame(
        [(args.run_id, n_in, n_kept, n_pairs, args.near_dup,
          args.min_tokens, float(args.max_digit_ratio),
          float(args.max_punct_ratio), args.langs)],
        "run_id string, input_docs long, kept_docs long, "
        "near_dup_pairs long, near_dup_mode string, min_tokens int, "
        "max_digit_ratio double, max_punct_ratio double, langs string")
    audit.withColumn("audit_ts", F.current_timestamp()) \
        .write.mode("append").parquet(f"{out}/audit")

    # per-stage drop accounting — second audit artifact; `kept` here
    # must (and does, by construction + tests) equal kept_docs above
    stages = curation_stage_counts(docs, near_dup_pairs=pairs,
                                   **gate_kwargs)
    (stages.withColumn("run_id", F.lit(args.run_id))
     .write.mode("append").parquet(f"{out}/stage_counts"))

    print(f"[{args.run_id}] curated {n_kept}/{n_in} documents "
          f"({n_pairs} near-dup pairs) → {out}")


if __name__ == "__main__":
    main()
