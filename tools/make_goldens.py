#!/usr/bin/env python
"""Regenerate goldens/sf0_01/*.parquet from the pure-Python golden
oracle (no Spark). Run after any change to datagen, oracle_ref, or the
dedup/similarity/multimodal ops:

    python tools/make_goldens.py [--sf-dir /root/testdata/sf0.01]

The driver's correctness gate reads these via DuckDB read_parquet; the
gate (and tests/test_driver_gate.py) fails loudly if they go stale.
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdf_extractor_spark import golden_oracle as G  # noqa: E402

SCHEMAS = {
    "multimodal_features": pa.schema([
        ("doc_id", pa.int64()), ("media_type", pa.string()),
        ("n_bytes", pa.int64()), ("feature_fp", pa.string()),
        ("decode_ok", pa.bool_())]),
    "dedup_minhash_lsh": pa.schema([
        ("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
    "dedup_simhash": pa.schema([
        ("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int32())]),
    "sim_lsh_topk": pa.schema([
        ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
        ("rank", pa.int32())]),
    "dedup_ngram_jaccard": pa.schema([
        ("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
    "curate_neardup_pairs": pa.schema([
        ("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
    "web_neardup_pairs": pa.schema([
        ("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
    "sim_embedding_neardup": pa.schema([
        ("a", pa.int64()), ("b", pa.int64()), ("cos", pa.float64())]),
    "sim_ivf_topk": pa.schema([
        ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
        ("rank", pa.int32()), ("cos", pa.float64())]),
    "extract_e1_values": pa.schema([
        ("url", pa.string()), ("folha_type", pa.string()),
        ("year", pa.int32()), ("month", pa.int32()),
        ("excel_col", pa.string()), ("value_num", pa.float64()),
        ("value_txt", pa.string())]),
    "extract_e1_person_names": pa.schema([
        ("url", pa.string()), ("person_name", pa.string())]),
    "extract_e2_proventos": pa.schema([
        ("url", pa.string()), ("year", pa.int32()), ("month", pa.int32()),
        ("mes_ano", pa.string()), ("valor", pa.string())]),
    "extract_main_content": pa.schema([
        ("doc_id", pa.int64()), ("main_text", pa.string()),
        ("spans_fp", pa.string()), ("n_nodes", pa.int32()),
        ("n_kept", pa.int32())]),
    "extract_audit_metrics": pa.schema([
        ("url", pa.string()), ("pages", pa.int32()),
        ("decode_failures", pa.int32()), ("conflicts", pa.int32()),
        ("carry_expired", pa.int32()), ("person", pa.string()),
        ("run_id", pa.string())]),
}


def build_goldens(sf_dir: str, n_corpus_docs: int) -> dict[str, list[dict]]:
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    embs = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    embs = [(i, [float(x) for x in v]) for i, v in embs]
    return {
        "multimodal_features": G.multimodal_features_golden(docs),
        "dedup_minhash_lsh": G.dedup_minhash_golden(docs, threshold=0.8),
        "dedup_simhash": G.dedup_simhash_golden(docs, max_hamming=3),
        "sim_lsh_topk": G.sim_lsh_topk_golden(embs),
        "dedup_ngram_jaccard": G.dedup_ngram_golden(docs, threshold=0.5),
        "curate_neardup_pairs": G.curate_neardup_pairs_golden(docs),
        "web_neardup_pairs": G.web_neardup_pairs_golden(docs),
        "sim_embedding_neardup": G.sim_embedding_neardup_golden(embs),
        "sim_ivf_topk": G.sim_ivf_topk_golden(embs),
        "extract_main_content": G.extract_main_content_golden(docs),
        "extract_e1_values": G.e1_values_golden(n_corpus_docs),
        "extract_e1_person_names": G.e1_person_names_golden(n_corpus_docs),
        "extract_e2_proventos": G.e2_proventos_golden(n_corpus_docs),
        "extract_audit_metrics": G.audit_metrics_golden(n_corpus_docs),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "goldens", "sf0_01"))
    ap.add_argument("--n-corpus-docs", type=int, default=200,
                    help="queries._corpus_docs_for of the sf dir")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    goldens = build_goldens(args.sf_dir, args.n_corpus_docs)
    for name, rows in goldens.items():
        table = pa.Table.from_pylist(rows, schema=SCHEMAS[name])
        path = os.path.join(args.out, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"{name}: {len(rows)} rows → {path}")


if __name__ == "__main__":
    main()
