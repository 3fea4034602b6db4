"""End-to-end corpus curation: the composed training-data pipeline
(quality gate → language filter → exact dedup → near-dup removal) that
the individual ops in ``textstats``/``dedup`` exist to serve.

Stage order and mechanics (the standard web-corpus shape):

1. **Quality gate** — token floor + digit/punct ceilings. One pass of
   codegen'd expressions over the scan; at 100 TB this is the cheapest
   stage and removes the most bytes, so it runs first (filters push
   into the parquet scan's output immediately).
2. **Language filter** — stopword-vote lang id, keep an allow-list.
   Same pass as (1): Catalyst collapses both into one projection.
3. **Exact dedup** — keep the minimum doc_id per normalized-content
   md5 group. One uniform-hash shuffle (window over the digest).
4. **Near-dup removal** — anti-join against the `b` side of a
   near-duplicate pair table (callers supply
   ``dedup.minhash_lsh_pairs``/``simhash_pairs``/
   ``similarity.embedding_near_duplicates`` output — the pair
   generator stays pluggable). Pairs carry a < b, so dropping every
   `b` keeps exactly one representative (the smallest id) per
   duplicate chain. The pair table is ≪ corpus by construction
   (bucketed + capped candidates); AQE broadcasts the anti-join when
   it is small, and falls back to a shuffled anti-join when it is not.

Everything is lazy DataFrame composition — no action is triggered
here, and no stage materializes the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text

# parity-safe stopword alternations (ASCII \b semantics identical in
# Java regex and DuckDB's RE2 — single-letter and prefix-ambiguous
# words excluded): the same lists the oracled lang-id query pins.
PT_WORDS = "de|da|do|que|em|para|com|uma|os|as|dos|das|no|na|por|se"
EN_WORDS = "the|of|and|to|in|is|that|it|for|on|was|with|as|at|by|be|this"


def _barrier_filter(df: DataFrame, pred) -> DataFrame:
    """`df.filter(pred)` with predicate pushdown blocked.

    The quality/lang predicate is built from expensive derived
    expressions (4 regex passes + split per doc). Catalyst pushes
    filters toward the source, splitting conjunctions and substituting
    the full feature expressions — measured at the sf1.0 replica, the
    predicate landed BELOW the `rebalance_narrow` round-robin exchange,
    re-running every regex on the unsplittable one-row-group scan on a
    single core (5.7 s vs 0.66 s for the same features evaluated wide),
    and duplicating them against the Project above. Guide §4.4: the
    optimizer may not reorder or duplicate past a non-deterministic
    expression, so the predicate is wrapped as ONE un-splittable
    CASE WHEN with a non-deterministic guard:
    `WHEN spark_partition_id() >= -1 THEN pred ELSE false`. Partition
    ids are non-negative, so this evaluates exactly `pred` — results
    byte-identical — while the filter stays pinned where it is
    written: above the exchange, in the same codegen stage as the
    feature projection. Two shapes that do NOT work, measured:
    `rand() >= -1 AND pred` (Spark 4 knows rand's value range,
    simplifies the guard to true, and the rest pushes as before) and
    `spark_partition_id() >= -1 AND pred` (Catalyst splits the
    conjunction and pushes the deterministic conjuncts on their own).

    At 100 TB (rebalance is identity) the gate already fused into the
    scan stage; the only loss is the parquet IsNotNull(text) pushdown,
    which skips nothing on real corpora."""
    guarded = F.when(F.spark_partition_id() >= F.lit(-1),
                     pred).otherwise(F.lit(False))
    return df.filter(guarded)


def _gate_features(docs: DataFrame, id_col: str, text_col: str,
                   with_repetition: bool) -> DataFrame:
    """The shared single-projection feature pass behind `curate_corpus`
    and `curation_stage_counts` (everything collapses into the scan)."""
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_tokens = (F.when(trimmed == "", 0)
                .otherwise(F.size(F.split(trimmed, r"\s+"))))
    n_chars = F.length(t)
    safe_chars = F.greatest(n_chars, F.lit(1))
    digit_ratio = F.length(F.regexp_replace(t, r"[^0-9]", "")) / safe_chars
    punct_ratio = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")) / safe_chars
    pt = F.size(F.regexp_extract_all(
        t, F.lit(rf"(?i)\b({PT_WORDS})\b"), F.lit(0)))
    en = F.size(F.regexp_extract_all(
        t, F.lit(rf"(?i)\b({EN_WORDS})\b"), F.lit(0)))
    lang_pred = (F.when((pt == 0) & (en == 0), "und")
                 .when(pt >= en, "pt").otherwise("en"))

    cols = [
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("bigint").alias("n_tokens"),
        digit_ratio.alias("digit_ratio"),
        punct_ratio.alias("punct_ratio"),
        lang_pred.alias("lang_pred"),
        F.md5(normalize_text(t)).alias("content_hash"),
    ]
    if with_repetition:
        from .textstats import repetition_cols

        cols += [c.alias(name) for name, c in repetition_cols(t).items()]
    return docs.select(*cols)


def _quality_pred(min_tokens: int, max_digit_ratio: float,
                  max_punct_ratio: float,
                  max_dup_word_frac: float | None,
                  max_top_word_frac: float | None,
                  max_dup_bigram_frac: float | None):
    pred = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("digit_ratio") <= max_digit_ratio)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
    # Gopher-style repetition ceilings — optional extra quality gates,
    # same codegen pass as the ratio gates (no extra scan or shuffle)
    if max_dup_word_frac is not None:
        pred = pred & (F.col("dup_word_frac") <= max_dup_word_frac)
    if max_top_word_frac is not None:
        pred = pred & (F.col("top_word_frac") <= max_top_word_frac)
    if max_dup_bigram_frac is not None:
        pred = pred & (F.col("dup_bigram_frac") <= max_dup_bigram_frac)
    return pred


def extract_main_text(pages: DataFrame, html_col: str = "html_text",
                      id_col: str = "doc_id",
                      with_metrics: bool = False) -> DataFrame:
    """Web-tier front door: boilerplate-strip each HTML page
    (``ops.boilerplate.extract_main_content``) and return the
    (doc_id, text) shape every curation / dedup / textstats op
    consumes — so `extract → gate → dedup` composes as ONE lazy plan:
    scan → mapInPandas flatten (shuffle-free) → codegen'd gates, with
    the dedup exchanges operating on extracted main text only.

    `with_metrics` adds the north rule's per-document extraction
    metrics — node / kept-block / span counts plus the task partition
    that parsed the doc (captured BEFORE any exchange, so it names the
    extraction task, i.e. real lineage)."""
    from .boilerplate import extract_main_content
    from .layout import rebalance_narrow

    ext = extract_main_content(rebalance_narrow(pages),
                               html_col=html_col, id_col=id_col)
    cols = [F.col(id_col).alias("doc_id"),
            F.col("main_text").alias("text")]
    if with_metrics:
        cols += [F.col("n_nodes"), F.col("n_kept"),
                 F.size("spans").alias("n_spans"),
                 F.spark_partition_id().alias("partition_id")]
    return ext.select(*cols)


def extract_pdf_text(pages: DataFrame, pdf_col: str = "pdf",
                     id_col: str = "doc_id",
                     with_metrics: bool = False) -> DataFrame:
    """PDF-tier front door: parse each document's PDF bytes
    (``ops.pdfstream.parse_pdf_docs``) into the (doc_id, text) shape
    the curation stack consumes.

    The input contract carries WHOLE PDFs per row, so every page of a
    document comes out of one kernel call and the page → document
    reassembly is kernel-local: the whole tier is scan → mapInPandas
    with zero exchanges, the same plan shape as the HTML front door
    (and stream-safe for the same reason). `parse_pdf_pages` + a keyed
    aggregation remains available for inputs where pages genuinely
    arrive as separate rows.

    `with_metrics` adds pages parsed / line / operator / decode-failure
    counts per document plus the parse task's partition id (captured
    in the same shuffle-free stage)."""
    from .pdfstream import parse_pdf_docs

    parsed = parse_pdf_docs(pages, pdf_col=pdf_col, id_col=id_col)
    cols = ["doc_id", "text"]
    if with_metrics:
        parsed = parsed.withColumn("partition_id", F.spark_partition_id())
        cols += ["n_pages", "n_lines", "n_ops", "decode_failures",
                 "partition_id"]
    return parsed.select(*cols)


def qualified_hashes(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", min_tokens: int = 5,
                     max_digit_ratio: float = 0.2,
                     max_punct_ratio: float = 0.3,
                     keep_langs: tuple[str, ...] = ("pt", "en"),
                     max_dup_word_frac: float | None = None,
                     max_top_word_frac: float | None = None,
                     max_dup_bigram_frac: float | None = None) -> DataFrame:
    """Distinct (content_hash) of gate-surviving docs — the exact-dedup
    state a resumable curation job persists: the next increment passes
    it as `seen_hashes` so cross-run duplicates drop without rescanning
    old data. Gate-surviving (not kept): the within-batch dedup window
    counts qualified docs, so batch/incremental equivalence needs every
    qualified hash, including ones whose doc was later deduped."""
    rep = any(x is not None for x in
              (max_dup_word_frac, max_top_word_frac, max_dup_bigram_frac))
    feat = _gate_features(docs, id_col, text_col, with_repetition=rep)
    return (_barrier_filter(
        feat,
        _quality_pred(min_tokens, max_digit_ratio, max_punct_ratio,
                      max_dup_word_frac, max_top_word_frac,
                      max_dup_bigram_frac)
        & F.col("lang_pred").isin(*keep_langs))
        .select("content_hash").distinct())


def curate_corpus(docs: DataFrame, near_dup_pairs: DataFrame | None = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  min_tokens: int = 5, max_digit_ratio: float = 0.2,
                  max_punct_ratio: float = 0.3,
                  keep_langs: tuple[str, ...] = ("pt", "en"),
                  max_dup_word_frac: float | None = None,
                  max_top_word_frac: float | None = None,
                  max_dup_bigram_frac: float | None = None,
                  seen_hashes: DataFrame | None = None) -> DataFrame:
    """Returns the curated corpus as (doc_id, lang_pred, n_tokens).

    `near_dup_pairs`: optional (a, b, …) DataFrame with a < b; every
    doc appearing as `b` is dropped (stage 4). Pass the output of any
    pair generator from ``ops.dedup`` / ``ops.similarity``.

    The three `max_*_frac` ceilings are Gopher-style repetition gates
    (see ``textstats.repetition_cols``); None disables a ceiling. They
    join stage 1 — same single projection, filters still push to the
    scan.

    `seen_hashes`: optional (content_hash) table of gate-surviving
    docs from PREVIOUS runs (incremental curation): a doc whose hash
    already appears there is an exact duplicate of an earlier doc and
    drops before the within-batch dedup window. With crawl-ordered ids
    (new ids > old), batch-over-union and incremental runs keep the
    same set.
    """
    rep = any(x is not None for x in
              (max_dup_word_frac, max_top_word_frac, max_dup_bigram_frac))
    feat = _gate_features(docs, id_col, text_col, with_repetition=rep)
    gated = _barrier_filter(
        feat,
        _quality_pred(min_tokens, max_digit_ratio, max_punct_ratio,
                      max_dup_word_frac, max_top_word_frac,
                      max_dup_bigram_frac)
        & F.col("lang_pred").isin(*keep_langs)
    )
    if seen_hashes is not None:
        gated = gated.join(seen_hashes.select("content_hash"),
                           "content_hash", "left_anti")
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    exact_kept = (gated.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1))
    out = exact_kept.select("doc_id", "lang_pred", "n_tokens")
    if near_dup_pairs is not None:
        # join strategy stays with the optimizer: the pair table is
        # usually tiny (bucketed + capped candidate generation) and AQE
        # broadcasts it, but at extreme corpus sizes a pair set can
        # outgrow the driver — forcing a broadcast hint here would turn
        # that into an OOM instead of a (correct) shuffled anti-join.
        drop = near_dup_pairs.select(F.col("b").alias("doc_id")).distinct()
        out = out.join(drop, "doc_id", "left_anti")
    return out


def curation_stage_counts(docs: DataFrame,
                          near_dup_pairs: DataFrame | None = None,
                          id_col: str = "doc_id", text_col: str = "text",
                          min_tokens: int = 5, max_digit_ratio: float = 0.2,
                          max_punct_ratio: float = 0.3,
                          keep_langs: tuple[str, ...] = ("pt", "en"),
                          max_dup_word_frac: float | None = None,
                          max_top_word_frac: float | None = None,
                          max_dup_bigram_frac: float | None = None,
                          seen_hashes: DataFrame | None = None
                          ) -> DataFrame:
    """Per-stage drop accounting for the curation pipeline: one row per
    stage — quality / language / exact_dup / near_dup / kept — with the
    number of documents whose FIRST failing stage it is. The counts sum
    to the input count, and `kept` equals ``curate_corpus``'s row count
    under identical parameters (asserted in tests).

    Single-pass plan: the same scan-side feature projection, one
    conditional running count over the content-hash window (the same
    exchange the dedup stage already pays — a doc's position among the
    *qualified* members of its hash group), one left join against the
    pair table's drop side, then a tiny stage aggregation. No second
    scan of the corpus.
    """
    rep = any(x is not None for x in
              (max_dup_word_frac, max_top_word_frac, max_dup_bigram_frac))
    feat = _gate_features(docs, id_col, text_col, with_repetition=rep)
    quality_ok = _quality_pred(min_tokens, max_digit_ratio, max_punct_ratio,
                               max_dup_word_frac, max_top_word_frac,
                               max_dup_bigram_frac)
    lang_ok = F.col("lang_pred").isin(*keep_langs)
    qualified = (quality_ok & lang_ok).cast("int")
    # position among qualified docs in the hash group (doc_id order):
    # qualified doc with pos 1 is the exact-dedup survivor
    w = (Window.partitionBy("content_hash").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # coalesce to false: a null predicate (e.g. null text) drops the
    # doc in curate_corpus's filter, so it must attribute to the gate
    # stage here too, not fall through the when-chain
    staged = feat.select(
        "doc_id", "content_hash",
        F.coalesce(quality_ok, F.lit(False)).alias("quality_ok"),
        F.coalesce(lang_ok, F.lit(False)).alias("lang_ok"),
        (F.sum(qualified).over(w)).alias("q_pos"),
    )
    if seen_hashes is not None:
        # incremental: a hash already gate-surviving in a previous run
        # makes every qualified member of the group an exact dup.
        # distinct: appended state may carry a hash twice; a plain
        # left join would then fan staged rows out
        staged = staged.join(
            seen_hashes.select("content_hash").distinct()
            .withColumn("seen_before", F.lit(True)),
            "content_hash", "left")
    else:
        staged = staged.withColumn("seen_before",
                                   F.lit(None).cast("boolean"))
    if near_dup_pairs is not None:
        drop = (near_dup_pairs.select(F.col("b").alias("doc_id"))
                .distinct().withColumn("near_dropped", F.lit(True)))
        staged = staged.join(drop, "doc_id", "left")
    else:
        staged = staged.withColumn("near_dropped", F.lit(None).cast("boolean"))
    stage = (
        F.when(~F.col("quality_ok"), "quality")
        .when(~F.col("lang_ok"), "language")
        .when((F.col("q_pos") > 1)
              | F.coalesce("seen_before", F.lit(False)), "exact_dup")
        .when(F.coalesce("near_dropped", F.lit(False)), "near_dup")
        .otherwise("kept")
    )
    return (staged.groupBy(stage.alias("stage"))
            .agg(F.count("*").alias("n_docs")))


def deterministic_sample(docs: DataFrame, rates: DataFrame,
                         id_col: str = "doc_id",
                         source_col: str = "source",
                         salt: str = "v1") -> DataFrame:
    """Mixture sampling: keep each row with its source's rate, decided
    by a content-hash threshold instead of an RNG —
    ``md5(doc_id|salt)`` 's first 32 bits, uniform on [0, 2^32).

    Properties the RNG approach lacks: the SAME rows are kept on every
    run, on any cluster, at any partitioning (reproducible corpus
    builds, diffable across rate changes — raising a source's rate only
    ADDS rows); changing `salt` redraws the sample. `rates` is a
    (source, rate) dimension — tiny, broadcast by the optimizer.
    """
    threshold = (F.col("rate") * F.lit(float(1 << 32)))
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col(id_col).cast("string"),
                                      F.lit(salt))), 1, 8),
        16, 10).cast("decimal(20,0)").cast("double")
    return (docs.join(rates, source_col)
            .filter(h < threshold)
            .drop("rate"))
