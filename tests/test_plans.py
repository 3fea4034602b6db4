"""Physical-plan shape assertions: the optimizations we claim must be
visible in `.explain` output — pushdown/pruning at the scan, broadcast
on small sides, no stray shuffles in the kernels."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark import queries as Q
from pdf_extractor_spark.engine2 import pipeline as e2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_scan_column_pruning_and_filter_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = (li.filter(F.col("l_shipdate") <= "1997-09-01")
          .select("l_orderkey", "l_extendedprice"))
    plan = _formatted(df)
    # only the needed columns reach the scan; the filter is pushed down
    assert "l_quantity" not in plan.split("ReadSchema")[-1]
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[-1].split("\n")[0]


def test_rules_join_is_broadcast(spark, sf_dir):
    from pdf_extractor_spark import datagen
    from pdf_extractor_spark.engine1 import pipeline as e1

    pages = spark.createDataFrame(datagen.corpus_pandas(8))
    ml = e1.matched_lines(e1.classify_pages(e1.explode_pages(pages)))
    plan = _plan(ml)
    assert "Broadcast" in plan  # 13-rule dimension broadcast, no shuffle join


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(Q.QUERIES["j1_region_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # customer/nation/region


def test_e2_kernel_is_shuffle_free(spark):
    from pdf_extractor_spark import datagen

    pages = spark.createDataFrame(datagen.corpus_pandas(8))
    long_df = e2.extract_ficha(pages)
    plan = _plan(long_df)
    # one round-robin repartition before the kernel, nothing keyed —
    # no aggregation/join shuffles inside the extraction itself
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 2


def test_lsh_plan_build_triggers_no_job(spark, sf_dir):
    """Building the ANN plans must not run a driver-side probe job
    (dim is a required parameter, not inferred via .first())."""
    from pdf_extractor_spark.ops import similarity

    sc = spark.sparkContext
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(3).select(F.col("vec_id").alias("query_id"),
                            F.col("embedding").alias("q_vec"))
    sc.setJobGroup("lsh-plan-build", "plan construction only")
    try:
        df1 = similarity.lsh_topk(emb, q, k=3, dim=64)
        df2 = similarity.embedding_near_duplicates(emb, dim=64)
        assert df1 is not None and df2 is not None
        assert sc.statusTracker().getJobIdsForGroup("lsh-plan-build") == []
    finally:
        sc.setJobGroup("lsh-plan-sanity", "mechanism sanity")
    # sanity: the tracker does see jobs once an action runs
    df1.count()
    assert sc.statusTracker().getJobIdsForGroup("lsh-plan-sanity") != []


def test_zero_fill_dim_is_broadcast(spark):
    from pdf_extractor_spark import datagen

    pages = spark.createDataFrame(datagen.corpus_pandas(8))
    vals = e2.values_table(e2.extract_ficha(pages))
    ser = e2.series_for_code(vals, "3123-Base", (2019, 1), (2019, 12))
    assert "BroadcastNestedLoopJoin" in _plan(ser) or \
        "BroadcastHashJoin" in _plan(ser)


def test_boilerplate_flatten_shuffle_free(spark, sf_dir):
    """The HTML flatten pass must be scan → (project) → mapInArrow —
    no exchange before the Python tokenizer (same contract as the
    Engine-2 WBX2 kernel), and the density scoring/keep rule must stay
    in the same stage (no exchange after it either)."""
    from pdf_extractor_spark.ops.boilerplate import extract_main_content

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        "doc_id", F.concat(F.lit("<p>"), "text", F.lit("</p>"))
        .alias("html_text"))
    plan = _plan(extract_main_content(pages))
    assert "MapInArrow" in plan
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan


def test_minhash_scale_shape_single_exchange(spark, sf_dir):
    """With dedup_shingles=False the signature aggregation must be the
    one-exchange shape: map-side partial min, then a single
    hashpartitioning(doc_id) exchange carrying 64 longs per doc —
    never a full-width distinct of shingle strings."""
    from pdf_extractor_spark.ops import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lean = dedup.minhash_signatures(docs, dedup_shingles=False)
    assert _plan(lean).count("Exchange hashpartitioning") == 1
    # dedup_shingles=True compiles to the SAME single-exchange plan
    # when signatures are built standalone: Spark 4's
    # RemoveRedundantAggregates drops the distinct beneath the
    # duplicate-agnostic min. The flag only matters inside
    # minhash_lsh_pairs, where the distinct subtree is shared with the
    # verify stage (ReusedExchange) and must not be eliminated.
    shared = dedup.minhash_signatures(docs, dedup_shingles=True)
    assert _plan(shared).count("Exchange hashpartitioning") == 1


def test_contamination_no_corpus_exchange_before_join(spark, sf_dir):
    """Corpus shingles must flow straight into the broadcast join (no
    pre-join distinct exchange); the only keyed exchanges belong to the
    post-join countDistinct over colliding rows."""
    from pdf_extractor_spark.ops import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.limit(5).select(F.col("doc_id").alias("eval_id"), "text")
    df = dedup.contamination_flags(docs, ev)
    plan = _plan(df)
    assert "BroadcastExchange" in plan      # eval side broadcast
    assert plan.count("Exchange hashpartitioning") <= 2


def test_corpus_proportional_joins_not_hinted(spark):
    """A6's adjustment table (one row per url/year/month) and A8's
    include-flag table (one row per url) grow with the corpus — a
    forced broadcast hint would OOM at 10^9 urls. The strategy must be
    left to AQE: no ResolvedHint in the optimized logical plan, while
    at sandbox scale AQE still picks a broadcast join on its own."""
    from pdf_extractor_spark import datagen

    pages = spark.createDataFrame(datagen.corpus_pandas(8))
    vals = e2.values_table(e2.extract_ficha(pages))

    adjusted = e2.apply_vacation_adjustments_df(vals)
    cart = e2.cartoes_table(vals, (2019, 1), (2019, 12))
    for df in (adjusted, cart):
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical
        assert "UnresolvedHint" not in logical
    # AQE still broadcasts the small side at this scale
    cart.collect()
    plan = _plan(cart)
    final = plan.split("Initial Plan")[0]
    assert "BroadcastHashJoin" in final


def test_curate_near_dup_anti_join_broadcasts(spark, sf_dir):
    """The near-dup removal must be a broadcast LEFT ANTI join (pairs
    ≪ corpus by construction) and the quality+lang feature pass must
    collapse into the scan-side projection, not extra exchanges."""
    from pdf_extractor_spark.ops.curate import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    df = curate_corpus(docs, near_dup_pairs=pairs)
    # strategy is left to AQE (a forced hint would OOM on huge pair
    # sets): execute, then assert the FINAL adaptive plan broadcast the
    # small side
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    final = plan.split("Initial Plan")[0]  # drop AQE's pre-plan echo
    anti = [ln for ln in final.splitlines() if "LeftAnti" in ln]
    assert anti and all("Broadcast" in ln for ln in anti)
    # keyed exchanges: the exact-dedup window over the content hash,
    # plus at most the tiny pair-table's own distinct — no shuffle for
    # the gates (fused into the scan-side Filter/Project) or anti-join
    assert final.count("Exchange hashpartitioning") <= 2
    assert "WindowGroupLimit" in final  # partial top-1 before the exchange


def test_dim_df_keeps_union_estimate_honest(spark, sf_dir):
    """Literal dimension tables must come from ops.layout.dim_df:
    createDataFrame plans a node with sizeInBytes=Long.Max, and a union
    with one such branch inherits the estimate, silently disabling the
    rebalance_narrow gate AND broadcast-join selection for the whole
    corpus (measured 3x on the planted MinHash pass at the sf1.0
    shape)."""
    from pdf_extractor_spark.ops.layout import dim_df
    from pdf_extractor_spark.queries import _planted_curation_corpus

    rows = [(3000000, "1 2 3"), (3000001, "1 2 3 4 5 6")]
    lit = dim_df(spark, rows, "doc_id long, text string")
    assert [tuple(r) for r in lit.orderBy("doc_id").collect()] == rows
    est = int(str(lit._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes()))
    assert est < 10_000  # honest bytes, not Long.Max

    planted = _planted_curation_corpus(spark, sf_dir)
    pest = int(str(planted._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes()))
    assert pest < (1 << 40)  # corpus-sized estimate survives the union
    # and the narrow-input rebalance actually fired on the testdata
    assert "RoundRobinPartitioning" in _plan(planted)


def test_curate_gate_filter_not_pushed_below_rebalance(spark, sf_dir):
    """The quality/lang gate predicate re-evaluates every regex
    feature; pushed below the round-robin exchange it runs on the
    unsplittable one-row-group scan on ONE core (measured 5.7 s vs
    0.66 s at the sf1.0 shape). ops.curate._barrier_filter pins it
    above the exchange; this asserts no regex feature evaluation
    remains below the RoundRobin exchange."""
    from pdf_extractor_spark.ops.curate import curate_corpus
    from pdf_extractor_spark.queries import _planted_curation_corpus

    df = curate_corpus(_planted_curation_corpus(spark, sf_dir))
    plan = _plan(df)
    assert "SPARK_PARTITION_ID" in plan  # the non-deterministic guard
    rr = plan.find("Exchange RoundRobinPartitioning")
    assert rr != -1
    below = plan[rr:]  # tree printed top-down: below-exchange = after
    assert "regexp_extract_all" not in below
    assert "regexp_replace" not in below
