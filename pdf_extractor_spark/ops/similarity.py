"""Similarity search over embedding columns (array<float>).

* `cosine_topk` — exact brute-force baseline: broadcast the query set,
  JVM-side dot products via zip_with/aggregate (no Python), window
  top-k. Correctness oracle for the approximate path.
* `lsh_topk` — scale path: random-hyperplane signatures bucket the
  corpus; only same-bucket candidates get exact scoring. At 10^12 rows
  the bucket join replaces the O(N·Q) scan with O(candidates).
* `embedding_near_duplicates` — cosine ≥ threshold pairs via the same
  hyperplane bucketing (embedding near-dup dedup).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "query_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k neighbours per query (excluding self-matches by id).

    Plan shape: broadcast-nested-loop of corpus × queries (queries are
    small by contract), all dot products in codegen, then a per-query
    window top-k. Ties broken by neighbour id for determinism.
    """
    from .layout import rebalance_narrow

    q = F.broadcast(queries.select(F.col(q_id_col).alias("query_id"),
                                   F.col(q_vec_col).alias("q_vec")))
    # the corpus side carries every dot product — rebalance a narrow
    # scan so the scoring runs at full width (identity at real sizes)
    scored = (
        rebalance_narrow(embeddings)
        .select(F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("vec"))
        .crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("vec"), F.col("q_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _planes_lit(planes: np.ndarray) -> Column:
    """The plane matrix as one nested array expression. Every element
    is foldable, so Catalyst's ConstantFolding collapses the whole
    thing into a SINGLE Literal node at optimization time — the
    generated code references one constant array instead of unrolling
    n_planes × dim literal expressions (which cost a measured ~35 s of
    codegen/JIT per fresh JVM at ANN sizes)."""
    return F.array(*[F.array(*[F.lit(float(x)) for x in row])
                     for row in planes])


def hyperplane_signature(vec: Column, planes: np.ndarray,
                         unrolled: bool = False) -> Column:
    """Sign-of-projection bit signature as an int column per plane-group.

    Default is the data-driven form: one folded plane-matrix literal +
    higher-order functions, value-identical to the unrolled form (the
    per-plane dot product is the same zip_with/aggregate expression;
    bit weights are exact integers). `unrolled=True` keeps the round-2
    literal-per-plane expansion for the parity test."""
    if unrolled:
        bits = []
        for i, p in enumerate(planes):
            plane = F.array(*[F.lit(float(x)) for x in p])
            proj = _dot(vec, plane)
            bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
        acc = bits[0]
        for b in bits[1:]:
            acc = acc + b
        return acc.cast("long")
    pl = _planes_lit(planes)
    # bit i has weight 2^i: emit 0/1 per plane, then a reversed Horner
    # fold (acc*2 + bit) — integer-exact, same value as the sum of
    # (1 << i) terms.
    bits = F.transform(
        pl, lambda p: F.when(_dot(vec, p) >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.aggregate(
        F.reverse(bits), F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b)


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "query_id", q_vec_col: str = "q_vec",
             n_tables: int = 4, n_planes: int = 8, dim: int | None = None,
             seed: int = 42) -> DataFrame:
    """Approximate top-k: `n_tables` independent hyperplane tables of
    `n_planes` bits; candidates = corpus rows sharing a bucket with the
    query in any table; exact cosine re-scoring on candidates only.

    `dim` (embedding length) is required: inferring it from data would
    trigger a driver-side job at plan-construction time, breaking lazy
    composition (the array element type carries no length in the schema).
    """
    if dim is None:
        raise ValueError(
            "dim is required: pass the embedding length explicitly "
            "(schema carries no array length; a data probe would run a "
            "job before the real action)")
    from .layout import rebalance_narrow

    corpus = rebalance_narrow(embeddings).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    q = queries.select(F.col(q_id_col).alias("query_id"),
                       F.col(q_vec_col).alias("q_vec"))
    sig_cols_c, sig_cols_q = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        sig_cols_c.append(
            F.struct(F.lit(t).alias("table"),
                     hyperplane_signature(F.col("vec"), planes).alias("bucket")))
        sig_cols_q.append(
            F.struct(F.lit(t).alias("table"),
                     hyperplane_signature(F.col("q_vec"), planes).alias("bucket")))
    c_b = corpus.select("neighbor_id", "vec",
                        F.explode(F.array(*sig_cols_c)).alias("s")) \
                .select("neighbor_id", "vec", "s.table", "s.bucket")
    q_b = F.broadcast(
        q.select("query_id", "q_vec",
                 F.explode(F.array(*sig_cols_q)).alias("s"))
        .select("query_id", "q_vec", "s.table", "s.bucket"))
    cand = (
        c_b.join(q_b, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "neighbor_id", "vec")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("cos", cosine(F.col("vec"), F.col("q_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def fit_ivf_centroids(embeddings: DataFrame, n_cells: int = 16,
                      vec_col: str = "embedding", seed: int = 42,
                      max_iter: int = 20) -> np.ndarray:
    """IVF coarse quantizer: k-means centroids over the corpus
    (``pyspark.ml.clustering.KMeans``). This is an EXPLICIT training
    action (runs Spark jobs) — call it once offline and feed the
    centroids to `ivf_topk`, which is then a pure lazy plan. At 10^12
    rows you'd fit on a sample (`embeddings.sample(...)`); the
    assignment pass below is what must scale, not the fit."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return np.array(model.clusterCenters())


def _cell_ranking(vec: Column, centroids: np.ndarray,
                  unrolled: bool = False) -> Column:
    """Array of cell ids ordered by ascending L2 distance to `vec`.
    argmin_c |x-c|² = argmin_c (|c|² - 2·x·c) — |x|² is constant per
    row, so only the cross term + centroid norms are computed (JVM
    expressions, no Python).

    Default is data-driven: the (norm², centroid, cell) table is one
    folded literal (see `_planes_lit`); the distance arithmetic is the
    identical expression per cell, so values — and therefore the
    ranking — are bit-equal to the unrolled form."""
    if unrolled:
        cells = []
        for ci, c in enumerate(centroids):
            plane = F.array(*[F.lit(float(x)) for x in c])
            norm2 = float(np.dot(c, c))
            score = F.lit(norm2) - F.lit(2.0) * _dot(vec, plane)
            cells.append(F.struct(score.alias("d"), F.lit(ci).alias("cell")))
        ranked = F.array_sort(F.array(*cells))
        return F.transform(ranked, lambda s: s["cell"])
    table = F.array(*[
        F.struct(
            F.lit(float(np.dot(c, c))).alias("n2"),
            F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            F.lit(ci).alias("cell"))
        for ci, c in enumerate(centroids)])
    scored = F.transform(
        table,
        lambda s: F.struct(
            (s["n2"] - F.lit(2.0) * _dot(vec, s["c"])).alias("d"),
            s["cell"].alias("cell")))
    return F.transform(F.array_sort(scored), lambda s: s["cell"])


def ivf_topk(embeddings: DataFrame, queries: DataFrame,
             centroids: np.ndarray, k: int = 10, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "query_id", q_vec_col: str = "q_vec") -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cell (one pass, no shuffle of payloads); each query probes its
    `nprobe` nearest cells; exact cosine re-scoring on probed rows only.

    The scale shape: candidate count ≈ corpus × nprobe / n_cells, and
    the cell join is an equi-join on a small int key — broadcastable
    queries make it shuffle-free."""
    from .layout import rebalance_narrow

    corpus = rebalance_narrow(embeddings).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    ).withColumn(
        "cell", F.element_at(_cell_ranking(F.col("vec"), centroids), 1))
    q = queries.select(F.col(q_id_col).alias("query_id"),
                       F.col(q_vec_col).alias("q_vec"))
    q_cells = F.broadcast(
        q.withColumn(
            "cell",
            F.explode(F.slice(_cell_ranking(F.col("q_vec"), centroids),
                              1, nprobe))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        corpus.join(q_cells, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("vec"), F.col("q_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def embedding_near_duplicates(embeddings: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              n_planes: int = 12, dim: int | None = None,
                              seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup pairs via one hyperplane bucket table
    (high threshold → near-identical vectors land in the same bucket
    with high probability); exact cosine verification. `dim` required —
    see `lsh_topk`."""
    if dim is None:
        raise ValueError(
            "dim is required: pass the embedding length explicitly "
            "(schema carries no array length; a data probe would run a "
            "job before the real action)")
    from .layout import rebalance_narrow

    planes = _hyperplanes(dim, n_planes, seed)
    sig = rebalance_narrow(embeddings).select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", hyperplane_signature(F.col("vec"), planes))
    l, r = sig.alias("l"), sig.alias("r")
    cand = l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
                  & (F.col("l.doc_id") < F.col("r.doc_id"))) \
            .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
                    F.col("l.vec").alias("va"), F.col("r.vec").alias("vb"))
    return (
        cand.withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )
