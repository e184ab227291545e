"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:
- ``cosine_topk``      — brute-force exact top-k: the correctness baseline.
  O(N·M) pairs; at scale you bound the query side (batch of queries vs the
  corpus) and let Spark broadcast the smaller side.
- ``lsh_ann_topk``     — random-hyperplane LSH: sign-bucket the corpus, then
  search only within buckets (optionally multi-probe). Linear scans per
  bucket; the scale path for corpus×corpus self-similarity.

All vector math is JVM-side (functions/vector.py) — no Python UDF in the
hot path; hyperplanes are derived deterministically from md5 so runs are
reproducible across engines and cluster sizes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from drill_calcite_spark.functions.vector import cosine, dot, l2_norm


def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    return df.withColumn(out, l2_norm(F.col(vec_col)))


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors by cosine for every query vector (self-matches
    excluded). Norms are computed once per side BEFORE the pair join so the
    N×M stage does one fold per pair, not three. Ties break on neighbor id.

    Output: (query_id, neighbor_id, rank, cos).
    """
    q = _with_norm(queries, vec_col, "__nq").select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__vq"), "__nq"
    )
    c = _with_norm(corpus, vec_col, "__nc").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__vc"), "__nc"
    )
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id",
        cosine(F.col("__vq"), F.col("__vc"), F.col("__nq"), F.col("__nc"))
        .alias("__cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("__cos", 6).alias("cos"))
    )


def hyperplanes(num_planes: int, dim: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5(table ‖ plane ‖
    counter): each digest yields 16 signed byte weights. Reproducible
    everywhere, no RNG state to ship to executors."""
    planes = []
    for p in range(num_planes):
        w: list[float] = []
        counter = 0
        while len(w) < dim:
            h = hashlib.md5(f"{table}:{p}|{counter}".encode()).digest()
            w.extend(b - 127.5 for b in h)
            counter += 1
        planes.append(w[:dim])
    return planes


def _planes_flat_lit(tables: "list[int]", num_planes: int, dim: int) -> F.Column:
    """ALL requested tables' hyperplanes as ONE flat array literal VALUE
    (table-major, then plane-major).

    The round-5 form unrolled every weight into its own ``F.lit`` node —
    ``tables × planes × dim`` expression nodes, a Catalyst plan explosion
    at production dims (768-4096 × 16 planes ≈ 10⁵-10⁶ nodes). A flat
    numpy literal is a single Literal node carrying the doubles as data
    (nested list literals unroll in PySpark and 2-D arrays are
    unsupported, so flat + per-plane ``slice`` it is); plan size is O(1)
    in tables × planes × dim. The per-plane slice feeds the same
    ordered-fold ``dot`` as before — identical products in identical
    order — so the md5-replaying SQL oracles are unaffected."""
    import numpy as np

    flat = [x for t in tables for w in hyperplanes(num_planes, dim, t)
            for x in w]
    return F.lit(np.asarray(flat, dtype="float64"))


def _sign_bits(vec: F.Column, flat_planes: F.Column, base: F.Column,
               num_planes: int, dim: int) -> F.Column:
    """Sign-bit bucket string of ``vec`` against planes sliced from the
    flat literal starting at element ``base`` (0-based)."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_planes - 1)),
            lambda p: F.when(
                dot(vec, F.slice(flat_planes, base + p * dim + 1, F.lit(dim)))
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ),
        "",
    )


def lsh_bucket(df: DataFrame, vec_col: str, num_planes: int, dim: int,
               table: int = 0) -> DataFrame:
    """Add a ``__bucket`` column: the sign-bit string of the vector against
    ``num_planes`` fixed hyperplanes. Pure column expressions, planes ride
    as one flat value literal — bucketing is a map-only stage (no shuffle,
    no UDF) with O(1) plan size in dim."""
    flat = _planes_flat_lit([table], num_planes, dim)
    return df.withColumn(
        "__bucket",
        _sign_bits(F.col(vec_col), flat, F.lit(0), num_planes, dim),
    )


def _table_buckets(vec_col: str, num_planes: int, dim: int,
                   num_tables: int) -> F.Column:
    """array<struct<tbl,bkt>> for the multi-table (OR-amplified) LSH
    paths; one flat planes literal shared by every table, indexed
    table-major."""
    flat = _planes_flat_lit(list(range(num_tables)), num_planes, dim)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_tables - 1)),
        lambda tb: F.struct(
            tb.alias("tbl"),
            _sign_bits(F.col(vec_col), flat, tb * (num_planes * dim),
                       num_planes, dim).alias("bkt"),
        ),
    )


def lsh_ann_topk(
    df: DataFrame, id_col: str, vec_col: str, *,
    k: int = 5, num_planes: int = 4, dim: int = 64, num_tables: int = 8,
) -> DataFrame:
    """Approximate self-similarity top-k via MULTI-TABLE random-hyperplane
    LSH (OR-amplification, the same band trick as MinHash): each of
    ``num_tables`` independent tables buckets vectors by ``num_planes``
    sign bits; candidate pairs collide in ≥1 table; exact cosine ranks the
    candidates. P(candidate) = 1-(1-(1-θ/π)^planes)^tables — steep in
    similarity, so true neighbors survive while the per-bucket pair count
    stays ~N²/2^planes per table.

    One explode (num_tables rows/vector) + one shuffle on (table, bucket);
    recall vs the exact baseline is asserted in tests/test_llm.py.
    Output: (query_id, neighbor_id, rank, cos).
    """
    buckets = _table_buckets(vec_col, num_planes, dim, num_tables)
    b = _with_norm(df, vec_col, "__n").select(
        F.col(id_col), F.col(vec_col).alias("__v"), "__n",
        F.explode(buckets).alias("tb"),
    ).select(
        id_col, "__v", "__n",
        F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"),
    )
    a = b.alias("a")
    c = b.alias("c")
    cands = (
        a.join(c, ["tbl", "bkt"])
        .filter(F.col(f"a.{id_col}") != F.col(f"c.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
        )
        .distinct()
    )
    n = _with_norm(df, vec_col, "__n")
    qside = n.select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).alias("__vq"), F.col("__n").alias("__nq"))
    cside = n.select(F.col(id_col).alias("neighbor_id"),
                     F.col(vec_col).alias("__vc"), F.col("__n").alias("__nc"))
    scored = (
        cands.join(qside, "query_id").join(cside, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("__vq"), F.col("__vc"),
                   F.col("__nq"), F.col("__nc")).alias("__cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("__cos", 6).alias("cos"))
    )


def ivf_ann_topk(
    df: DataFrame, id_col: str, vec_col: str, *,
    k: int = 5, nlist: int = 16, nprobe: int = 4, seed: int = 42,
    centers: "list[list[float]] | None" = None,
) -> DataFrame:
    """IVF (inverted-file) approximate self-similarity top-k — the
    k-means-quantizer ANN family (FAISS IVFFlat's shape), complementing
    the hyperplane-LSH path:

    1. TRAIN: k-means fits ``nlist`` centroids (MLlib, distributed,
       deterministic under ``seed``); each corpus vector is assigned to
       its nearest centroid's CELL — the inverted file.
    2. PROBE: each query scores all ``nlist`` centroids JVM-side (the
       centroid matrix is tiny and folds into literals), keeps the
       ``nprobe`` nearest cells, and scans ONLY those cells' vectors —
       the candidate set is ~nprobe/nlist of the corpus.
    3. RERANK: exact cosine + per-query top-k window over candidates.

    At 100 TB: the inverted file is a hash-shuffle by cell id; cell sizes
    are balanced by k-means (unlike hash buckets under skewed data), and
    recall/cost tunes continuously via nprobe. Rows-only check (k-means
    is iterative — not SQL-replayable); recall vs the exact baseline is
    asserted in tests/test_llm.py.

    Output: (query_id, neighbor_id, rank, cos).
    """
    import numpy as np

    fv = df.select(F.col(id_col), F.col(vec_col).alias("__v"))
    if centers is None:
        # k-means coarse quantizer (FAISS IVFFlat's default shape)
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        kfv = fv.withColumn(
            "__fv", array_to_vector(F.col("__v").cast("array<double>")))
        model = KMeans(k=nlist, seed=seed, featuresCol="__fv",
                       predictionCol="__cell").fit(kfv)
        centers = [list(map(float, c)) for c in model.clusterCenters()]
    cdim = len(centers[0])
    # rank cells per query: ||v-c||² = ||v||² − 2·v·c + ||c||²; ||v||² is
    # constant per query so −2·v·c + ||c||² orders cells identically.
    # Centroid matrix + its squared norms ride as two flat value literals
    # (not per-weight literal nodes) — plan size O(1) in nlist×dim.
    centers_flat = F.lit(np.asarray(
        [x for c in centers for x in c], dtype="float64"))
    norms_lit = F.lit(np.asarray(
        [sum(x * x for x in c) for c in centers], dtype="float64"))
    cell_scores = F.transform(
        F.sequence(F.lit(0), F.lit(len(centers) - 1)),
        lambda i: F.struct(
            (dot(F.col("__v"), F.slice(centers_flat, i * cdim + 1, F.lit(cdim)))
             * -2.0 + F.element_at(norms_lit, i + 1)).alias("d"),
            i.alias("cell"),
        ),
    )
    # the inverted file: every vector assigned to its nearest cell
    # (same scorer, probe depth 1) — works for ANY center set, k-means
    # or a fixed deterministic quantizer sample
    inverted = (
        fv.select(F.col(id_col).alias("neighbor_id"),
                  F.col("__v").alias("__vc"),
                  F.element_at(F.array_sort(cell_scores), 1)
                  .getField("cell").alias("cell"))
    )
    probes = (
        fv.select(F.col(id_col).alias("query_id"), F.col("__v"),
                  F.explode(F.slice(F.array_sort(cell_scores), 1, nprobe))
                  .alias("p"))
        .select("query_id", F.col("__v").alias("__vq"),
                F.col("p.cell").alias("cell"))
    )
    cands = (
        probes.join(inverted, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("__vq"), F.col("__vc"),
                   l2_norm(F.col("__vq")), l2_norm(F.col("__vc")))
            .alias("__cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("__cos", 6).alias("cos"))
    )


def embedding_near_dup_pairs_lsh(
    df: DataFrame, id_col: str, vec_col: str, threshold: float, *,
    num_planes: int = 4, dim: int = 64, num_tables: int = 8,
) -> DataFrame:
    """THE SCALE PATH for embedding near-dup: multi-table hyperplane-LSH
    candidate generation (one explode + one shuffle keyed on
    (table, bucket) — never an all-pairs crossJoin) followed by exact
    cosine verification of the candidates. Same OR-amplification math as
    lsh_ann_topk: P(candidate) = 1-(1-(1-θ/π)^planes)^tables. The md5
    hyperplanes are deterministic, so a SQL oracle can replay the exact
    candidate set (queries/llm.py dedup_embedding_lsh does).

    Output: (doc_i, doc_j, cos) with doc_i < doc_j, cos ≥ threshold."""
    buckets = _table_buckets(vec_col, num_planes, dim, num_tables)
    b = df.select(F.col(id_col), F.explode(buckets).alias("tb")).select(
        id_col, F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt")
    )
    a = b.alias("a")
    c = b.alias("c")
    cands = (
        a.join(c, ["tbl", "bkt"])
        .filter(F.col(f"a.{id_col}") < F.col(f"c.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_i"),
            F.col(f"c.{id_col}").alias("doc_j"),
        )
        .distinct()
    )
    n = _with_norm(df, vec_col, "__n")
    iside = n.select(F.col(id_col).alias("doc_i"),
                     F.col(vec_col).alias("__vi"), F.col("__n").alias("__ni"))
    jside = n.select(F.col(id_col).alias("doc_j"),
                     F.col(vec_col).alias("__vj"), F.col("__n").alias("__nj"))
    return (
        cands.join(iside, "doc_i").join(jside, "doc_j")
        .select(
            "doc_i", "doc_j",
            cosine(F.col("__vi"), F.col("__vj"),
                   F.col("__ni"), F.col("__nj")).alias("__cos"),
        )
        .filter(F.col("__cos") >= threshold)
        .select("doc_i", "doc_j", F.round("__cos", 6).alias("cos"))
    )


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_i < doc_j, cos ≥
    threshold). EXACT all-pairs — the correctness baseline, pinned to
    small SF; the production path is embedding_near_dup_pairs_lsh."""
    n = _with_norm(df, vec_col, "__n").select(
        F.col(id_col), F.col(vec_col).alias("__v"), "__n"
    )
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_i"),
            F.col(f"b.{id_col}").alias("doc_j"),
            cosine(F.col("a.__v"), F.col("b.__v"),
                   F.col("a.__n"), F.col("b.__n")).alias("__cos"),
        )
        .filter(F.col("__cos") >= threshold)
        .select("doc_i", "doc_j", F.round("__cos", 6).alias("cos"))
    )


def cosine_topk_blocked(
    queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Blocked-matmul exact top-k: the THROUGHPUT path for batch ANN.

    The query block (bounded by contract: a batch of queries, not the
    corpus) is collected once and shipped via ``sparkContext.broadcast``
    — one torrent transfer per executor, not a per-task closure
    re-serialization; each Arrow batch of the corpus becomes one numpy
    matmul (nq × nc × dim FLOPs at BLAS speed, ~100× the per-row fold).
    Per-batch top-k candidates are tiny (n_batches × nq × k rows), and a
    final window pass picks the global top-k. The corpus never leaves the
    executors — this is the replicate-small-side × scan-big-side pattern
    that scales to 10^10 corpus rows.

    Float summation order differs from the ordered-fold path, so use
    cosine_topk when bit-exact oracle parity matters.
    """
    import numpy as np
    import pandas as pd

    qpd = queries.select(id_col, vec_col).toPandas()
    if qpd.empty:
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, cos double"
        )
    Q = np.asarray(qpd[vec_col].tolist(), dtype="float64")
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    qids = np.asarray(qpd[id_col].values)
    bq = corpus.sparkSession.sparkContext.broadcast((Q, qids))

    def block(batches):
        Q, qids = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.asarray(pdf[vec_col].tolist(), dtype="float64")
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            cids = np.asarray(pdf[id_col].values)
            S = Q @ C.T  # (nq, nc)
            kk = min(k + 1, S.shape[1])  # +1 absorbs a potential self-match
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            rows_q, rows_n, rows_c = [], [], []
            for qi in range(S.shape[0]):
                for ci in idx[qi]:
                    rows_q.append(qids[qi])
                    rows_n.append(cids[ci])
                    rows_c.append(S[qi, ci])
            yield pd.DataFrame({
                "query_id": np.asarray(rows_q, dtype="int64"),
                "neighbor_id": np.asarray(rows_n, dtype="int64"),
                "__cos": np.asarray(rows_c, dtype="float64"),
            })

    cand = corpus.select(id_col, vec_col).mapInPandas(
        block, "query_id long, neighbor_id long, __cos double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("__cos", 6).alias("cos"))
    )


def int8_quantize(df: DataFrame, vec_col: str, *, q_col: str = "__q8",
                  maxabs_col: str = "__maxabs") -> DataFrame:
    """Symmetric per-vector int8 quantization of an ``array<float|double>``
    column: ``q_i = floor(x_i * 127 / max|x| + 0.5)`` (round-half-up), so
    values land in [-127, 127] and the zero point is exactly 0 — the
    standard storage/compute compression for embedding retrieval (4× vs
    float32, 8× vs float64; integer dot products downstream).

    Exactness contract (what makes the DuckDB oracle bit-identical): the
    max|x| fold, the ``* 127 / max + 0.5`` chain, and ``floor`` are all
    IEEE-correctly-rounded double ops, deterministic across engines — no
    ``round()`` half-way ambiguity anywhere (the r7 half-cent lesson).
    A zero vector quantizes to all zeros rather than dividing by zero.

    Map-only: no shuffle, no Python; plan size O(1) in dim. At 100 TB the
    quantized column is what you persist + shuffle; the float column can
    be dropped after this projection (candidate generation happens on
    sign bits of the ORIGINAL vectors, which quantization preserves in
    sign, so bucketing before or after quantizing is equivalent).

    Reference scope: the reference engine has no vector type at all —
    this family is the training-pipeline extension mandated by the build
    brief (embedding near-dup + ANN at corpus scale).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.withColumn(
        maxabs_col,
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))),
    )
    quant = F.when(
        F.col(maxabs_col) == 0.0,
        F.transform(F.col(vec_col), lambda x: F.lit(0).cast("bigint")),
    ).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * 127.0 / F.col(maxabs_col) + 0.5),
        )
    )
    return out.withColumn(q_col, quant)


def int8_ann_topk(
    df: DataFrame, id_col: str, vec_col: str, *,
    k: int = 5, num_planes: int = 4, dim: int = 64, num_tables: int = 8,
) -> DataFrame:
    """Quantized-rerank ANN: multi-table hyperplane LSH proposes candidate
    pairs (same OR-amplified bucketing as :func:`lsh_ann_topk` — map-only
    sign bits, one shuffle on (table, bucket)), then the rerank scores
    candidates with INTEGER dot products over int8-quantized vectors:
    ``qcos = idot(qa, qb) / (sqrt(idot(qa,qa)) * sqrt(idot(qb,qb)))``.

    Why this shape at 100 TB: the rerank join ships 64 bytes/vector
    (int8) instead of 512 (float64) through the candidate shuffle, and
    the scoring loop is integer multiply-accumulate — this is the
    standard memory-bound ANN serving layout (FAISS SQ8). Recall vs the
    exact float baseline is asserted in tests/test_llm.py; the whole
    pipeline (bucketing, quantization, integer ranking) is replayed by a
    DuckDB oracle, exact because integer dots are exact and sqrt/divide
    are correctly-rounded IEEE ops.

    Output: (query_id, neighbor_id, rank, qcos).
    """
    buckets = _table_buckets(vec_col, num_planes, dim, num_tables)
    b = df.select(
        F.col(id_col), F.explode(buckets).alias("tb"),
    ).select(
        id_col,
        F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"),
    )
    a = b.alias("a")
    c = b.alias("c")
    cands = (
        a.join(c, ["tbl", "bkt"])
        .filter(F.col(f"a.{id_col}") != F.col(f"c.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
        )
        .distinct()
    )
    qz = int8_quantize(df, vec_col)
    idot = F.aggregate(
        F.zip_with(F.col("__q8"), F.col("__q8"), lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    qn = qz.withColumn("__ss", idot)
    qa = qn.select(F.col(id_col).alias("query_id"),
                   F.col("__q8").alias("__qa"), F.col("__ss").alias("__sa"))
    qb = qn.select(F.col(id_col).alias("neighbor_id"),
                   F.col("__q8").alias("__qb"), F.col("__ss").alias("__sb"))
    pair_dot = F.aggregate(
        F.zip_with(F.col("__qa"), F.col("__qb"), lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    scored = (
        cands.join(qa, "query_id").join(qb, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            F.when((F.col("__sa") > 0) & (F.col("__sb") > 0),
                   pair_dot / (F.sqrt(F.col("__sa")) * F.sqrt(F.col("__sb"))))
            .otherwise(F.lit(0.0)).alias("__qcos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("__qcos"),
                                          F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("__qcos", 6).alias("qcos"))
    )
