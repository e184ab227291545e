"""Training-data-pipeline queries (SURVEY.md §7 phase 6): deduplication,
similarity search, text analysis, multimodal plumbing — over the
``documents`` (doc_id, text, lang, source, n_chars) and ``embeddings``
(vec_id, embedding float[64], label) tables.

Oracle strategy: each pipeline is built ONLY from engine-portable
primitives — md5 hex hashing, lexicographic string minima, ordered
left-folds for float math — so the DuckDB oracle replicates the exact
pipeline (not just the intent) and hash-matches bit-for-bit. See
functions/text.py and functions/vector.py for the shared builders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from drill_calcite_spark.functions.text import rolling_fingerprint, shingles, tokens
from drill_calcite_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_signature,
)
from drill_calcite_spark.operators.multimodal import (
    N_FEATURES,
    attach_binary_payload,
    extract_features,
    frame_sample,
    resize_stub,
)
from drill_calcite_spark.operators.topk import bounded_group_topk
from drill_calcite_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_blocked,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    ivf_ann_topk,
    lsh_ann_topk,
)
from drill_calcite_spark.queries.common import t

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenized+shingled documents, repartitioned by doc_id BEFORE the
    shingle work: the driver tables are single parquet files, and without
    the repartition every downstream stage (md5, explode, groupBy input)
    runs as ONE task regardless of cores — 2.1× slower at sf0.1. At
    cluster scale the same repartition balances document-size skew."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # explicit partition count: a column-only repartition is an AQE
    # coalesce target and collapses right back to one partition here
    doc = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    return doc.select(
        "doc_id", shingles(tokens(F.col("text"))).alias("sh")
    )


# SQL fragments shared by the oracles (kept textually tiny and identical in
# structure to the Spark builders they mirror).
_SQL_TOKS = (
    "SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') t "
    "FROM documents"
)
_SQL_SH = (
    "SELECT doc_id, list_distinct(list_transform("
    "list_zip(t[1:len(t)-1], t[2:len(t)]), s -> s[1] || ' ' || s[2])) ts "
    "FROM toks"
)
_SQL_JAC = (
    "len(list_intersect(sa.ts, sb.ts))::DOUBLE"
    " / len(list_distinct(list_concat(sa.ts, sb.ts)))"
)
_SQL_DOT = (
    "list_reduce(list_concat([0.0]::DOUBLE[], "
    "list_transform(list_zip({a}, {b}), s -> s[1] * s[2])), (x, y) -> x + y)"
)

NUM_HASHES = 12
BANDS = 4


def _r6_ratio(p, q):
    """``round(p/q, 6)`` for NON-NEGATIVE integer columns, computed
    exactly in integer space: ``floor(p*10^6/q + 1/2) = (2*p*10^6 + q)
    div (2*q)`` micro-units, then one exact double division by 10^6.

    Why not ``F.round(p/q, 6)``: an integer ratio can land exactly on a
    .xxxxxx5 boundary (e.g. q a power of two — 125/128 = 0.9765625),
    where Spark (HALF_UP on the exact binary value) and DuckDB
    (scaled-double) may round differently — the same divergence class as
    the r7 ``ds_cross_channel_band`` half-cent red row, at 6 dp. Both
    engines do the integer form exactly (Spark ``div`` / DuckDB ``//``
    truncate toward zero = floor for the non-negative values here).
    The SQL twin is ``_sql_r6_ratio``."""
    p = p.cast("bigint")
    q = q.cast("bigint")
    micros = F.call_function(
        "div", F.lit(2) * p * F.lit(1000000) + q, F.lit(2) * q)
    return micros / F.lit(1000000.0)


def _sql_r6_ratio(p: str, q: str) -> str:
    """DuckDB twin of ``_r6_ratio`` (same integer half-up form)."""
    return (f"(((2 * ({p})::BIGINT * 1000000 + ({q})::BIGINT)"
            f" // (2 * ({q})::BIGINT)) / 1000000.0)")


# ------------------------------------------------------------------- dedup
@q("dedup_exact", """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
""")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content (operators/dedup.py)."""
    return exact_dedup(t(spark, sf_dir, "documents"), "text", "doc_id")


def _minhash_oracle() -> str:
    from drill_calcite_spark.operators.dedup import MINHASH_P, minhash_coeffs

    rpb = NUM_HASHES // BANDS
    mins = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(NUM_HASHES))
    )
    bands = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, "
        "md5(concat_ws('|', {sig})) AS sig FROM mh".format(
            b=b, sig=", ".join(f"h{b * rpb + r}" for r in range(rpb))
        )
        for b in range(BANDS)
    )
    return f"""
WITH toks AS ({_SQL_TOKS}),
sh AS ({_SQL_SH}),
ex AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(ts)), 1, 15))::BIGINT % {MINHASH_P} AS h
  FROM sh
),
mh AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT doc_i, doc_j, round({_SQL_JAC}, 6) AS jaccard
FROM cand
JOIN sh sa ON sa.doc_id = cand.doc_i
JOIN sh sb ON sb.doc_id = cand.doc_j
WHERE {_SQL_JAC} >= 0.5
"""


@q("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(12) → 4 bands × 3 → bucket-join → exact-Jaccard verify ≥ 0.5
    over word 2-gram shingles (operators/dedup.py). The oracle replays the
    identical md5/banding pipeline, so LSH's candidate set matches too."""
    return minhash_lsh_dedup(
        _shingled(spark, sf_dir), "doc_id", "sh",
        num_hashes=NUM_HASHES, bands=BANDS, threshold=0.5,
    )


def _clusters_oracle() -> str:
    """The minhash-pair oracle extended with a recursive-CTE transitive
    closure: component id = min reachable doc_id — exactly what
    min-label propagation converges to."""
    pairs = _minhash_oracle().strip()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT doc_i AS a, doc_j AS b FROM pairs
  UNION SELECT doc_j, doc_i FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
  FROM reach GROUP BY a
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM comp
"""


@q("dedup_clusters", _clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER formation — the step after candidate pairs
    that a production dedup pipeline needs to keep one document per
    duplicate group: MinHash/LSH verified pairs (same pipeline as
    `dedup_minhash_lsh`) → connected components via min-label
    propagation (operators/graph.py) → per-document cluster id, cluster
    size, and the keep-this-one flag (the smallest doc_id is canonical).
    The DuckDB oracle replays the identical pair generation and takes
    the recursive-CTE transitive closure, so the hash-compare proves the
    component structure, not just row counts. Scale: pairs are the
    candidate-only LSH output (never all-pairs); each propagation round
    is one pairs⋈labels shuffle and LSH near-dup clusters close in ~2-4
    rounds (the loop exits on a converged round)."""
    from drill_calcite_spark.operators.graph import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir)
    comp = connected_components(pairs, src="doc_i", dst="doc_j")
    w = Window.partitionBy("cluster_id")
    return (
        comp.select(F.col("node").alias("doc_id"),
                    F.col("component").alias("cluster_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )


@q("dedup_ngram_jaccard", f"""
WITH toks AS ({_SQL_TOKS}),
sh AS ({_SQL_SH}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
  FROM (SELECT doc_id, unnest(ts) AS s FROM sh) a
  JOIN (SELECT doc_id, unnest(ts) AS s FROM sh) b
    ON a.s = b.s AND a.doc_id < b.doc_id
)
SELECT doc_i, doc_j, round({_SQL_JAC}, 6) AS jaccard
FROM cand
JOIN sh sa ON sa.doc_id = cand.doc_i
JOIN sh sb ON sb.doc_id = cand.doc_j
WHERE {_SQL_JAC} >= 0.35
""")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 2-gram Jaccard near-dup pairs ≥ 0.35 via inverted-index
    candidate generation (pairs sharing ≥1 shingle) — no cross join."""
    return ngram_jaccard_pairs(_shingled(spark, sf_dir), "doc_id", "sh", 0.35)


NGRAM_DF_MAX = 30  # drops ~45% of sf0.01 postings yet keeps all planted pairs


@q("dedup_ngram_capped", f"""
WITH toks AS ({_SQL_TOKS}),
sh AS ({_SQL_SH}),
inv AS (SELECT doc_id, unnest(ts) AS s FROM sh),
keep AS (SELECT s FROM inv GROUP BY s HAVING count(*) <= {NGRAM_DF_MAX}),
capped AS (SELECT inv.doc_id, inv.s FROM inv JOIN keep USING (s)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
  FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
)
SELECT doc_i, doc_j, round({_SQL_JAC}, 6) AS jaccard
FROM cand
JOIN sh sa ON sa.doc_id = cand.doc_i
JOIN sh sb ON sb.doc_id = cand.doc_j
WHERE {_SQL_JAC} >= 0.35
""")
def dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path of the inverted-index pipeline: stop-shingles with
    document frequency > df_max are anti-joined out before the self-join,
    bounding candidate fan-out per key (operators/dedup.py). The oracle
    replays the identical df filter, so parity holds even where the cap
    changes the candidate set."""
    return ngram_jaccard_pairs(
        _shingled(spark, sf_dir), "doc_id", "sh", 0.35, df_max=NGRAM_DF_MAX
    )


@q("text_trigram_stats", f"""
WITH toks AS ({_SQL_TOKS}),
tg AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_transform(generate_series(1, len(t)-2),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
              ELSE [] END AS g3
  FROM toks
)
SELECT doc_id,
       CAST(len(g3) AS BIGINT)                 AS n_trigrams,
       CAST(len(list_distinct(g3)) AS BIGINT)  AS n_distinct,
       list_aggregate(g3, 'min')               AS first_alpha
FROM tg WHERE doc_id < 200
""")
def text_trigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word TRIGRAM shingles (functions/text.py shingles n=3 — the
    index-window general-n path): per-document trigram count, distinct
    count, and lexicographic minimum. Same one-pass column-expression
    shape as the 2-gram pipeline; the oracle replays the window
    construction."""
    doc = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    g3 = shingles(tokens(F.col("text")), n=3)
    return doc.select(
        "doc_id",
        F.size(g3).cast("bigint").alias("n_trigrams"),
        F.size(F.array_distinct(g3)).cast("bigint").alias("n_distinct"),
        F.array_min(g3).alias("first_alpha"),
    )


def _simhash_oracle(bits: int = 16) -> str:
    sums = ", ".join(
        f"sum(CASE WHEN substr(h, {i + 1}, 1) >= '8' THEN 1 ELSE -1 END) b{i}"
        for i in range(bits)
    )
    sig = " || ".join(
        f"CASE WHEN b{i} > 0 THEN '1' ELSE '0' END" for i in range(bits)
    )
    return f"""
WITH toks AS ({_SQL_TOKS}),
sh AS ({_SQL_SH}),
hx AS (SELECT doc_id, md5(unnest(ts)) AS h FROM sh),
sums AS (SELECT doc_id, {sums} FROM hx GROUP BY doc_id)
SELECT {sig} AS simhash, count(*) AS n_docs, min(doc_id) AS min_doc
FROM sums GROUP BY 1
"""


@q("dedup_simhash_buckets", _simhash_oracle())
def dedup_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(16-bit) bucket summary: docs sharing a signature are
    near-dup candidates (operators/dedup.py simhash_signature). At scale,
    extend with Hamming-1 probes by re-keying on bit-flipped signatures."""
    sig = simhash_signature(_shingled(spark, sf_dir), "doc_id", "sh", bits=16)
    return sig.groupBy("simhash").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc")
    )


_DOT_AB = _SQL_DOT.format(a="a.v", b="b.v")
_DOT_VV = _SQL_DOT.format(a="v", b="v")


@q("dedup_embedding_cosine", f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v
           FROM embeddings),
n AS (SELECT vec_id, v, sqrt({_DOT_VV}) nrm FROM e),
p AS (
  SELECT a.vec_id AS doc_i, b.vec_id AS doc_j,
         {_DOT_AB} / (a.nrm * b.nrm) AS c
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT doc_i, doc_j, round(c, 6) AS cos FROM p WHERE c >= 0.45
""")
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (operators/similarity.py).
    Ordered-fold double math ⇒ bit-identical to the oracle. Threshold 0.45
    sits just under the testdata's max pairwise cosine (~0.51) so the
    result is non-vacuous; real corpora use ~0.95."""
    emb = t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, "vec_id", "embedding", 0.45)


def _embedding_lsh_oracle(threshold: float = 0.45, num_planes: int = 4,
                          dim: int = 64, num_tables: int = 8) -> str:
    """Replays the md5-hyperplane bucketing in SQL: per table, each plane
    projection is the same ordered left-fold dot product the Spark side
    folds (weights are x.5 values — exact in binary — so the sign bits
    match bit-for-bit)."""
    from drill_calcite_spark.operators.similarity import hyperplanes

    def proj(w):
        lits = ", ".join(repr(x) for x in w)
        return _SQL_DOT.format(a="v", b=f"[{lits}]::DOUBLE[]")

    tables = "\n  UNION ALL ".join(
        "SELECT vec_id, {t} AS tbl, {bits} AS bkt FROM n".format(
            t=tb,
            bits=" || ".join(
                f"CASE WHEN {proj(w)} >= 0 THEN '1' ELSE '0' END"
                for w in hyperplanes(num_planes, dim, tb)
            ),
        )
        for tb in range(num_tables)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v
           FROM embeddings),
n AS (SELECT vec_id, v FROM e),
bk AS ({tables}),
cand AS (
  SELECT DISTINCT a.vec_id AS doc_i, b.vec_id AS doc_j
  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt
  WHERE a.vec_id < b.vec_id
),
nn AS (SELECT vec_id, v, sqrt({_DOT_VV}) nrm FROM e),
p AS (
  SELECT cand.doc_i, cand.doc_j, {_DOT_AB} / (a.nrm * b.nrm) AS c
  FROM cand JOIN nn a ON a.vec_id = cand.doc_i
            JOIN nn b ON b.vec_id = cand.doc_j
)
SELECT doc_i, doc_j, round(c, 6) AS cos FROM p WHERE c >= {threshold}
"""


@q("dedup_embedding_lsh", _embedding_lsh_oracle())
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via the SCALE path: multi-table hyperplane-LSH
    candidates + exact cosine verify (operators/similarity.py
    embedding_near_dup_pairs_lsh) — no all-pairs crossJoin anywhere. The
    oracle replays the identical md5-hyperplane bucketing, so LSH's
    candidate selection itself is hash-checked."""
    emb = t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs_lsh(
        emb, "vec_id", "embedding", 0.45,
        num_planes=4, dim=64, num_tables=8,
    )


# -------------------------------------------------------------- similarity
@q("ann_cosine_topk", f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v
           FROM embeddings),
n AS (SELECT vec_id, v, sqrt({_DOT_VV}) nrm FROM e),
p AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DOT_AB} / (a.nrm * b.nrm) AS c
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, round(c, 6) AS cos FROM r WHERE rank <= 5
""")
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 per vector — the ANN correctness
    baseline (operators/similarity.py cosine_topk)."""
    emb = t(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, emb, "vec_id", "embedding", k=5)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-quantizer approximate top-5 (operators/similarity.py
    ivf_ann_topk): k-means cells + nprobe probing + exact rerank.
    Rows-only (iterative training, seeded deterministic); recall vs the
    exact baseline asserted in tests/test_llm.py."""
    emb = t(spark, sf_dir, "embeddings")
    out = ivf_ann_topk(emb, "vec_id", "embedding", k=5, nlist=16, nprobe=4)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


QUERIES["ann_ivf_topk"] = ann_ivf_topk_q


def _ann_lsh_oracle(k: int = 5, num_planes: int = 4, dim: int = 64,
                    num_tables: int = 8) -> str:
    """Replays the multi-table hyperplane bucketing (same construction as
    _embedding_lsh_oracle), then ranks candidates per query — making the
    LSH top-k itself hash-checkable, not just the near-dup variant."""
    from drill_calcite_spark.operators.similarity import hyperplanes

    def proj(w):
        lits = ", ".join(repr(x) for x in w)
        return _SQL_DOT.format(a="v", b=f"[{lits}]::DOUBLE[]")

    tables = "\n  UNION ALL ".join(
        "SELECT vec_id, {t} AS tbl, {bits} AS bkt FROM n".format(
            t=tb,
            bits=" || ".join(
                f"CASE WHEN {proj(w)} >= 0 THEN '1' ELSE '0' END"
                for w in hyperplanes(num_planes, dim, tb)
            ),
        )
        for tb in range(num_tables)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v
           FROM embeddings),
n AS (SELECT vec_id, v FROM e),
bk AS ({tables}),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt
  WHERE a.vec_id <> b.vec_id
),
nn AS (SELECT vec_id, v, sqrt({_DOT_VV}) nrm FROM e),
p AS (
  SELECT cand.query_id, cand.neighbor_id, {_DOT_AB} / (a.nrm * b.nrm) AS c
  FROM cand JOIN nn a ON a.vec_id = cand.query_id
            JOIN nn b ON b.vec_id = cand.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, round(c, 6) AS cos FROM r WHERE rank <= {k}
"""


@q("ann_lsh_topk", _ann_lsh_oracle())
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed approximate top-5 (operators/similarity.py).
    The oracle replays the md5-hyperplane bucketing AND the candidate
    ranking, so the approximate result is hash-checked end-to-end; recall
    vs the exact baseline is additionally asserted in tests/test_llm.py."""
    emb = t(spark, sf_dir, "embeddings")
    out = lsh_ann_topk(emb, "vec_id", "embedding", k=5,
                       num_planes=4, dim=64, num_tables=8)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


_SQL_IDOT = (
    "list_reduce(list_concat([0]::BIGINT[], "
    "list_transform(list_zip({a}, {b}), s -> s[1] * s[2])), (x, y) -> x + y)"
)


def _ann_int8_oracle(k: int = 5, num_planes: int = 4, dim: int = 64,
                     num_tables: int = 8) -> str:
    """Replays the whole quantized-rerank pipeline: the md5-hyperplane
    bucketing (identical construction to ``_ann_lsh_oracle``), then the
    per-vector int8 quantization (max|x| fold → ``floor(x*127/max+0.5)``
    — all IEEE-exact double ops, no round() half-way ambiguity), then the
    INTEGER dot-product ranking. Integer dots are exact and sqrt/divide
    are correctly-rounded, so the hash match is bit-for-bit."""
    from drill_calcite_spark.operators.similarity import hyperplanes

    def proj(w):
        lits = ", ".join(repr(x) for x in w)
        return _SQL_DOT.format(a="v", b=f"[{lits}]::DOUBLE[]")

    tables = "\n  UNION ALL ".join(
        "SELECT vec_id, {t} AS tbl, {bits} AS bkt FROM n".format(
            t=tb,
            bits=" || ".join(
                f"CASE WHEN {proj(w)} >= 0 THEN '1' ELSE '0' END"
                for w in hyperplanes(num_planes, dim, tb)
            ),
        )
        for tb in range(num_tables)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v
           FROM embeddings),
n AS (SELECT vec_id, v FROM e),
bk AS ({tables}),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bkt = b.bkt
  WHERE a.vec_id <> b.vec_id
),
ma AS (
  SELECT vec_id, v,
         list_reduce(list_concat([0.0]::DOUBLE[],
                     list_transform(v, x -> abs(x))),
                     (x, y) -> greatest(x, y)) AS m
  FROM e
),
q8 AS (
  SELECT vec_id,
         CASE WHEN m = 0 THEN list_transform(v, x -> 0::BIGINT)
              ELSE list_transform(v,
                     x -> floor(x * 127.0 / m + 0.5)::BIGINT) END AS q
  FROM ma
),
sd AS (SELECT vec_id, q, {_SQL_IDOT.format(a='q', b='q')} AS ss FROM q8),
p AS (
  SELECT cand.query_id, cand.neighbor_id,
         CASE WHEN a.ss > 0 AND b.ss > 0
              THEN {_SQL_IDOT.format(a='a.q', b='b.q')}
                   / (sqrt(a.ss) * sqrt(b.ss))
              ELSE 0.0 END AS c
  FROM cand JOIN sd a ON a.vec_id = cand.query_id
            JOIN sd b ON b.vec_id = cand.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id) AS rank
  FROM p
)
SELECT query_id, neighbor_id, rank, round(c, 6) AS qcos
FROM r WHERE rank <= {k}
"""


@q("ann_int8_topk", _ann_int8_oracle())
def ann_int8_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized rerank ANN (operators/similarity.py int8_ann_topk):
    LSH candidates on the float vectors, integer-dot scoring over
    symmetric per-vector int8 quantization — the FAISS-SQ8 memory-bound
    serving layout (64 B/vector through the rerank shuffle instead of
    512 B). Oracle replays bucketing + quantization + integer ranking
    end-to-end; recall vs the exact float baseline is asserted in
    tests/test_llm.py."""
    from drill_calcite_spark.operators.similarity import int8_ann_topk

    emb = t(spark, sf_dir, "embeddings")
    out = int8_ann_topk(emb, "vec_id", "embedding", k=5,
                        num_planes=4, dim=64, num_tables=8)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# ----------------------------------------------------------- text analysis
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "una", "por", "con"],
    "zh": ["的", "是", "了", "在", "我"],
}


def _hits(toks_col, words: list[str]):
    return F.size(F.filter(toks_col, lambda x: x.isin(*words)))


def _sql_hits(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(t, x -> list_contains([{lst}], x)))"


def _langid_oracle() -> str:
    scores = ", ".join(
        f"{_sql_hits(ws)} s_{lg}" for lg, ws in _STOPWORDS.items()
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') t
  FROM documents
),
sc AS (SELECT doc_id, lang, {scores} FROM toks)
SELECT doc_id, lang,
  CASE
    WHEN s_en > 0 AND s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
    WHEN s_de > 0 AND s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
    WHEN s_fr > 0 AND s_fr >= greatest(s_es, s_zh) THEN 'fr'
    WHEN s_es > 0 AND s_es >= s_zh THEN 'es'
    WHEN s_zh > 0 THEN 'zh'
    ELSE 'und'
  END AS pred_lang,
  s_en AS en_hits
FROM sc
"""


@q("text_lang_id", _langid_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram heuristic family): argmax of
    per-language stopword hit counts with a fixed priority tie-break."""
    doc = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sc = doc.select(
        "doc_id", "lang",
        *[_hits(toks, ws).alias(f"s_{lg}") for lg, ws in _STOPWORDS.items()],
    )
    pred = (
        F.when((F.col("s_en") > 0)
               & (F.col("s_en") >= F.greatest("s_de", "s_fr", "s_es", "s_zh")),
               "en")
        .when((F.col("s_de") > 0)
              & (F.col("s_de") >= F.greatest("s_fr", "s_es", "s_zh")), "de")
        .when((F.col("s_fr") > 0)
              & (F.col("s_fr") >= F.greatest("s_es", "s_zh")), "fr")
        .when((F.col("s_es") > 0) & (F.col("s_es") >= F.col("s_zh")), "es")
        .when(F.col("s_zh") > 0, "zh")
        .otherwise("und")
    )
    return sc.select(
        "doc_id", "lang", pred.alias("pred_lang"),
        F.col("s_en").cast("bigint").alias("en_hits"),
    )


_EN = _STOPWORDS["en"]


@q("text_quality_score", f"""
WITH toks AS ({_SQL_TOKS}),
m AS (
  SELECT doc_id,
    len(t) AS n_tok,
    len(list_distinct(t)) AS n_uniq,
    list_reduce(list_concat([0]::BIGINT[],
      list_transform(t, x -> length(x)::BIGINT)), (a, b) -> a + b) AS sum_len,
    {_sql_hits(_EN)} AS n_stop
  FROM toks
),
r AS (
  SELECT doc_id, n_tok, n_uniq, n_stop, sum_len,
    0.4 * (n_uniq::DOUBLE / n_tok) + 0.4 * (n_stop::DOUBLE / n_tok)
      + 0.2 * (least(n_tok, 100)::DOUBLE / 100.0) AS score
  FROM m
)
SELECT doc_id, n_tok AS n_tokens,
  {_sql_r6_ratio('sum_len', 'n_tok')} AS avg_token_len,
  {_sql_r6_ratio('n_uniq', 'n_tok')} AS uniq_ratio,
  {_sql_r6_ratio('n_stop', 'n_tok')} AS stop_ratio,
  {_sql_r6_ratio('200*(n_uniq + n_stop) + n_tok*least(n_tok, 100)',
                 '500*n_tok')} AS quality_score,
  CASE WHEN score >= 0.6 THEN 'high'
       WHEN score >= 0.4 THEN 'medium' ELSE 'low' END AS bucket
FROM r
""")
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: token count, mean token length, unique and
    stopword ratios, composite score + bucket. Pure column math."""
    doc = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    m = doc.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"), lambda a, b: a + b,
        ).alias("sum_len"),
        _hits(toks, _EN).alias("n_stop"),
    )
    uniq = F.col("n_uniq").cast("double") / F.col("n_tok")
    stop = F.col("n_stop").cast("double") / F.col("n_tok")
    score = (
        0.4 * uniq + 0.4 * stop
        + 0.2 * (F.least(F.col("n_tok"), F.lit(100)).cast("double") / 100.0)
    )
    # display ratios round EXACTLY in integer space (_r6_ratio — the r8
    # sweep after the q58 half-cent red row); the bucket compare keeps
    # the plain double score, an expression both engines evaluate
    # identically. score = 0.4u/n + 0.4s/n + 0.2·min(n,100)/100
    # = (200(u+s) + n·min(n,100)) / (500n) exactly.
    return m.select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        _r6_ratio(F.col("sum_len"), F.col("n_tok")).alias("avg_token_len"),
        _r6_ratio(F.col("n_uniq"), F.col("n_tok")).alias("uniq_ratio"),
        _r6_ratio(F.col("n_stop"), F.col("n_tok")).alias("stop_ratio"),
        _r6_ratio(
            F.lit(200) * (F.col("n_uniq") + F.col("n_stop"))
            + F.col("n_tok") * F.least(F.col("n_tok"), F.lit(100)),
            F.lit(500) * F.col("n_tok"),
        ).alias("quality_score"),
        F.when(score >= 0.6, "high").when(score >= 0.4, "medium")
        .otherwise("low").alias("bucket"),
    )


@q("text_token_stats", f"""
WITH toks AS ({_SQL_TOKS})
SELECT doc_id,
  len(t) AS n_ws_tokens,
  len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens,
  length(text) AS n_chars,
  {_sql_r6_ratio('length(text)', 'len(t)')} AS chars_per_token
FROM toks
""")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + regex word tokens (the BPE-ish
    pre-tokenizer split) + char/token ratio."""
    doc = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return doc.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0))
        .cast("bigint").alias("n_word_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        # exact integer-space rounding (_r6_ratio, r8 sweep)
        _r6_ratio(F.length("text"), F.size(toks))
        .alias("chars_per_token"),
    )


@q("doc_fingerprint", f"""
WITH toks AS ({_SQL_TOKS})
SELECT doc_id,
  list_reduce(list_concat([7]::BIGINT[],
    list_transform(t, x -> (length(x)*31 + ascii(x))::BIGINT)),
    (a, b) -> (a*131 + b) % 2147483647) AS fingerprint,
  len(t) AS n_tokens
FROM toks
""")
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling-hash fingerprint per document
    (functions/text.py rolling_fingerprint)."""
    doc = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return doc.select(
        "doc_id",
        rolling_fingerprint(toks).alias("fingerprint"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )


# -------------------------------------------------------------- multimodal
@q("multimodal_meta", """
SELECT doc_id, 'fake/raw' AS media_format,
  strlen(text) AS n_bytes,
  (('0x' || substr(md5(text), 1, 2))::INTEGER + 16) AS width,
  (('0x' || substr(md5(text), 3, 2))::INTEGER + 16) AS height,
  md5(text) AS content_md5
FROM documents
""")
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary payload column
    (operators/multimodal.py attach_binary_payload): byte length, fake
    dimensions, content hash. md5(utf8-bytes) ≡ DuckDB md5(text)."""
    doc = t(spark, sf_dir, "documents")
    withbin = attach_binary_payload(doc)
    return withbin.select(
        "doc_id", "media_format",
        F.octet_length(F.col("payload").cast("string")).alias("n_bytes"),
        "width", "height",
        F.md5("payload").alias("content_md5"),
    ).withColumn("n_bytes", F.col("n_bytes").cast("bigint"))


@q("multimodal_features", """
WITH c AS (
  SELECT doc_id, unnest(split(text, '')) AS ch FROM documents
),
h AS (
  SELECT doc_id,
         CAST(count(*) FILTER (unicode(ch) % 8 = 0) AS BIGINT) AS cnt0,
         CAST(count(*) FILTER (unicode(ch) % 8 = 7) AS BIGINT)
           AS cnt_last,
         CAST(count(*) AS BIGINT) AS n_bytes
  FROM c GROUP BY doc_id
)
SELECT h.doc_id, h.n_bytes,
       (('0x' || substr(md5(d.text), 1, 2))::INTEGER + 16) AS width,
       (('0x' || substr(md5(d.text), 3, 2))::INTEGER + 16) AS height,
       h.cnt0, h.cnt_last
FROM h JOIN documents d ON d.doc_id = h.doc_id
""")
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — ORACLE-
    BACKED since r10 (was rows-only r9): the decode stub's byte
    histogram (operators/multimodal.py _decode_bytes: bincount(bytes %
    8), L1-normalized) is deterministic, and the display recovers the
    EXACT integer bucket counts from the float features (cnt_j =
    round(feat_j · n_bytes) — the division's rounding error is ≪ 0.5,
    so recovery is exact), which DuckDB recomputes by per-character
    code-point classes (payloads are UTF-8 of printable-ASCII text, so
    bytes ≡ characters). The driver hash now pins the whole decode
    dataflow — Arrow batching, histogram, normalization — not just row
    counts. A real deployment swaps _decode_bytes for PIL/librosa;
    nothing else changes."""
    doc = t(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(doc))
    return feats.select(
        "doc_id", "n_bytes", "width", "height",
        F.round(F.element_at("feat", 1) * F.col("n_bytes"))
        .cast("bigint").alias("cnt0"),
        F.round(F.element_at("feat", N_FEATURES) * F.col("n_bytes"))
        .cast("bigint").alias("cnt_last"),
    )


@q("multimodal_frame_sample", """
WITH f AS (SELECT doc_id, text, strlen(text) AS n FROM documents
           WHERE doc_id < 300),
idx AS (
  SELECT doc_id, text,
         unnest(generate_series(0, ((n + 63) // 64) - 1)) AS fi
  FROM f WHERE n > 0
)
SELECT doc_id, fi AS frame_idx,
       md5(substr(text, fi * 64 + 1, 64))               AS frame_md5,
       CAST(strlen(substr(text, fi * 64 + 1, 64)) AS BIGINT) AS frame_len
FROM idx WHERE fi % 3 = 0
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style FRAME SAMPLING over binary payloads
    (operators/multimodal.py frame_sample): payload split into 64-byte
    frames, every 3rd frame emitted with its md5 — row expansion inside
    mapInPandas with bounded Arrow batches. Payloads are UTF-8 of ASCII
    text, so the oracle replays the byte slicing with substr+md5
    character arithmetic."""
    doc = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return frame_sample(attach_binary_payload(doc), stride=3)


@q("multimodal_resize", """
WITH d AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE doc_id < 300
),
g AS (
  SELECT doc_id,
         md5(string_agg(substr(text, CAST((i * n) // 64 + 1 AS INT), 1),
                        '' ORDER BY i)) AS resized_md5
  FROM (SELECT doc_id, text, n,
               unnest(generate_series(0, 63)) AS i
        FROM d)
  GROUP BY doc_id
)
SELECT doc_id, CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h,
       resized_md5
FROM g
""")
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STUB nearest-neighbor resize over binary payloads — ORACLE-BACKED
    since r10 (was rows-only r9): the stride-sampled 8×8 grid
    (operators/multimodal.py resize_stub: grid[i] = payload[(i·len) div
    64]) is deterministic integer arithmetic, so DuckDB replays the
    identical sampling with substr + string_agg and md5s the grid
    (payloads are UTF-8 of printable-ASCII text, so byte and character
    offsets coincide). The driver hash pins the full Arrow resize
    dataflow per document, not just row counts. A real deployment
    decodes and resizes with PIL; the binary-in/fixed-size-out shape is
    unchanged."""
    doc = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return resize_stub(attach_binary_payload(doc), out_w=8, out_h=8)


def _pagerank_oracle(iterations: int = 5, damping: float = 0.85,
                     n_nodes: int = 25) -> str:
    """Unrolls the fixed-iteration PageRank as chained CTEs (aggregating
    over a recursive CTE's own reference is not legal SQL, so the bounded
    loop is spelled out). Teleport/start constants are computed in Python
    and embedded with full precision so both engines use the SAME doubles
    (e.g. (1-0.85)/25 != 0.15/25 parsed from shorter literals)."""
    teleport = repr((1.0 - damping) / n_nodes)
    start = repr(1.0 / n_nodes)
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(f"""
s{i} AS (
  SELECT e.dst AS node, sum((r.rank * e.inv)::DECIMAL(28,12))::DOUBLE AS inp
  FROM e JOIN {prev} r ON r.node = e.src GROUP BY e.dst
),
r{i} AS (
  SELECT n.node, {teleport} + {damping} * coalesce(s{i}.inp, 0.0) AS rank
  FROM nodes n LEFT JOIN s{i} USING (node)
)""")
        prev = f"r{i}"
    return f"""
WITH
edges AS (
  SELECT n_nationkey AS src, (n_nationkey * 7 + 3) % 25 AS dst FROM nation
  UNION ALL
  SELECT n_nationkey, (n_nationkey * 11 + 5) % 25 FROM nation
),
deg AS (SELECT src, count(*) AS c FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, 1.0::DOUBLE / c AS inv
      FROM edges JOIN deg USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
r0 AS (SELECT node, {start}::DOUBLE AS rank FROM nodes),{",".join(steps)}
SELECT node, rank FROM {prev}
"""


@q("pagerank_nations", _pagerank_oracle())
def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE algorithm as a first-class query (the RepeatUnion/Spool
    plan family, rel/core/RepeatUnion.java — operators/graph.py): 5
    synchronous PageRank iterations over a deterministic 50-edge nation
    graph. Per-edge double products are summed through DECIMAL(28,12)
    (exact, order-independent) and the loop constants are embedded with
    full precision on both sides, so even this iterative float pipeline
    hash-matches the unrolled-CTE oracle bit-for-bit."""
    from drill_calcite_spark.operators.graph import pagerank

    nat = t(spark, sf_dir, "nation")
    edges = (
        nat.select(F.col("n_nationkey").alias("src"),
                   ((F.col("n_nationkey") * 7 + 3) % 25).alias("dst"))
        .union(
            nat.select(F.col("n_nationkey"),
                       ((F.col("n_nationkey") * 11 + 5) % 25)))
    )
    return pagerank(edges, iterations=5, damping=0.85)


# word n-gram text for the decontamination battery: n=3 keeps the
# battery non-degenerate on the short synthetic documents (171 flagged
# docs at sf0.01); production decontamination uses the same plan with
# n=8..13 — only the shingle width changes.
_DECON_N = 3
_SQL_SH3 = (
    "SELECT doc_id, CASE WHEN len(t) >= 3 THEN list_transform("
    "generate_series(1, len(t)-2), i -> t[i]||' '||t[i+1]||' '||t[i+2]) "
    "ELSE [] END ts FROM toks"
)


@q("decontaminate_ngrams", f"""
WITH toks AS ({_SQL_TOKS}),
sh AS ({_SQL_SH3}),
bg AS (SELECT DISTINCT unnest(ts) AS g FROM sh WHERE doc_id % 97 = 0),
cg AS (SELECT DISTINCT doc_id, unnest(ts) AS g FROM sh
       WHERE doc_id % 97 <> 0)
SELECT cg.doc_id, count(DISTINCT cg.g) AS matched_ngrams
FROM cg JOIN bg USING (g)
GROUP BY cg.doc_id
""")
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION — the training-pipeline step that flags
    corpus documents sharing any word n-gram with an evaluation set
    (here the deterministic doc_id % 97 == 0 slice stands in for the
    benchmark): benchmark n-grams are the SMALL side and broadcast;
    corpus n-grams explode once, inner-join the broadcast set, and
    aggregate matched-gram counts per document (partial map-side
    combine). At 100 TB the corpus side is embarrassingly parallel and
    the only shuffle is the per-doc count; the benchmark set (eval
    suites are ~10⁵-10⁶ grams) always fits in a broadcast."""
    docs = t(spark, sf_dir, "documents")
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    grams = (
        docs.repartition(n, F.col("doc_id"))
        .select("doc_id",
                F.explode(shingles(tokens(F.col("text")), _DECON_N))
                .alias("g"))
        .distinct()
    )
    bench = (grams.filter(F.col("doc_id") % 97 == 0)
             .select("g").distinct())
    corpus = grams.filter(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("matched_ngrams"))
    )


@q("sample_stratified_quota", """
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY md5(cast(doc_id AS VARCHAR))) AS rn
  FROM documents
)
SELECT doc_id, lang, source, rn AS pick_rank
FROM ranked WHERE rn <= 5
""")
def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED QUOTA sampling — the data-mixing step
    that caps each (lang, source) stratum at a fixed quota: rank every
    document inside its stratum by a content-free hash
    (md5(doc_id) — reproducible across engines AND runs, unlike
    rand()), keep the first K. One shuffle on the strata key; at 100 TB
    the per-stratum TOP-K never materializes the full sort (rank +
    filter prunes early under AQE). The DuckDB twin is the identical
    SQL, so the driver hash proves the exact sample membership."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", "source",
                    F.row_number().over(w).alias("pick_rank"))
        .filter(F.col("pick_rank") <= 5)
    )


# PII scrubbing patterns — conservative syntax shared by Java regex
# (Spark) and RE2 (DuckDB): no lookaround, no backreferences.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\(\d{3}\)\s\d{3}-\d{4}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_SQL_PII_RAW = (
    "substr(text, 1, 40) || ' reach user' || doc_id || "
    "'@example.com or (555) ' || lpad((doc_id % 1000)::VARCHAR, 3, '0') "
    "|| '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') "
    "|| ' ip 10.' || (doc_id % 256) || '.0.7'"
)


@q("scrub_pii", f"""
WITH raw AS (SELECT doc_id, {_SQL_PII_RAW} AS r FROM documents)
SELECT doc_id,
  len(regexp_extract_all(r, '{_PII_EMAIL}')) AS n_emails,
  len(regexp_extract_all(r, '{_PII_PHONE}')) AS n_phones,
  len(regexp_extract_all(r, '{_PII_IP}')) AS n_ips,
  regexp_replace(regexp_replace(regexp_replace(r,
    '{_PII_EMAIL}', '<EMAIL>', 'g'),
    '{_PII_PHONE}', '<PHONE>', 'g'),
    '{_PII_IP}', '<IP>', 'g') AS scrubbed
FROM raw
""")
def scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII SCRUBBING — the redaction step every training pipeline runs
    before a corpus ships: emails, phone numbers, and IPv4 addresses
    replaced with typed placeholder tokens, with per-document redaction
    counts for audit. The synthetic corpus carries no PII, so the
    battery INJECTS deterministic contact lines (doc_id-derived, byte-
    identical in both engines) and proves the scrubbing machinery — the
    regexes use the conservative syntax subset shared by Java regex and
    RE2, so the same patterns run verbatim at 100 TB and in the DuckDB
    twin. Map-only: three chained regexp_replace + three regexp_count
    per row, no shuffle, no Python."""
    docs = t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    raw = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(" reach user"), d.cast("string"),
        F.lit("@example.com or (555) "),
        F.lpad((d % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."), (d % 256).cast("string"), F.lit(".0.7"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>"),
        _PII_IP, "<IP>")
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(raw, F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count(raw, F.lit(_PII_IP)).alias("n_ips"),
        scrubbed.alias("scrubbed"),
    )


@q("pipeline_clean_corpus", f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
d AS (
  SELECT doc_id, text, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents JOIN keep USING (doc_id)
),
scored AS (
  SELECT doc_id, lang, t,
         CAST(len(t) AS BIGINT) AS n_tokens,
         len(list_filter(t, x -> length(x) >= 3))::DOUBLE
           / greatest(len(t), 1) AS frac_long
  FROM d
)
SELECT lang,
       count(*)                             AS n_docs,
       CAST(sum(n_tokens) AS BIGINT)        AS total_tokens,
       CAST(max(n_tokens) AS BIGINT)        AS max_tokens
FROM scored
WHERE n_tokens >= 5 AND frac_long >= 0.5
GROUP BY lang
""")
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data prep pipeline — the composition the whole
    LLM-operator family exists for: exact-dedup winners → quality gate
    (length + long-token fraction) → per-language token budget. Each stage
    is one of this repo's operators chained as DataFrames (one dedup
    shuffle + one final agg; the quality gate is a map-only filter fused
    by Catalyst); the oracle replays the identical pipeline in SQL."""
    doc = t(spark, sf_dir, "documents")
    winners = exact_dedup(doc, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    d = doc.join(winners, "doc_id")
    toks = tokens(F.col("text"))
    scored = d.select(
        "doc_id", "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(F.filter(toks, lambda x: F.length(x) >= 3)).cast("double")
         / F.greatest(F.size(toks), F.lit(1))).alias("frac_long"),
    )
    return (
        scored.filter((F.col("n_tokens") >= 5) & (F.col("frac_long") >= 0.5))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
    )


@q("text_repetition_stats", f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), g AS (
  SELECT doc_id, w,
    list_transform(list_zip(w[1:len(w)-1], w[2:len(w)]),
                   s -> s[1] || ' ' || s[2]) AS bg,
    CASE WHEN len(w) >= 5 THEN list_transform(
      generate_series(1, len(w)-4), i -> array_to_string(w[i:i+4], ' '))
      ELSE []::VARCHAR[] END AS g5
  FROM d
), counted AS (
  SELECT doc_id,
    CAST(len(w) AS BIGINT) AS n_words,
    CAST(len(bg) AS BIGINT) AS n_bigrams,
    CAST(coalesce(list_max(list_transform(list_distinct(bg),
      x -> len(list_filter(bg, y -> y = x)))), 0) AS BIGINT) AS top_bigram_n,
    CAST(len(g5) AS BIGINT) AS n_5grams,
    CAST(len(g5) - len(list_distinct(g5)) AS BIGINT) AS dup_5grams
  FROM g
)
SELECT doc_id, n_words, top_bigram_n, dup_5grams,
  CASE WHEN n_bigrams > 0
       THEN {_sql_r6_ratio('top_bigram_n', 'n_bigrams')} END
    AS top_bigram_frac,
  CASE WHEN n_5grams > 0
       THEN {_sql_r6_ratio('dup_5grams', 'n_5grams')} END
    AS dup_5gram_frac
FROM counted
""")
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRA-DOCUMENT REPETITION metrics — the Gopher/MassiveText
    repetition-removal rules (Rae et al. 2021 §A1.1: drop documents
    whose most-frequent 2-gram or duplicate n-gram mass exceeds a
    threshold): per document, the occurrence count of its most frequent
    word bigram and the fraction of 5-grams that are repeats.

    Plan shape: map-only after one balancing repartition — every metric
    is a higher-order array expression evaluated inside the row
    (``transform``/``filter``/``array_distinct``), no explode and no
    per-gram shuffle. The top-bigram count is O(distinct·total) lambda
    steps per document — the right trade below ~10k words/doc (the
    whole corpus-prep regime); beyond that, explode+groupBy per doc_id
    is the fallback. Ratios round in exact integer space (``_r6_ratio``
    — the r8 display-rounding rule), so both engines emit identical
    doubles; documents too short for a window emit NULL, not 0/0."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    d = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    w = F.col("w")
    g = d.select(
        "doc_id", "w",
        shingles(w).alias("bg"),
        shingles(w, 5).alias("g5"),
    )
    bg, g5 = F.col("bg"), F.col("g5")
    counted = g.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_words"),
        F.size(bg).cast("bigint").alias("n_bigrams"),
        F.coalesce(
            F.array_max(F.transform(
                F.array_distinct(bg),
                lambda x: F.size(F.filter(bg, lambda y: y == x)))),
            F.lit(0)).cast("bigint").alias("top_bigram_n"),
        F.size(g5).cast("bigint").alias("n_5grams"),
        (F.size(g5) - F.size(F.array_distinct(g5))).cast("bigint")
        .alias("dup_5grams"),
    )
    return counted.select(
        "doc_id", "n_words", "top_bigram_n", "dup_5grams",
        F.when(F.col("n_bigrams") > 0,
               _r6_ratio(F.col("top_bigram_n"), F.col("n_bigrams")))
        .alias("top_bigram_frac"),
        F.when(F.col("n_5grams") > 0,
               _r6_ratio(F.col("dup_5grams"), F.col("n_5grams")))
        .alias("dup_5gram_frac"),
    )


@q("dedup_passage", f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), c AS (
  SELECT doc_id, md5(p) AS h FROM (
    SELECT doc_id, unnest(list_transform(
      generate_series(1, len(w) // 8),
      i -> array_to_string(w[(i-1)*8+1:(i-1)*8+8], ' '))) AS p
    FROM d) u
), freq AS (
  SELECT h, count(DISTINCT doc_id) AS nd FROM c GROUP BY h
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_passages,
  CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_shared,
  {_sql_r6_ratio('count(*) FILTER (WHERE nd > 1)', 'count(*)')}
    AS shared_frac
FROM c JOIN freq USING (h)
GROUP BY doc_id
""")
def dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PASSAGE-LEVEL cross-document dedup — the sub-document granularity
    exact dedup (RefinedWeb/CCNet run it after document-level MinHash):
    documents are cut into non-overlapping 8-word passages; a passage
    whose md5 appears in MORE THAN ONE document is boilerplate shared
    across pages, and each document reports the fraction of its passages
    that are shared. Downstream, documents above a shared_frac threshold
    are dropped or passage-stripped.

    Scale shape: one explode (≈ n_words/8 rows per doc), then every
    shuffled payload is a 32-char md5 + ids — passage TEXT never
    crosses the wire. The global passage-frequency aggregate and the
    count-back join both hash the same md5 key, so AQE co-locates the
    two exchanges; partial counts combine map-side. Documents shorter
    than 8 words have no full passage and drop out (documented; the
    short-doc gate upstream of this operator removes them anyway)."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    w = F.col("w")
    chunks = F.when(
        F.size(w) >= 8,
        F.transform(
            F.sequence(F.lit(1), F.call_function("div", F.size(w), F.lit(8))),
            lambda i: F.concat_ws(" ", F.slice(w, (i - 1) * 8 + 1, 8)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    c = (
        docs.select("doc_id", tokens(F.col("text")).alias("w"))
        .select("doc_id", F.explode(chunks).alias("p"))
        .select("doc_id", F.md5(F.col("p")).alias("h"))
    )
    freq = c.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    shared = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
    return (
        c.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_passages"),
            shared.cast("bigint").alias("n_shared"),
        )
        .select(
            "doc_id", "n_passages", "n_shared",
            # exact integer-space rounding (_r6_ratio, r8 sweep)
            _r6_ratio(F.col("n_shared"), F.col("n_passages"))
            .alias("shared_frac"),
        )
    )


@q("text_vocab_topk", f"""
WITH d AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
    AS tok
  FROM documents
)
SELECT tok, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM d
GROUP BY tok
ORDER BY n_occurrences DESC, tok ASC
LIMIT 50
""")
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY INDUCTION — the first step of tokenizer training:
    the corpus-wide top-k tokens by occurrence count, with document
    frequency alongside. Deterministic tiebreak (count DESC, token
    ASC) so the top-k cut is engine-identical.

    Scale shape: one explode, then the (token → counts) aggregate
    combines map-side before the only wide shuffle (token strings are
    short; the distinct-doc count rides the same exchange), and the
    top-50 executes as TakeOrderedAndProject — per-partition heaps, a
    50-row driver merge, never a global sort of the vocabulary."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    d = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    return (
        d.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
             F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
        .orderBy(F.desc("n_occurrences"), F.asc("tok"))
        .limit(50)
    )


_BPE_ROUNDS = 5
_BPE_VOCAB = 200


def _bpe_oracle() -> str:
    """K unrolled merge rounds as CTE layers. Pair counting, the
    deterministic argmax, and the padded-double-space literal-replace
    merge mirror the Spark side expression-for-expression."""
    pair_list = (
        "list_transform(generate_series(1, len(string_split(seq, ' ')) - 1), "
        "i -> string_split(seq, ' ')[i] || ' ' || string_split(seq, ' ')[i+1])"
    )
    merge = (
        "trim(replace(replace(' ' || replace(v.seq, ' ', '  ') || ' ', "
        "' ' || replace(b.pair, ' ', '  ') || ' ', "
        "' ' || replace(b.pair, ' ', '') || ' '), '  ', ' '))"
    )
    parts = [f"""
WITH wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents) t
  GROUP BY w
),
v0 AS (
  SELECT w AS word, freq,
         trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq
  FROM wf ORDER BY freq DESC, w ASC LIMIT {_BPE_VOCAB}
)"""]
    for r in range(1, _BPE_ROUNDS + 1):
        parts.append(f""",
c{r} AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest({pair_list}) AS pair, freq FROM v{r - 1}) t
  GROUP BY pair
),
b{r} AS (SELECT pair, cnt FROM c{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
v{r} AS (SELECT v.word, v.freq, {merge} AS seq FROM v{r - 1} v, b{r} b)""")
    rows = "\nUNION ALL ".join(
        f"SELECT {r} AS merge_round, pair, replace(pair, ' ', '') AS merged, "
        f"cnt FROM b{r}"
        for r in range(1, _BPE_ROUNDS + 1))
    parts.append(f"\nSELECT * FROM ({rows}) ORDER BY merge_round")
    return "".join(parts)


@q("text_bpe_merges", _bpe_oracle())
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE MERGE INDUCTION — the tokenizer-training loop itself
    (byte-pair encoding, Sennrich et al. 2016): after
    ``text_vocab_topk`` picks the word vocabulary, this operator runs
    the first K=5 merge rounds — count adjacent symbol pairs across the
    (word, frequency) vocabulary, pick the most frequent pair
    (deterministic tie-break: count DESC, pair ASC), fuse it in every
    word, repeat — and returns the merge table (round, pair, merged
    symbol, corpus-weighted count), exactly what a tokenizer ships.

    Cross-engine exactness: word sequences are space-joined symbols;
    "merge pair (x, y)" is a LITERAL string replace on a double-spaced
    padding (`` x  y `` → `` xy ``) so each symbol keeps one delimiter
    for its neighbor — reproducing BPE's left-to-right non-overlapping
    merge ("a a a a" → "aa aa") with identical semantics in Spark's
    ``replace`` and DuckDB's — no regex, no lookaround (RE2∩Java
    discipline, the scrub_pii precedent). All counts are exact
    integers.

    Scale shape: the ONLY corpus-scale pass is the word-frequency
    aggregate (map-side combine, one shuffle on the word key — shared
    with text_vocab_topk upstream). Every merge round then operates on
    the bounded vocabulary table (top-{_BPE_VOCAB} here; ≤ a few 100k
    rows at any corpus size): pair explode ≈ |word| rows per word,
    partial-aggregated before its shuffle, and the 1-row argmax joins
    back by broadcast — the loop's cost is independent of corpus size,
    which is why single-machine BPE trainers parallelize the same way.
    The K rounds build one lazy plan; nothing collects to the driver."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    vocab = (
        wf.orderBy(F.desc("freq"), F.asc("w")).limit(_BPE_VOCAB)
        .select(
            F.col("w").alias("word"), "freq",
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("seq"),
        )
    )
    sp = F.lit(" ")
    merge_rows = []
    for r in range(1, _BPE_ROUNDS + 1):
        arr = F.split(F.col("seq"), " ")
        prs = F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - 1),
                lambda i: F.concat(
                    F.element_at(arr, i), sp, F.element_at(arr, i + 1)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        best = (
            vocab.select(F.explode(prs).alias("pair"), "freq")
            .groupBy("pair").agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair")).limit(1)
        )
        merge_rows.append(best.select(
            F.lit(r).cast("int").alias("merge_round"),
            "pair",
            F.replace(F.col("pair"), sp, F.lit("")).alias("merged"),
            "cnt",
        ))
        pair = F.col("pair")
        padded = F.concat(sp, F.replace(F.col("seq"), sp, F.lit("  ")), sp)
        pat = F.concat(sp, F.replace(pair, sp, F.lit("  ")), sp)
        rep = F.concat(sp, F.replace(pair, sp, F.lit("")), sp)
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                "word", "freq",
                F.trim(F.replace(F.replace(padded, pat, rep),
                                 F.lit("  "), sp)).alias("seq"),
            )
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out.orderBy("merge_round")


_CMS_HASH = ("('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || w), 1, 15))"
             "::BIGINT % 64")

@q("sketch_cms_heavy_hitters", f"""
WITH wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents) t
  GROUP BY w
),
cells AS (
  SELECT j, {_CMS_HASH} AS bucket, freq
  FROM wf, range(1, 4) t(j)
),
sk AS (
  SELECT j, bucket, CAST(sum(freq) AS BIGINT) AS cnt
  FROM cells GROUP BY j, bucket
),
top AS (SELECT w, freq FROM wf ORDER BY freq DESC, w ASC LIMIT 20),
probes AS (
  SELECT w, freq, j, {_CMS_HASH} AS bucket
  FROM top, range(1, 4) t(j)
)
SELECT w AS token, freq AS true_n,
       CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est_n
FROM probes LEFT JOIN sk USING (j, bucket)
GROUP BY w, freq
""")
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH heavy hitters (operators/sketch.py — Cormode &
    Muthukrishnan 2005): estimate corpus token frequencies from a FIXED
    3×64 counter matrix instead of a vocabulary-wide aggregate, then
    report the top-20 true heavy hitters with their sketch estimates
    alongside the exact counts. The md5-salted bucket hash is the
    repo's standard 15-hex-char idiom, so the DuckDB oracle rebuilds
    the sketch cell-for-cell and the driver hash pins the ESTIMATES —
    including their collision overestimates — not just bounds.

    Scale shape: the counter build is one aggregation whose key space
    is capped at d×w = 192 cells no matter the corpus cardinality —
    partial aggregation collapses every task's token stream map-side,
    so the exchange carries ≤ tasks×192 tiny rows (a groupBy(token)
    would shuffle the vocabulary). Estimation explodes only the 20
    candidates and broadcast-joins the 192-cell table. (The exact
    word-frequency CTE here exists to *grade* the sketch — a production
    pipeline ships only the sketch side; sketches merge cellwise, the
    property tests pin sketch(A∪B) = merge(sketch A, sketch B).)"""
    from drill_calcite_spark.operators.sketch import (
        cms_estimate, cms_sketch)

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    sk = cms_sketch(wf, "w", "freq")
    top = wf.orderBy(F.desc("freq"), F.asc("w")).limit(20)
    est = cms_estimate(sk, top.select("w"), "w")
    return (
        top.join(est, "w")
        .select(F.col("w").alias("token"),
                F.col("freq").alias("true_n"),
                F.col("est_n").cast("bigint").alias("est_n"))
    )


def _hll_oracle() -> str:
    from drill_calcite_spark.operators.sketch import HLL_NUMERATOR

    return f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
    AS hv
  FROM orders
),
r AS (
  SELECT hv % 64 AS bucket,
         CASE WHEN hv // 64 = 0 THEN 55
              ELSE 55 - length(bin(hv // 64)) END AS rank
  FROM h
),
regs AS (SELECT bucket, max(rank) AS m FROM r GROUP BY bucket),
summ AS (
  SELECT CAST(64 AS INT) AS n_buckets,
         CAST(count(*) AS INT) AS nonzero_regs,
         CAST(sum(CAST(1 AS BIGINT) << (55 - m))
              + (64 - count(*)) * (CAST(1 AS BIGINT) << 55) AS BIGINT)
           AS harmonic_sum_scaled
  FROM regs
),
tr AS (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) AS true_n
       FROM orders)
SELECT n_buckets, nonzero_regs, harmonic_sum_scaled,
       {HLL_NUMERATOR!r} / CAST(harmonic_sum_scaled AS DOUBLE) AS est_raw,
       true_n
FROM summ, tr
"""


@q("sketch_hll_distinct", _hll_oracle())
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERLOGLOG distinct count (operators/sketch.py — Flajolet et
    al. 2007) with an ENGINE-EXACT oracle: m=64 registers over the
    60-bit md5 hash (low 6 bits route, max leading-zero rank of the
    54-bit payload via integer `length(bin(p))`, never float log2), the
    harmonic sum kept in exact BIGINT space as Σ 2^(55-M_j) so no
    float-summation-order hazard exists, and a single IEEE division
    producing the raw estimate — DuckDB reproduces every column
    including est_raw bit-for-bit, which is the point: Spark's own
    approx_count_distinct is HLL++ whose internals are opaque to an
    oracle, while this sketch's STATE is the contract. True distinct
    count rides alongside to grade the estimate. Corrections (linear
    counting / large-range) are deliberately not applied — they need ln
    (docstring in hll_summary); orders is deep in the raw regime at
    every SF. Scale shape: one capped-keyspace aggregation (≤ 64 cells,
    map-side collapse) + a 1-row summary; registers merge by per-bucket
    max (property-tested)."""
    from drill_calcite_spark.operators.sketch import (
        hll_registers, hll_summary)

    orders = t(spark, sf_dir, "orders")
    summ = hll_summary(hll_registers(orders, "o_orderkey"))
    true_n = orders.agg(
        F.countDistinct("o_orderkey").cast("bigint").alias("true_n"))
    return summ.crossJoin(F.broadcast(true_n))


def _qsketch_oracle() -> str:
    from drill_calcite_spark.operators.qsketch import sql_qsketch_bucket

    return f"""
WITH v AS (
  SELECT CAST(l_extendedprice::DECIMAL(18,2) * 100 AS BIGINT) AS v
  FROM lineitem
),
s AS (
  SELECT {sql_qsketch_bucket('v')} AS bucket_lo,
         CAST(count(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1
),
c AS (
  SELECT bucket_lo,
         sum(cnt) OVER (ORDER BY bucket_lo) AS cum,
         sum(cnt) OVER () AS n
  FROM s
),
q(q_pct, num, den) AS (
  VALUES (1, 1, 100), (25, 1, 4), (50, 1, 2),
         (75, 3, 4), (90, 9, 10), (99, 99, 100)
)
SELECT CAST(q_pct AS BIGINT)        AS q_pct,
       CAST(num AS BIGINT)          AS q_num,
       CAST(den AS BIGINT)          AS q_den,
       CAST(min(bucket_lo) AS BIGINT) AS lo,
       CAST(max(n) AS BIGINT)         AS n
FROM c, q
WHERE cum >= (num * n + den - 1) // den
GROUP BY q_pct, num, den
"""


@q("sketch_qsketch_quantiles", _qsketch_oracle())
def sketch_qsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE QUANTILE SKETCH (operators/qsketch.py — HdrHistogram /
    DDSketch shape, VLDB 2019): price quantiles {1,25,50,75,90,99}% of
    lineitem extended prices (exact cents) from a log-bucket histogram
    whose key space is capped at ≤ 2048 buckets for ANY cardinality.
    Completes the CMS (frequency) / HLL (distinct) / quantile sketch
    triad. The bucket formula is pure integer arithmetic —
    ``length(bin(v))`` for the exponent, shift for the unit, floor-mod
    for the bucket — NO libm anywhere, so the DuckDB oracle rebuilds
    the sketch cell-for-cell and the driver hash pins every reported
    quantile bucket exactly. Reported ``lo`` satisfies
    ``lo ≤ x_q < lo·(1 + 2^-5)`` (3.125% relative error, unit-tested
    against exact quantiles; merge property sketch(A∪B) =
    merge(sketch A, sketch B) property-tested in tests/test_operators).

    Scale shape: ONE capped-keyspace aggregation (map-side collapse to
    ≤ 2048 cells before the exchange — plan-pinned); quantile
    extraction windows over the ≤ 2048-row SKETCH, never the data, so
    its single-task window is size-independent of the corpus."""
    from drill_calcite_spark.operators.qsketch import (
        qsketch_build, qsketch_quantiles)

    li = t(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("v"))
    sk = qsketch_build(li, "v")
    return qsketch_quantiles(
        sk, [(1, 100), (1, 4), (1, 2), (3, 4), (9, 10), (99, 100)])


def _qsketch_signed_oracle() -> str:
    from drill_calcite_spark.operators.qsketch import (
        sql_qsketch_bucket_signed)

    return f"""
WITH v AS (
  SELECT CAST(l_extendedprice::DECIMAL(18,2) * 100 AS BIGINT) - 2000000
           AS v
  FROM lineitem
),
s AS (
  SELECT {sql_qsketch_bucket_signed('v')} AS bucket_lo,
         CAST(count(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1
),
c AS (
  SELECT bucket_lo,
         sum(cnt) OVER (ORDER BY bucket_lo) AS cum,
         sum(cnt) OVER () AS n
  FROM s
),
q(q_pct, num, den) AS (
  VALUES (1, 1, 100), (10, 1, 10), (25, 1, 4), (50, 1, 2),
         (75, 3, 4), (90, 9, 10), (99, 99, 100)
)
SELECT CAST(q_pct AS BIGINT)        AS q_pct,
       CAST(num AS BIGINT)          AS q_num,
       CAST(den AS BIGINT)          AS q_den,
       CAST(min(bucket_lo) AS BIGINT) AS lo,
       CAST(max(n) AS BIGINT)         AS n
FROM c, q
WHERE cum >= (num * n + den - 1) // den
GROUP BY q_pct, num, den
"""


@q("sketch_qsketch_signed", _qsketch_signed_oracle())
def sketch_qsketch_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIGNED quantile sketch (r10 — the standard two-sided DDSketch
    layout: negative store + zero bucket + positive store) over a
    signed telemetry-delta column: lineitem prices in exact cents
    offset by -$20,000, so both tails are populated and the low
    quantiles land in NEGATIVE cells. The signed cell key is
    ``sign(v)·bucket(|v|)`` — monotone in value space, so the SAME
    cumulative rank rule and cellwise merge apply unchanged; a negative
    key is its cell's value-space UPPER bound and keeps the 2^-5
    relative-MAGNITUDE error (property-tested both tails,
    tests/test_llm.py). Pure integer arithmetic end to end, so the
    DuckDB oracle rebuilds the signed sketch cell-for-cell and the
    driver hash pins every reported cell exactly. Closes the r9
    verdict's 'caller-side offset' gap — signed deltas sketch
    natively. Scale shape: identical to the unsigned row (ONE
    capped-keyspace aggregation, ≤ 4097 cells, window over the SKETCH
    only)."""
    from drill_calcite_spark.operators.qsketch import (
        qsketch_build, qsketch_quantiles)

    li = t(spark, sf_dir, "lineitem").select(
        ((F.col("l_extendedprice").cast("decimal(18,2)") * 100)
         .cast("bigint") - 2000000).alias("v"))
    sk = qsketch_build(li, "v", signed=True)
    return qsketch_quantiles(
        sk, [(1, 100), (1, 10), (1, 4), (1, 2), (3, 4), (9, 10),
             (99, 100)])


def _qsketch_double_oracle() -> str:
    from drill_calcite_spark.operators.qsketch import (
        sql_qsketch_bucket_double_signed)

    return f"""
WITH v AS (
  SELECT CAST(value - 50.0 AS DOUBLE) AS v FROM events
),
s AS (
  SELECT {sql_qsketch_bucket_double_signed('v')} AS bucket_lo,
         CAST(count(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1
),
c AS (
  SELECT bucket_lo,
         sum(cnt) OVER (ORDER BY bucket_lo) AS cum,
         sum(cnt) OVER () AS n
  FROM s
),
q(q_pct, num, den) AS (
  VALUES (1, 1, 100), (10, 1, 10), (25, 1, 4), (50, 1, 2),
         (75, 3, 4), (90, 9, 10), (99, 99, 100)
)
SELECT CAST(q_pct AS BIGINT)          AS q_pct,
       CAST(num AS BIGINT)            AS q_num,
       CAST(den AS BIGINT)            AS q_den,
       CAST(min(bucket_lo) AS DOUBLE) AS lo,
       CAST(max(n) AS BIGINT)         AS n
FROM c, q
WHERE cum >= (num * n + den - 1) // den
GROUP BY q_pct, num, den
"""


@q("sketch_qsketch_double", _qsketch_double_oracle())
def sketch_qsketch_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOUBLE-valued quantile sketch (r11 — the r10 verdict's stretch
    item: real telemetry is floating-point; callers must not have to
    pre-quantize to integer cents): signed event-value deltas
    ``value - 50.0`` sketched by exact IEEE mantissa-prefix bucketing.
    The bucket lower bound ``lo = floor(v / 2^(e-B)) · 2^(e-B)`` is
    EXACT binary floating point once the binary exponent is known, and
    the exponent — the only libm call (log2) — is pinned by a ±1 CASE
    correction against the exact powers ``2^e ≤ v < 2^(e+1)``, so the
    DuckDB oracle rebuilds every cell bit for bit and the driver hash
    pins each reported quantile cell exactly (operators/qsketch.py
    module docstring). Same 2^-5 relative-magnitude error contract as
    the integer sketch, property-tested against exact quantiles in
    tests/test_llm.py; merge linearity property-tested alongside.

    Scale shape: identical to the integer rows — ONE capped-keyspace
    aggregation whose cell count is bounded by the data's DYNAMIC RANGE
    (≤ 2^B cells per populated binary exponent per sign), never its
    cardinality; map-side collapse before the exchange; the quantile
    window runs over the SKETCH only."""
    from drill_calcite_spark.operators.qsketch import (
        qsketch_build, qsketch_quantiles)

    ev = t(spark, sf_dir, "events").select(
        (F.col("value") - F.lit(50.0)).cast("double").alias("v"))
    sk = qsketch_build(ev, "v", signed=True, double=True)
    return qsketch_quantiles(
        sk, [(1, 100), (1, 10), (1, 4), (1, 2), (3, 4), (9, 10),
             (99, 100)], lo_type="double")


@q("chunk_sliding_windows", """
WITH d AS (
  SELECT doc_id, source, text, length(text) AS L FROM documents
  WHERE length(text) > 0
), n AS (
  SELECT doc_id, source, text, L,
         CASE WHEN L <= 128 THEN 1
              ELSE 1 + (L - 33) // 96 END AS n_chunks
  FROM d
), e AS (
  SELECT doc_id, source, text, L, n_chunks,
         unnest(range(n_chunks)) AS i
  FROM n
)
SELECT doc_id, source,
       CAST(i AS BIGINT)                          AS chunk_id,
       CAST(n_chunks AS BIGINT)                   AS n_chunks,
       CAST(i * 96 AS BIGINT)                     AS chunk_offset,
       substr(text, CAST(i * 96 + 1 AS INT), 128) AS chunk_text,
       CAST(length(substr(text, CAST(i * 96 + 1 AS INT), 128)) AS BIGINT)
                                                  AS chunk_len,
       md5(substr(text, CAST(i * 96 + 1 AS INT), 128)) AS chunk_md5
FROM e
""")
def chunk_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-WINDOW CHUNKING — the retrieval/embedding-prep step of a
    corpus pipeline (RAG indexing, long-doc embedding): each document
    splits into fixed 128-char windows at stride 96 (32-char overlap so
    no boundary context is lost), the standard chunk-with-overlap
    schema. Chunk count is the exact integer form
    ``1 + (L - size + stride - 1) div stride`` for L > size (= 1 + (L -
    33) div 96 here) — no float ceil, so both engines agree on every
    boundary; the final chunk truncates at end-of-document. Each chunk
    row carries its offset, text, length, and md5 (the identity a
    downstream near-dup or embedding stage keys on — dedup_passage is
    the consumer shape).

    Scale shape: one explode (``sequence`` + Catalyst Generate) per
    document — map-only, NO shuffle and no window function; chunk rows
    are produced and consumed streaming within the stage, so the fan-out
    (~len/stride per doc) never materializes on the driver. At 100 TB
    the chunk table is written partitioned by source straight from the
    map stage; substring on UTF-8 is character-based in both engines,
    so multibyte text chunks identically."""
    docs = t(spark, sf_dir, "documents")
    L = F.length("text")
    d = docs.filter(L > 0).select(
        "doc_id", "source", "text", L.alias("L"),
        F.when(L <= 128, F.lit(1))
        .otherwise(1 + F.call_function("div", (L - 33).cast("bigint"),
                                       F.lit(96).cast("bigint")))
        .alias("n_chunks"),
    )
    e = d.withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)))
    chunk = F.substring(F.col("text"), F.col("i") * 96 + 1, F.lit(128))
    return e.select(
        "doc_id", "source",
        F.col("i").cast("bigint").alias("chunk_id"),
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        (F.col("i") * 96).cast("bigint").alias("chunk_offset"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


@q("pack_token_chunks", """
WITH d AS (
  SELECT doc_id, source,
    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
      AS n_tok
  FROM documents
), ordered AS (
  SELECT doc_id, source, n_tok,
    CAST(sum(n_tok) OVER (
      PARTITION BY source
      ORDER BY md5(doc_id::VARCHAR), doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM d WHERE n_tok > 0
)
SELECT doc_id, source, n_tok,
  CAST((cum - n_tok) // 512 AS BIGINT) AS chunk_start,
  CAST((cum - 1) // 512 - (cum - n_tok) // 512 + 1 AS BIGINT)
    AS chunks_spanned
FROM ordered
""")
def pack_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING — the batch-construction step of LLM training:
    documents are concatenated in a deterministic shuffled order and cut
    into fixed 512-token chunks (the GPT-style pack-then-split; tokens =
    whitespace tokens here). Each document reports the chunk index where
    it starts and how many chunk boundaries it spans — exactly what a
    writer needs to emit packed training shards.

    Determinism: the concatenation order is (md5(doc_id), doc_id) — a
    content-free pseudo-shuffle identical across engines and runs (the
    ``sample_stratified_quota`` convention), never ``rand()``. All chunk
    arithmetic is integer (``div`` / ``//`` on non-negative BIGINTs), so
    both engines agree bit-for-bit.

    Scale shape: packing is order-DEFINED, so each packing stream is one
    window partition; the stream key is ``source`` here, standing in for
    the (dataset, output-shard) key a production pipeline packs by —
    thousands of shards → thousands of independent partitions, each
    bounded by shard size, never a global single-task window. One
    shuffle on the stream key; the window itself is a running sum,
    computed in one pass per partition."""
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    win = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    B = F.lit(512)
    ordered = d.withColumn("cum", F.sum("n_tok").over(win).cast("bigint"))
    start = F.call_function("div", F.col("cum") - F.col("n_tok"), B)
    end = F.call_function("div", F.col("cum") - 1, B)
    return ordered.select(
        "doc_id", "source", "n_tok",
        start.cast("bigint").alias("chunk_start"),
        (end - start + 1).cast("bigint").alias("chunks_spanned"),
    )


@q("text_surprisal_score", f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*)::BIGINT AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c)::BIGINT AS n FROM vocab),
b AS (
  SELECT toks.doc_id, toks.lang,
         length(bin(tot.n // vocab.c)) - 1 AS bits
  FROM toks JOIN vocab ON toks.tok = vocab.tok CROSS JOIN tot
),
d AS (
  SELECT doc_id, lang, count(*)::BIGINT AS n_tokens,
         sum(bits)::BIGINT AS sum_bits
  FROM b GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_tokens, sum_bits,
       {_sql_r6_ratio('sum_bits', 'n_tokens')} AS mean_bits
FROM d
""")
def text_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIGRAM-LM SURPRISAL scoring — the perplexity-filter step of corpus
    prep (CCNet, Wenzek et al. 2020: score each document by average token
    surprisal under a language model; outliers on either end are
    boilerplate or garbage). The LM here is the corpus's own unigram
    distribution; per-token surprisal is the INTEGER bit count
    ``floor(log2(N / count(tok)))``, computed without any transcendental
    call as ``length(bin(N div c)) - 1`` — exact on both engines (libm
    ``log`` is NOT cross-engine bit-stable; integer bin-length is), the
    same spelling discipline as ``_r6_ratio``. Mean bits per token uses
    the exact integer half-up ratio.

    Scale shape: one groupBy(token) for the vocab (heavy-tailed — the
    stopword keys are exactly what AQE skew-split handles), one
    token-keyed join back (vocab is NOT broadcast by default: at corpus
    scale raw vocab is 10⁸+ rows; a production variant caps vocab to
    top-M + UNK, which then broadcasts), one groupBy(doc_id). No Python
    anywhere; ``bin`` and ``div`` are whole-stage-codegen expressions.
    """
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    doc = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    tok = doc.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    bits = (F.length(F.bin(F.call_function("div", F.col("n"), F.col("c"))))
            - 1)
    scored = (
        tok.join(vocab, "tok")
        .crossJoin(F.broadcast(total))  # 1-row global scalar
        .select("doc_id", "lang", bits.alias("bits"))
    )
    d = scored.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tokens"),
        F.sum("bits").cast("bigint").alias("sum_bits"),
    )
    return d.select(
        "doc_id", "lang", "n_tokens", "sum_bits",
        _r6_ratio(F.col("sum_bits"), F.col("n_tokens")).alias("mean_bits"),
    )


@q("mix_domain_weights", f"""
WITH s AS (
  SELECT lang, source, count(*)::BIGINT AS n_docs FROM documents
  GROUP BY lang, source
),
l AS (SELECT lang, sum(n_docs)::BIGINT AS lang_docs FROM s GROUP BY lang),
g AS (
  SELECT sum(lang_docs)::BIGINT AS total,
         count(*)::BIGINT AS n_langs
  FROM l
)
SELECT s.lang, s.source, s.n_docs,
       {_sql_r6_ratio('l.lang_docs', 'g.total')} AS corpus_share,
       {_sql_r6_ratio('g.total', 'g.n_langs * l.lang_docs')} AS weight,
       least((2 * s.n_docs * g.total + g.n_langs * l.lang_docs)
             // (2 * g.n_langs * l.lang_docs), s.n_docs * 3) AS quota_docs
FROM s JOIN l ON s.lang = l.lang CROSS JOIN g
""")
def mix_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-MIXTURE reweighting — compute per-stratum sampling weights so
    the sampled corpus hits a TARGET distribution (here: uniform over
    languages, the simplest of the DoReMi/Pile-style mixture specs;
    the target spec is one line to swap). For each (lang, source)
    stratum: ``weight = target_share(lang) / corpus_share(lang)`` and an
    integer per-stratum document quota ``round(n_docs * weight)`` capped
    at 3× (the standard upsampling cap that keeps rare-language
    repetition bounded — Conneau et al. 2020 use temperature for the
    same purpose).

    Exactness: shares/weights are the integer half-up micro-ratio
    (``_r6_ratio``); the quota is the same half-up integer form
    ``(2·n·T + L·l) div (2·L·l)`` — no float round() anywhere.

    Scale shape: two tiny aggregations (strata ≪ docs) + a broadcast of
    the 1-row global; the weights table is the input to
    ``sample_stratified_quota``-style top-K-by-hash selection, which
    does the actual sampling in one shuffle."""
    s = (t(spark, sf_dir, "documents")
         .groupBy("lang", "source").agg(F.count("*").alias("n_docs")))
    lang = s.groupBy("lang").agg(F.sum("n_docs").alias("lang_docs"))
    g = lang.agg(F.sum("lang_docs").alias("total"),
                 F.count("*").alias("n_langs"))
    joined = (s.join(F.broadcast(lang), "lang")
              .crossJoin(F.broadcast(g)))
    quota = F.call_function(
        "div",
        F.lit(2) * F.col("n_docs") * F.col("total")
        + F.col("n_langs") * F.col("lang_docs"),
        F.lit(2) * F.col("n_langs") * F.col("lang_docs"))
    return joined.select(
        "lang", "source", "n_docs",
        _r6_ratio(F.col("lang_docs"), F.col("total")).alias("corpus_share"),
        _r6_ratio(F.col("total"),
                  F.col("n_langs") * F.col("lang_docs")).alias("weight"),
        F.least(quota, F.col("n_docs") * 3).cast("bigint")
        .alias("quota_docs"),
    )


# ------------------------------------------------------------------- bench
def bench_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_minhash_lsh(spark, sf_dir)


def bench_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ANN bench: 10% of vectors as queries vs the full corpus —
    the realistic batch-query shape at scale. Uses the blocked-matmul path
    (operators/similarity.py cosine_topk_blocked): numpy BLAS per Arrow
    batch instead of a per-pair JVM fold."""
    emb = t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 10 == 0)
    return cosine_topk_blocked(qs, emb, "vec_id", "embedding", k=5)


QUERIES["bench_minhash_dedup"] = bench_minhash_dedup
# same pipeline as dedup_minhash_lsh → same replay oracle
ORACLES["bench_minhash_dedup"] = _minhash_oracle()
QUERIES["bench_ann_topk"] = bench_ann_topk


@q("split_train_holdout", """
WITH b AS (
  SELECT source, n_chars,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))
           ::BIGINT % 1000 AS bkt
  FROM documents
), a AS (
  SELECT source,
         CASE WHEN bkt < 960 THEN 'train'
              WHEN bkt < 980 THEN 'val'
              ELSE 'test' END AS split,
         n_chars
  FROM b
)
SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM a GROUP BY 1, 2
""")
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (96/2/2) with a
    per-source stratification report — the assignment step every
    training-data pipeline needs before writing shards.

    Scale design: the split is PURE COLUMN ALGEBRA — bucket =
    md5('split:' || doc_id) mod 1000 — so it is (a) map-only (no
    shuffle to assign; the only exchange is the small report
    aggregate), (b) reproducible run-over-run and executor-over-
    executor, and (c) STABLE UNDER REPARTITIONING AND BACKFILL: a
    document keeps its split when the corpus is re-partitioned, grows,
    or is re-processed incrementally. Spark's own
    ``DataFrame.randomSplit`` guarantees none of that — its sampling
    is seeded per-partition, so the same row can change split when the
    upstream partitioning changes, which silently leaks held-out
    documents into training at the 100 TB backfill. The salt prefix
    ('split:') decorrelates this hash from every other md5(doc_id)
    keyspace in the pipeline (dedup clusters, fingerprints), so
    holdout membership is independent of dedup-bucket membership. The
    oracle replays the identical bucketing in DuckDB, pinning the
    exact per-source split sizes and char totals."""
    docs = t(spark, sf_dir, "documents")
    bkt = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit("split:"),
                           F.col("doc_id").cast("string"))), 1, 15),
            16, 10).cast("bigint") % 1000)
    split = (F.when(bkt < 960, "train")
             .when(bkt < 980, "val")
             .otherwise("test"))
    return (docs
            .groupBy(F.col("source"), split.alias("split"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("sum_chars")))


def _ivf_fixed_oracle(stride: int = 31, nprobe: int = 4, k: int = 5) -> str:
    """Replays the FIXED-quantizer IVF end to end: centroid sample, cell
    scoring (−2·v·c + ‖c‖², the same ordered double fold), assignment,
    nprobe probing, and the exact cosine rerank — every float in the
    same IEEE operation order as the Spark side."""
    d_vc = _SQL_DOT.format(a="e.v", b="cents.c")
    d_cc = _SQL_DOT.format(a="cents.c", b="cents.c")
    d_qn = _SQL_DOT.format(a="p.vq", b="a.vc")
    d_qq = _SQL_DOT.format(a="p.vq", b="p.vq")
    d_nn = _SQL_DOT.format(a="a.vc", b="a.vc")
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v
           FROM embeddings),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS c
          FROM e WHERE vec_id % {stride} = 0),
scored AS (SELECT e.vec_id, e.v, cents.cell,
                  -2 * ({d_vc}) + ({d_cc}) AS d
           FROM e CROSS JOIN cents),
ranked AS (SELECT vec_id, v, cell,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d, cell) AS rn
           FROM scored),
assign AS (SELECT vec_id, v AS vc, cell FROM ranked WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, v AS vq, cell
           FROM ranked WHERE rn <= {nprobe}),
cands AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ({d_qn}) / (sqrt({d_qq}) * sqrt({d_nn})) AS c
  FROM probes p JOIN assign a USING (cell)
  WHERE p.query_id <> a.vec_id
),
topk AS (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id) AS rank
  FROM cands
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(c, 6) AS cos
FROM topk WHERE rank <= {k}
"""


@q("ann_ivf_fixed_topk", _ivf_fixed_oracle())
def ann_ivf_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a FIXED deterministic coarse quantizer — the
    ORACLE-BACKED twin of ann_ivf_topk (whose k-means training is
    iterative and rows-only by necessity). The quantizer is the corpus
    sample vec_id % 31 = 0 (every IVF needs SOME coarse quantizer; a
    corpus stride sample is a standard cheap one), so the ENTIRE scale
    path — cell scoring via the flat literal centroid matrix, inverted-
    file assignment, nprobe=4 probing, candidate join keyed on cell,
    exact cosine rerank — is SQL-replayable and the driver hash pins
    every float (the ordered-fold arithmetic is bit-identical across
    engines, functions/vector.py). Centroids ride through ONE bounded
    driver collect of ~|corpus|/stride vectors — the same O(nlist)
    materialization k-means itself performs. This upgrades the IVF
    family from rows-only to hash-proven; recall-vs-exact remains
    asserted for the k-means variant in tests/test_llm.py."""
    emb = t(spark, sf_dir, "embeddings")
    centers = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") % 31 == 0)
        .orderBy("vec_id").select("embedding").collect()
    ]
    out = ivf_ann_topk(emb, "vec_id", "embedding", k=5,
                       nprobe=4, centers=centers)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@q("pairs_negative_sampling", """
WITH n AS (SELECT count(*) AS nn FROM documents),
q AS (SELECT doc_id AS query_id FROM documents WHERE doc_id % 5 = 0),
slots AS (SELECT query_id, s.slot
          FROM q CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS slot) s),
neg AS (SELECT query_id, slot,
               ('0x' || substr(md5('neg:' || CAST(query_id AS VARCHAR)
                                   || ':' || CAST(slot AS VARCHAR)),
                               1, 15))::BIGINT
                 % (SELECT nn FROM n) AS neg_id
        FROM slots)
SELECT query_id, CAST(slot AS BIGINT) AS slot, neg_id,
       d.n_chars AS neg_chars, d.source AS neg_source
FROM neg JOIN documents d ON d.doc_id = neg.neg_id
WHERE neg_id <> query_id
""")
def pairs_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive-pair training:
    each query document draws k=4 pseudo-random corpus negatives by
    salted hash — ``md5('neg:' || doc_id || ':' || slot) mod N`` over
    the contiguous id space — with accidental self-draws filtered and
    each negative's features attached by join.

    Scale design: the draw is PURE COLUMN ALGEBRA (no RNG state), so
    pairs are reproducible run-over-run and stable under repartition/
    backfill — the same property argued for split_train_holdout;
    the corpus size N enters as a broadcast ONE-ROW aggregate (the q11
    global-scalar pattern), never a driver-side count action; the only
    real shuffle is the feature-attach join on neg_id, which is the
    workload's irreducible data motion. The salt decorrelates draw
    membership from the split/dedup/fingerprint md5 keyspaces. The
    oracle replays the identical hash draw, so the driver pins the
    exact pair set."""
    docs = t(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    slots = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("query_id"))
        .crossJoin(F.broadcast(n))
        .select("query_id", "__n",
                F.explode(F.sequence(F.lit(1), F.lit(4))).alias("slot"))
    )
    neg = (
        slots.withColumn(
            "neg_id",
            F.conv(F.substring(
                F.md5(F.concat(F.lit("neg:"),
                               F.col("query_id").cast("string"),
                               F.lit(":"),
                               F.col("slot").cast("string"))), 1, 15),
                16, 10).cast("bigint") % F.col("__n"))
        .filter(F.col("neg_id") != F.col("query_id"))
    )
    return (
        neg.join(docs.select(F.col("doc_id").alias("neg_id"),
                             F.col("n_chars").alias("neg_chars"),
                             F.col("source").alias("neg_source")),
                 "neg_id")
        .select("query_id", F.col("slot").cast("bigint").alias("slot"),
                "neg_id", "neg_chars", "neg_source")
    )


def _jl_oracle(k: int = 8, dim: int = 64, table: int = 97) -> str:
    """Replays the md5-hyperplane projection in SQL: each output
    dimension is the same ordered left-fold dot product the Spark side
    folds (weights are x.5 values — exact in binary — so every partial
    sum matches bit-for-bit; see functions/vector.py)."""
    from drill_calcite_spark.operators.similarity import hyperplanes

    def proj(w):
        lits = ", ".join(repr(x) for x in w)
        return _SQL_DOT.format(a="v", b=f"[{lits}]::DOUBLE[]")

    cols = ", ".join(
        f"round({proj(w)}, 6) AS d{i}"
        for i, w in enumerate(hyperplanes(k, dim, table)))
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v
           FROM embeddings)
SELECT vec_id, {cols} FROM e
"""


@q("embed_random_projection", _jl_oracle())
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection: reduce the embedding
    column from 64 to 8 dimensions with a FIXED pseudo-random projection
    matrix — the standard cheap pre-step before clustering / coarse ANN /
    near-dup at corpus scale (JL lemma: pairwise distances survive to
    within ε with k = O(log n / ε²) output dims).

    Scale design: the matrix is derived from md5 (operators/
    similarity.hyperplanes — no RNG state to ship), rides the plan as
    ONE flat array literal (O(1) plan size in dims — the r5 plan-
    explosion lesson), and each output dim is a JVM-side ordered-fold
    dot product (functions/vector.dot) — the whole operator is MAP-ONLY:
    no shuffle, no Python, no collect, embarrassingly parallel over any
    partitioning at 100 TB. The oracle replays the identical fold, so
    every projected float is hash-pinned bit-for-bit."""
    from drill_calcite_spark.functions.vector import dot
    from drill_calcite_spark.operators.similarity import _planes_flat_lit

    k, dim, table = 8, 64, 97
    emb = t(spark, sf_dir, "embeddings")
    flat = _planes_flat_lit([table], k, dim)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cols = [F.round(dot(v, F.slice(flat, i * dim + 1, dim)), 6)
            .alias(f"d{i}") for i in range(k)]
    return emb.select("vec_id", *cols)


@q("shuffle_epoch_order", """
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 15))
           ::BIGINT AS pos
  FROM documents
)
SELECT doc_id, CAST(pos % 32 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY pos % 32
                               ORDER BY pos, doc_id) AS BIGINT) AS rk
FROM h
""")
def shuffle_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EPOCH SHUFFLE: assign every document a pseudo-random
    position for training epoch 7 — shard = hash mod 32, rank within
    shard — the global-order shuffle a training-data pipeline runs once
    per epoch before writing shards.

    Scale design: the position is pure column algebra (salted md5 of
    the doc id — a new salt per epoch gives a fresh permutation with
    zero RNG state), so assignment is MAP-ONLY and reproducible across
    runs, executors, and repartitioning — unlike ``orderBy(rand())``,
    which is neither reproducible nor resumable and plans a GLOBAL sort.
    Ordering happens only WITHIN each of the 32 shards (one hash
    exchange + per-shard sort — at 100 TB set shards ≈ output-file
    count; no single-task global window anywhere). The oracle replays
    the identical hash, so shard membership and every in-shard rank are
    hash-pinned."""
    docs = t(spark, sf_dir, "documents")
    pos = F.conv(F.substring(
        F.md5(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("bigint")
    h = docs.select("doc_id", pos.alias("pos"),
                    (pos % 32).alias("shard"))
    w = Window.partitionBy("shard").orderBy("pos", "doc_id")
    return h.select("doc_id", F.col("shard").cast("bigint").alias("shard"),
                    F.row_number().over(w).cast("bigint").alias("rk"))


_BPE_APPLY = [("e r", "er"), ("i n", "in"), ("o w", "ow"),
              ("s t", "st"), ("er g", "erg")]


def _bpe_encode_oracle() -> str:
    """Replays the merge chain per word: the same padded double-space
    LITERAL replace the Spark side runs (text_bpe_merges discipline —
    left-to-right non-overlapping fusion, no regex)."""
    expr = "' ' || replace(trim(regexp_replace(w, '(.)', '\\1 ', 'g')), " \
           "' ', '  ') || ' '"
    for pat, rep in _BPE_APPLY:
        pad_pat = f"' {pat.replace(' ', '  ')} '"
        pad_rep = f"' {rep} '"
        expr = (f"replace(replace({expr}, {pad_pat}, {pad_rep}), "
                f"'  ', ' ')")
        expr = f"' ' || replace(trim({expr}), ' ', '  ') || ' '"
    seq = f"trim({expr})"
    return f"""
WITH w AS (
  SELECT doc_id, n_chars,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
), enc AS (
  SELECT doc_id, n_chars,
         length({seq}) - length(replace({seq}, ' ', '')) + 1 AS n_sym
  FROM w
)
SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS n_tokens,
       CAST(min(n_chars) AS BIGINT) AS n_chars
FROM enc GROUP BY 1
"""


@q("text_bpe_encode", _bpe_encode_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TOKENIZER APPLICATION — the other half of ``text_bpe_merges``:
    given a SHIPPED merge table (five merges here, incl. one
    second-order merge 'er g'→'erg' that only exists after the first
    fires), encode every document and report its post-merge token
    count — the pass a training pipeline runs over the full corpus to
    cost out a tokenization before committing to it.

    Each word becomes a spaced symbol sequence; each merge is the same
    padded double-space LITERAL replace the induction loop uses
    (left-to-right, non-overlapping, regex-free — RE2∩Java
    discipline), applied in merge-table order; the doc's token count is
    the sum of per-word symbol counts. Everything is higher-order
    column algebra over the words array — the per-doc sum is an IN-ROW
    fold, so the whole operator is MAP-ONLY (zero shuffles at any
    corpus size), no Python, merge table inlined as
    five literal replaces exactly as a production tokenizer would
    broadcast its merge ranks. The oracle replays the identical
    replace chain, so every per-document count is hash-pinned."""
    docs = t(spark, sf_dir, "documents")
    sp = F.lit(" ")

    def encode(word):
        seq = F.concat(
            sp, F.replace(F.trim(F.regexp_replace(word, "(.)", "$1 ")),
                          sp, F.lit("  ")), sp)
        for pat, rep in _BPE_APPLY:
            pad_pat = F.lit(f" {pat.replace(' ', '  ')} ")
            pad_rep = F.lit(f" {rep} ")
            seq = F.replace(F.replace(seq, pad_pat, pad_rep),
                            F.lit("  "), sp)
            seq = F.concat(sp, F.replace(F.trim(seq), sp, F.lit("  ")), sp)
        seq = F.trim(seq)
        return (F.length(seq)
                - F.length(F.replace(seq, sp, F.lit("")))) + 1

    n_tok = F.aggregate(
        F.transform(tokens(F.col("text")), encode),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return (docs.select("doc_id", n_tok.alias("n_tokens"),
                        F.col("n_chars").cast("bigint").alias("n_chars")))


def _sketch_gate_oracle() -> str:
    from drill_calcite_spark.operators.qsketch import sql_qsketch_bucket

    return f"""
WITH v AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents
),
s AS (
  SELECT {sql_qsketch_bucket('v')} AS bucket_lo,
         CAST(count(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1
),
c AS (
  SELECT bucket_lo,
         sum(cnt) OVER (ORDER BY bucket_lo) AS cum,
         sum(cnt) OVER () AS n
  FROM s
),
thr AS (
  SELECT min(bucket_lo) AS lo FROM c
  WHERE cum >= (1 * n + 4 - 1) // 4
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(v) AS BIGINT) AS sum_chars
FROM v, thr WHERE v.v >= thr.lo
GROUP BY 1
"""


@q("pipeline_quality_sketch_gate", _sketch_gate_oracle())
def pipeline_quality_sketch_gate(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """SKETCH-DRIVEN QUALITY GATE — the operators COMPOSING: build the
    mergeable quantile sketch over a per-document score (length here;
    any integer quality score slots in), read the corpus-wide p25 lower
    bound FROM THE SKETCH, broadcast that one-row threshold, and keep
    only documents at or above it — the "drop the bottom quartile"
    pass a data pipeline runs before training, sized so the threshold
    never requires a global sort or exact percentile over the corpus.

    Scale shape: the sketch collapses map-side to ≤ 2048 cells before
    its exchange; the quantile window runs over the SKETCH; the
    threshold joins back as a BROADCAST scalar; the gate itself is a
    map-side filter. Cost is two light passes — never an exact
    median/ntile over 100 TB. The oracle rebuilds the sketch
    cell-for-cell and applies the identical rank rule, so the
    threshold (a conservative bucket lower bound, the sketch's
    documented 2^-5 relative-error contract) and every surviving
    per-source total are hash-pinned."""
    from drill_calcite_spark.operators.qsketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("v"))
    sk = qsketch_build(docs, "v")
    thr = (qsketch_quantiles(sk, [(1, 4)])
           .select(F.col("lo").alias("thr")))
    return (docs.crossJoin(F.broadcast(thr))
            .filter(F.col("v") >= F.col("thr"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("v").cast("bigint").alias("sum_chars")))


def _keep_best_oracle() -> str:
    pairs = _minhash_oracle().strip()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT doc_i AS a, doc_j AS b FROM pairs
  UNION SELECT doc_j, doc_i FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
  FROM reach GROUP BY a
),
m AS (
  SELECT c.cluster_id, c.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY n_chars DESC, doc_id ASC) AS r
  FROM m
)
SELECT m.cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(CASE WHEN rk.r = 1 THEN rk.doc_id END) AS BIGINT)
         AS kept_doc,
       CAST(min(CASE WHEN rk.r = 1 THEN rk.n_chars END) AS BIGINT)
         AS kept_chars,
       CAST(sum(m.n_chars)
            - min(CASE WHEN rk.r = 1 THEN rk.n_chars END) AS BIGINT)
         AS dropped_chars
FROM m JOIN rk ON rk.cluster_id = m.cluster_id AND rk.doc_id = m.doc_id
GROUP BY m.cluster_id
"""


@q("dedup_keep_best", _keep_best_oracle())
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE duplicate resolution — the pipeline ACTION after
    cluster formation: within each near-duplicate cluster keep the
    BEST document (highest quality score; length here, any score slots
    in; deterministic doc_id tiebreak) and account for what gets
    dropped — `dedup_clusters`' min-id canonical is the graph
    convention, but a production pipeline keeps the best COPY, not the
    smallest id.

    Scale shape: clusters come from the LSH candidate pairs (never
    all-pairs), scores attach by one equi-join on doc_id, and the
    argmax is a window over CLUSTER-sized partitions (near-dup clusters
    are small by construction). The oracle replays pair generation, the
    recursive-CTE closure, AND the argmax — kept/dropped identity and
    byte accounting are all hash-pinned."""
    from drill_calcite_spark.operators.graph import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir)
    comp = connected_components(pairs, src="doc_i", dst="doc_j")
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))
    m = (comp.select(F.col("node").alias("doc_id"),
                     F.col("component").alias("cluster_id"))
         .join(docs, "doc_id"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    rk = m.withColumn("r", F.row_number().over(w))
    return (rk.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"),
                 F.min(F.when(F.col("r") == 1, F.col("doc_id")))
                 .cast("bigint").alias("kept_doc"),
                 F.min(F.when(F.col("r") == 1, F.col("n_chars")))
                 .cast("bigint").alias("kept_chars"),
                 (F.sum("n_chars")
                  - F.min(F.when(F.col("r") == 1, F.col("n_chars"))))
                 .cast("bigint").alias("dropped_chars")))


@q("text_boilerplate_mask", """
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), c AS (
  SELECT doc_id, source, md5(p) AS h FROM (
    SELECT doc_id, source, unnest(list_transform(
      generate_series(1, len(w) // 2),
      i -> array_to_string(w[(i-1)*2+1:(i-1)*2+2], ' '))) AS p
    FROM d) u
), freq AS (
  SELECT source, h, count(DISTINCT doc_id) AS nd
  FROM c GROUP BY 1, 2
), boiler AS (
  SELECT source AS bsource, h AS bh FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source
                              ORDER BY nd DESC, h ASC) AS rk
    FROM freq) r
  WHERE rk <= 20
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(b.bh) AS BIGINT) AS n_boiler,
       CAST(2 * (count(*) - count(b.bh)) AS BIGINT) AS clean_tokens
FROM c LEFT JOIN boiler b ON b.bsource = c.source AND b.bh = c.h
GROUP BY 1
""")
def text_boilerplate_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOILERPLATE DETECTION per source — the header/footer/template
    removal pass (CCNet/RefinedWeb strip lines shared across a site's
    pages; this corpus has no line structure, so the unit is the
    non-overlapping 2-word window): each source's TOP-20 shingles by
    document frequency (deterministic total tiebreak: DF desc, hash
    asc — a percentage threshold would be data-fragile, going vacuous
    when source sizes grow) are its template phrases, and each document
    reports how many of its windows are template and the token count
    that survives stripping.

    Scale shape: only md5 hashes cross the wire (passage-dedup
    discipline), and the top-K ranking is TWO-STAGE so no single task
    ever sorts a source's full shingle population: stage 1 ranks
    within each (source, shuffle-partition) slice and keeps 20 — exact
    because any member of a source's true top-20 is necessarily in the
    top-20 of whatever slice holds it — so stage 2's per-source window
    merges at most 20·P candidate rows instead of every distinct
    shingle of a 100 TB source. (A plain `nd >= 2` pre-filter — "top
    template shingles repeat by definition" — is NOT applied
    unconditionally: a source with fewer than 20 repeated shingles
    legitimately ranks nd=1 hashes, and the partial top-K already
    bounds the sort without that data-dependence.) The K·|sources|
    boilerplate set joins back broadcast-small. The oracle replays
    windows, hashes, frequencies, and the ranked cut, pinning every
    per-document count."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    w = F.col("w")
    wins = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1),
                       F.call_function("div", F.size(w), F.lit(2))),
            lambda i: F.concat_ws(" ", F.slice(w, (i - 1) * 2 + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    c = (docs.select("doc_id", "source", tokens(F.col("text")).alias("w"))
         .select("doc_id", "source", F.explode(wins).alias("p"))
         .select("doc_id", "source", F.md5(F.col("p")).alias("h")))
    freq = c.groupBy("source", "h").agg(
        F.countDistinct("doc_id").alias("nd"))
    # Two-stage bounded top-20 (operators/topk.py, factored out r12 and
    # property-fuzzed over adversarial tie corpora): stage 1 ranks per
    # (source, shuffle-partition) slice, stage 2 merges ≤ 20·P
    # candidates — no task ever sorts a source's full shingle
    # population. (nd desc, h asc) is a TOTAL order (h is the groupBy
    # key, hence unique per source), which the exactness argument
    # requires.
    boiler = (bounded_group_topk(
        freq, ["source"], [F.col("nd").desc(), F.col("h").asc()], 20)
        .select(F.col("source").alias("bsource"),
                F.col("h").alias("bh")))
    # No forced broadcast (r12): the set is ≤ 20 rows per source but
    # |sources| is data-dependent — AQE's size check broadcasts it at
    # any realistic source count (plan test executes and pins the
    # final adaptive plan) and degrades to a shuffled join instead of
    # OOMing on a pathological source explosion.
    joined = c.join(boiler,
                    (F.col("bsource") == F.col("source"))
                    & (F.col("bh") == F.col("h")), "left")
    return (joined.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_windows"),
                 F.count("bh").cast("bigint").alias("n_boiler"),
                 (2 * (F.count(F.lit(1)) - F.count("bh")))
                 .cast("bigint").alias("clean_tokens")))


def _edit_verify_oracle() -> str:
    from drill_calcite_spark.operators.dedup import (
        MINHASH_P, minhash_coeffs)

    rpb = NUM_HASHES // BANDS
    mins = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(NUM_HASHES))
    )
    bands = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, "
        "md5(concat_ws('|', {sig})) AS sig FROM mh".format(
            b=b, sig=", ".join(f"h{b * rpb + r}" for r in range(rpb))
        )
        for b in range(BANDS)
    )
    return f"""
WITH toks AS ({_SQL_TOKS}),
sh AS ({_SQL_SH}),
ex AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(ts)), 1, 15))::BIGINT % {MINHASH_P} AS h
  FROM sh
),
mh AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT doc_i, doc_j,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
       CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
         AS max_len
FROM cand
JOIN documents da ON da.doc_id = cand.doc_i
JOIN documents db ON db.doc_id = cand.doc_j
WHERE 10 * levenshtein(da.text, db.text)
      <= 3 * greatest(length(da.text), length(db.text))
"""


@q("dedup_edit_verify", _edit_verify_oracle())
def dedup_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE verification of LSH candidate pairs (r11) — the
    second standard verifier a production near-dup pipeline runs after
    MinHash banding (set-Jaccard catches reorderings; edit distance
    catches small in-place edits that shuffle few shingles): candidate
    pairs from the SAME MinHash(12)→4-band pipeline as
    ``dedup_minhash_lsh``, kept when the Levenshtein distance is ≤ 30%
    of the longer text (exact integer band: 10·lev ≤ 3·maxlen — no
    float ratio). Both engines compute byte-identical distances (the
    corpus is ASCII; Spark's levenshtein is per-character, DuckDB's
    per-byte — equal on ASCII, documented contract).

    Scale shape: the O(L²)-per-pair DP cost is paid ONLY on LSH
    candidates (banding bounds the self-join fan-out; never all-pairs);
    the texts attach by two doc-keyed joins of the candidate list back
    to the corpus — at 100 TB cap the verified length (substr) or
    switch to a banded Myers bit-parallel kernel; the JVM built-in here
    keeps the whole op codegen'd (no Python)."""
    from drill_calcite_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures)

    sh = _shingled(spark, sf_dir)
    sigs = minhash_signatures(sh, "doc_id", "sh", NUM_HASHES)
    cands = lsh_candidate_pairs(sigs, "doc_id", NUM_HASHES, BANDS)
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    di = docs.select(F.col("doc_id").alias("doc_i"),
                     F.col("text").alias("__ti"))
    dj = docs.select(F.col("doc_id").alias("doc_j"),
                     F.col("text").alias("__tj"))
    lev = F.levenshtein(F.col("__ti"), F.col("__tj"))
    ml = F.greatest(F.length("__ti"), F.length("__tj")).cast("bigint")
    return (cands.join(di, "doc_i").join(dj, "doc_j")
            .withColumn("edit_dist", lev.cast("bigint"))
            .withColumn("max_len", ml)
            .filter(10 * F.col("edit_dist") <= 3 * F.col("max_len"))
            .select("doc_i", "doc_j", "edit_dist", "max_len"))


def _qsketch_grouped_oracle() -> str:
    from drill_calcite_spark.operators.qsketch import (
        sql_qsketch_bucket_double_signed)

    return f"""
WITH v AS (
  SELECT event_type, CAST(value - 50.0 AS DOUBLE) AS v FROM events
),
s AS (
  SELECT event_type, {sql_qsketch_bucket_double_signed('v')} AS bucket_lo,
         CAST(count(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1, 2
),
c AS (
  SELECT event_type, bucket_lo,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket_lo) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM s
),
q(q_pct, num, den) AS (VALUES (25, 1, 4), (50, 1, 2), (99, 99, 100))
SELECT event_type,
       CAST(q_pct AS BIGINT)          AS q_pct,
       CAST(num AS BIGINT)            AS q_num,
       CAST(den AS BIGINT)            AS q_den,
       CAST(min(bucket_lo) AS DOUBLE) AS lo,
       CAST(max(n) AS BIGINT)         AS n
FROM c, q
WHERE cum >= (num * n + den - 1) // den
GROUP BY event_type, q_pct, num, den
"""


@q("sketch_qsketch_grouped", _qsketch_grouped_oracle())
def sketch_qsketch_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP quantile sketches (r11) — the per-tenant / per-source /
    per-metric telemetry pattern: one signed DOUBLE sketch per event
    type in ONE aggregation (operators/qsketch.py
    qsketch_build_grouped), quantiles extracted by the SAME exact
    integer rank rule with every window PARTITIONED BY the group key —
    each partition is one group's ≤ capped-cell sketch, so the quantile
    stage is group-count-parallel and size-independent of the corpus.
    Completes the sketch family: global (r9) → signed (r10) → double
    (r11) → grouped (r11). Every reported cell is bit-exact vs the
    DuckDB replay (the double bucketing is exact IEEE mantissa-prefix
    arithmetic; see sketch_qsketch_double)."""
    from drill_calcite_spark.operators.qsketch import (
        qsketch_build_grouped, qsketch_quantiles_grouped)

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value") - F.lit(50.0)).cast("double").alias("v"))
    sk = qsketch_build_grouped(ev, ["event_type"], "v",
                               signed=True, double=True)
    return qsketch_quantiles_grouped(
        sk, ["event_type"], [(1, 4), (1, 2), (99, 100)],
        lo_type="double")


def _source_gate_oracle() -> str:
    from drill_calcite_spark.operators.qsketch import sql_qsketch_bucket

    return f"""
WITH v AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents
),
s AS (
  SELECT source, {sql_qsketch_bucket('v')} AS bucket_lo,
         CAST(count(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1, 2
),
c AS (
  SELECT source, bucket_lo,
         sum(cnt) OVER (PARTITION BY source ORDER BY bucket_lo) AS cum,
         sum(cnt) OVER (PARTITION BY source) AS n
  FROM s
),
thr AS (
  SELECT source, min(bucket_lo) AS lo FROM c
  WHERE cum >= (1 * n + 4 - 1) // 4
  GROUP BY source
)
SELECT v.source,
       CAST(thr.lo AS BIGINT)       AS thr,
       CAST(count(*) AS BIGINT)     AS n_kept,
       CAST(sum(v.v) AS BIGINT)     AS sum_chars
FROM v JOIN thr ON thr.source = v.source
WHERE v.v >= thr.lo
GROUP BY v.source, thr.lo
"""


@q("pipeline_source_quality_gate", _source_gate_oracle())
def pipeline_source_quality_gate(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """PER-SOURCE quality gate (r11) — the stratified variant of
    ``pipeline_quality_sketch_gate``: real pipelines gate each source
    against ITS OWN score distribution (a corpus-wide threshold would
    gut a low-scoring-but-wanted source and pass everything from a
    high-scoring one). One GROUPED sketch per source
    (qsketch_build_grouped — single aggregation, per-group capped
    cells), per-source p25 lower bounds extracted by the group-
    partitioned rank rule, thresholds joined back as a |sources|-row
    BROADCAST, gate as a map-side filter. The oracle rebuilds every
    per-source sketch cell-for-cell; thresholds and surviving totals
    are hash-pinned. Scale: never an exact per-group percentile or a
    data-sized window — the only corpus-sized operations are the
    sketch build's map-side collapse and the final filtered
    aggregation."""
    from drill_calcite_spark.operators.qsketch import (
        qsketch_build_grouped, qsketch_quantiles_grouped)

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("v"))
    sk = qsketch_build_grouped(docs, ["source"], "v")
    thr = (qsketch_quantiles_grouped(sk, ["source"], [(1, 4)])
           .select(F.col("source").alias("t_source"),
                   F.col("lo").alias("thr")))
    # No forced broadcast (r12 audit): the threshold table is one row
    # per source, but |sources| is data-dependent — AQE's size check
    # broadcasts it at any realistic source count and degrades to a
    # shuffled join instead of OOMing on a pathological one.
    return (docs.join(thr,
                      F.col("t_source") == F.col("source"))
            .filter(F.col("v") >= F.col("thr"))
            .groupBy("source", "thr")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"),
                 F.sum("v").cast("bigint").alias("sum_chars")))


def _hll_grouped_oracle() -> str:
    from drill_calcite_spark.operators.sketch import HLL_NUMERATOR

    return f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           AS hv
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT event_type, hv % 64 AS bucket,
         CASE WHEN hv // 64 = 0 THEN 55
              ELSE 55 - length(bin(hv // 64)) END AS rank
  FROM h
),
regs AS (SELECT event_type, bucket, max(rank) AS m
         FROM r GROUP BY 1, 2),
summ AS (
  SELECT event_type,
         CAST(64 AS INT) AS n_buckets,
         CAST(count(*) AS INT) AS nonzero_regs,
         CAST(sum(CAST(1 AS BIGINT) << (55 - m))
              + (64 - count(*)) * (CAST(1 AS BIGINT) << 55) AS BIGINT)
           AS harmonic_sum_scaled
  FROM regs GROUP BY 1
),
tr AS (SELECT event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS true_n
       FROM events GROUP BY 1)
SELECT summ.event_type, n_buckets, nonzero_regs, harmonic_sum_scaled,
       {HLL_NUMERATOR!r} / CAST(harmonic_sum_scaled AS DOUBLE)
         AS est_raw,
       true_n
FROM summ JOIN tr ON tr.event_type = summ.event_type
"""


@q("sketch_hll_grouped", _hll_grouped_oracle())
def sketch_hll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP HLL distinct sketches (r11) — distinct users per event
    type from one m=64 register table per group built in a SINGLE
    aggregation (operators/sketch.py hll_registers_grouped), the HLL
    twin of the grouped quantile sketch: the per-tenant distinct-count
    telemetry pattern, with the exact dyadic harmonic sum keeping
    est_raw bit-reproducible in DuckDB per group (the sketch STATE is
    the contract — Spark's own approx_count_distinct is HLL++ with
    opaque internals). True per-group distinct counts ride alongside to
    grade the estimates. Scale shape: ONE capped-keyspace aggregation
    (≤ 64 cells per group, map-side collapse); the summary groups over
    register rows, never the data."""
    from drill_calcite_spark.operators.sketch import (
        hll_registers_grouped, hll_summary_grouped)

    ev = t(spark, sf_dir, "events")
    summ = hll_summary_grouped(
        hll_registers_grouped(ev, ["event_type"], "user_id"),
        ["event_type"])
    true_n = ev.groupBy(F.col("event_type").alias("t_et")).agg(
        F.countDistinct("user_id").cast("bigint").alias("true_n"))
    return (summ.join(F.broadcast(true_n),
                      F.col("t_et") == F.col("event_type"))
            .drop("t_et"))


@q("sketch_qsketch_grouped_merge", _qsketch_grouped_oracle())
def sketch_qsketch_grouped_merge(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """GROUPED-SKETCH MERGE battery (r12) — the mergeability claim
    exercised END TO END with an oracle row, not just a property test:
    the events corpus is split into two disjoint epochs (even/odd
    event_id — the daily-build pattern), a per-event-type signed
    DOUBLE sketch is built over EACH epoch separately
    (qsketch_build_grouped twice), the two grouped sketches merge
    cellwise (qsketch_merge_grouped), and quantiles are extracted from
    the MERGED sketch. The oracle is the single-build replay over the
    full corpus — the same SQL that backs sketch_qsketch_grouped — so
    the driver hash proves ``merge(build(A), build(B)) ≡ build(A∪B)``
    per group, bit for bit through the double mantissa-prefix
    bucketing. Non-vacuousness (both epochs non-empty, sketches
    actually differ) is pinned in tests/test_llm.py. Scale: this IS
    the incremental telemetry path — each epoch's build collapses
    map-side to ≤ capped cells per group, the merge aggregates
    sketch-sized inputs, and history is never re-read."""
    from drill_calcite_spark.operators.qsketch import (
        qsketch_build_grouped, qsketch_merge_grouped,
        qsketch_quantiles_grouped)

    ev = t(spark, sf_dir, "events").select(
        "event_id", "event_type",
        (F.col("value") - F.lit(50.0)).cast("double").alias("v"))
    epoch_a = ev.filter(F.col("event_id") % 2 == 0)
    epoch_b = ev.filter(F.col("event_id") % 2 == 1)
    sk_a = qsketch_build_grouped(epoch_a, ["event_type"], "v",
                                 signed=True, double=True)
    sk_b = qsketch_build_grouped(epoch_b, ["event_type"], "v",
                                 signed=True, double=True)
    merged = qsketch_merge_grouped(["event_type"], sk_a, sk_b)
    return qsketch_quantiles_grouped(
        merged, ["event_type"], [(1, 4), (1, 2), (99, 100)],
        lo_type="double")


@q("sketch_hll_grouped_merge", _hll_grouped_oracle())
def sketch_hll_grouped_merge(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """GROUPED-HLL MERGE battery (r12) — the register-max mergeability
    claim exercised end to end, the HLL twin of
    sketch_qsketch_grouped_merge: per-event-type register tables are
    built over two disjoint epochs (even/odd event_id) SEPARATELY
    (hll_registers_grouped twice), merged by per-(group, bucket) MAX
    (hll_merge_grouped), and summarized. The oracle is the single-build
    replay over the full corpus (the same SQL backing
    sketch_hll_grouped), so the driver hash proves
    ``merge(build(A), build(B)) ≡ build(A∪B)`` register for register —
    including est_raw bit-for-bit through the exact dyadic harmonic
    sum. True per-group distinct counts ride alongside. Scale: the
    incremental distinct-count path — each epoch ships ≤ 64 rows per
    group; the merge and summary aggregate sketch-sized inputs only."""
    from drill_calcite_spark.operators.sketch import (
        hll_merge_grouped, hll_registers_grouped, hll_summary_grouped)

    ev = t(spark, sf_dir, "events")
    regs_a = hll_registers_grouped(
        ev.filter(F.col("event_id") % 2 == 0), ["event_type"],
        "user_id")
    regs_b = hll_registers_grouped(
        ev.filter(F.col("event_id") % 2 == 1), ["event_type"],
        "user_id")
    summ = hll_summary_grouped(
        hll_merge_grouped(["event_type"], regs_a, regs_b),
        ["event_type"])
    true_n = ev.groupBy(F.col("event_type").alias("t_et")).agg(
        F.countDistinct("user_id").cast("bigint").alias("true_n"))
    return (summ.join(F.broadcast(true_n),
                      F.col("t_et") == F.col("event_type"))
            .drop("t_et"))


_CMS_GROUPED_ORACLE = f"""
WITH wf AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT source,
           unnest(list_filter(string_split(text, ' '), x -> x <> ''))
             AS w
    FROM documents) t
  GROUP BY source, w
),
cells AS (
  SELECT source, j, {_CMS_HASH} AS bucket, freq
  FROM wf, range(1, 4) t(j)
),
sk AS (
  SELECT source, j, bucket, CAST(sum(freq) AS BIGINT) AS cnt
  FROM cells GROUP BY 1, 2, 3
),
top AS (
  SELECT source, w, freq FROM (
    SELECT source, w, freq,
           row_number() OVER (PARTITION BY source
                              ORDER BY freq DESC, w ASC) AS rk
    FROM wf) ranked WHERE rk <= 5
),
probes AS (
  SELECT source, w, freq, j, {_CMS_HASH} AS bucket
  FROM top, range(1, 4) t(j)
)
SELECT source, w AS token, freq AS true_n,
       CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est_n
FROM probes LEFT JOIN sk USING (source, j, bucket)
GROUP BY source, w, freq
"""


@q("sketch_cms_grouped", _CMS_GROUPED_ORACLE)
def sketch_cms_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP CMS frequency sketches (r12) — completes the grouped
    sketch triad (quantile r11, HLL r11, CMS r12): one 3×64 counter
    matrix per SOURCE built in a single aggregation
    (operators/sketch.py cms_sketch_grouped), graded on each source's
    top-5 true heavy hitters with the estimates — including collision
    overestimates — hash-pinned cell for cell by the DuckDB replay.
    The candidate stage is the two-stage bounded top-K
    (operators/topk.py), so even picking the grading tokens never
    sorts a source's full vocabulary in one task. Scale shape: the
    sketch build's keyspace is ≤ 192 cells per source with map-side
    collapse; estimation explodes only 5 candidates per source; the
    probe-sketch join is per-(source, j, bucket) and NOT hint-forced —
    AQE broadcasts the cell table at any realistic source count."""
    from drill_calcite_spark.operators.sketch import (
        cms_estimate_grouped, cms_sketch_grouped)

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    # the token column is named `tok`, NOT `w` — `w` is the builder's
    # internal weight alias and the API guard rejects it (r12 review)
    wf = (docs.select("source",
                      F.explode(tokens(F.col("text"))).alias("tok"))
          .groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("bigint").alias("freq")))
    sk = cms_sketch_grouped(wf, ["source"], "tok", "freq")
    top = bounded_group_topk(
        wf, ["source"], [F.col("freq").desc(), F.col("tok").asc()], 5)
    est = cms_estimate_grouped(sk, ["source"],
                               top.select("source", "tok"), "tok")
    return (top.join(est, ["source", "tok"])
            .select("source", F.col("tok").alias("token"),
                    F.col("freq").alias("true_n"),
                    F.col("est_n").cast("bigint").alias("est_n")))


@q("sketch_cms_grouped_merge", _CMS_GROUPED_ORACLE)
def sketch_cms_grouped_merge(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """GROUPED-CMS MERGE battery (r13) — completes the grouped-merge
    triad (quantile cellwise-sum r12, HLL register-max r12, CMS
    cellwise-sum now): per-source counter matrices are built over two
    DISJOINT document epochs (even/odd doc_id — the daily-build
    pattern) SEPARATELY, merged by per-(source, j, bucket) addition
    (operators/sketch.py cms_merge_grouped — counters are linear), and
    the merged sketch is probed with the full corpus's top-5 heavy
    hitters per source. The oracle is the single-build replay over the
    whole corpus — the same SQL backing sketch_cms_grouped — so the
    driver hash proves ``merge(build(A), build(B)) ≡ build(A∪B)`` cell
    for cell, collision overestimates included. Non-vacuousness (both
    epochs non-empty, epoch sketches differ) is pinned in
    tests/test_llm.py. Scale: the incremental frequency-telemetry
    path — each epoch's build collapses map-side to ≤ d×w cells per
    source, the merge aggregates sketch-sized inputs, history is never
    re-read."""
    from drill_calcite_spark.operators.sketch import (
        cms_estimate_grouped, cms_merge_grouped, cms_sketch_grouped)

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = t(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    wf_all = (docs.select("doc_id", "source",
                          F.explode(tokens(F.col("text"))).alias("tok")))

    def epoch_sketch(parity: int) -> DataFrame:
        wf = (wf_all.filter(F.col("doc_id") % 2 == parity)
              .groupBy("source", "tok")
              .agg(F.count(F.lit(1)).cast("bigint").alias("freq")))
        return cms_sketch_grouped(wf, ["source"], "tok", "freq")

    merged = cms_merge_grouped(["source"], epoch_sketch(0),
                               epoch_sketch(1))
    full = (wf_all.groupBy("source", "tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("freq")))
    top = bounded_group_topk(
        full, ["source"], [F.col("freq").desc(), F.col("tok").asc()], 5)
    est = cms_estimate_grouped(merged, ["source"],
                               top.select("source", "tok"), "tok")
    return (top.join(est, ["source", "tok"])
            .select("source", F.col("tok").alias("token"),
                    F.col("freq").alias("true_n"),
                    F.col("est_n").cast("bigint").alias("est_n")))
