"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and inverted-index n-gram Jaccard.

No reference counterpart (the reference is a SQL planner, SURVEY.md §0);
these are the SURVEY.md §7 phase-6 extensions. Design target is a 100 TB
corpus on a 1000-executor cluster:

- every stage is a hash-shuffle on a key with bounded fan-in (token/shingle,
  band signature) — no cross join ever materializes;
- candidate generation (LSH banding / inverted index) is linear in corpus
  size; only candidate pairs pay the verification join;
- hashing is md5-hex with lexicographic string minima, so the whole pipeline
  is deterministic and engine-portable (the DuckDB oracles in
  queries/llm.py replicate it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash: one representative (min id) per distinct
    text, with the duplicate count. Grouping by md5(text) rather than the
    text itself keeps shuffle rows small at 100 TB (hash+id, not the
    document body)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("__h"))
        .groupBy("__h")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


MINHASH_P = 2_147_483_647  # 2^31-1; keeps a*h+b inside int64


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed affine coefficients (a_i odd, b_i spread) for the universal
    hash family h_i(x) = (a_i*x + b_i) mod p."""
    return [(2 * i + 1, (7919 * (i + 1)) % MINHASH_P) for i in range(num_hashes)]


def minhash_signatures(
    shingled: DataFrame, id_col: str, shingle_col: str, num_hashes: int
) -> DataFrame:
    """MinHash signature per document: ONE md5 per shingle reduced to an
    int64, then ``num_hashes`` affine permutations h_i = (a_i*h + b_i) mod
    2^31-1, min per doc. (One md5 + k integer ops per row beats k md5 calls
    ~10×; both steps are integer-exact, so the DuckDB oracle replays them.)
    One explode + one groupBy → a single shuffle keyed by doc id.

    ``shingled`` must have (id_col, shingle_col: array<string>).
    """
    base = (
        F.conv(F.substring(F.md5(F.col("__s")), 1, 15), 16, 10)
        .cast("bigint") % MINHASH_P
    )
    exploded = shingled.select(
        id_col, F.explode(F.array_distinct(shingle_col)).alias("__s")
    ).withColumn("__h", base)
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """Band the signature (bands × rows_per_band) and emit candidate pairs
    that collide in ≥1 band. The band join is the LSH scale path: each
    bucket holds only near-identical docs, so the self-join fan-out stays
    tiny even at 10^10 documents.

    Returns (doc_i, doc_j) with doc_i < doc_j, distinct.
    """
    rows_per_band = num_hashes // bands
    assert bands * rows_per_band == num_hashes
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[
                F.col(f"h{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ])).alias("sig"),
        )
        for b in range(bands)
    ])
    banded = signatures.select(
        F.col(id_col), F.explode(band_structs).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_i"),
            F.col(f"b.{id_col}").alias("doc_j"),
        )
        .distinct()
    )


def verify_jaccard(
    pairs: DataFrame, shingled: DataFrame, id_col: str, shingle_col: str,
    threshold: float,
) -> DataFrame:
    """Exact set-Jaccard verification of candidate pairs: join the (small)
    pair list back to the distinct-shingle sets and keep pairs ≥ threshold.
    Returns (doc_i, doc_j, jaccard) with jaccard rounded to 6 dp."""
    sets_i = shingled.select(
        F.col(id_col).alias("doc_i"),
        F.array_distinct(shingle_col).alias("__si"),
    )
    sets_j = shingled.select(
        F.col(id_col).alias("doc_j"),
        F.array_distinct(shingle_col).alias("__sj"),
    )
    jac = (
        F.size(F.array_intersect(F.col("__si"), F.col("__sj"))).cast("double")
        / F.size(F.array_union(F.col("__si"), F.col("__sj")))
    )
    return (
        pairs.join(sets_i, "doc_i").join(sets_j, "doc_j")
        .select("doc_i", "doc_j", jac.alias("__jac"))
        .filter(F.col("__jac") >= threshold)
        .select("doc_i", "doc_j", F.round("__jac", 6).alias("jaccard"))
    )


def minhash_lsh_dedup(
    shingled: DataFrame, id_col: str, shingle_col: str, *,
    num_hashes: int = 12, bands: int = 4, threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash → band → bucket-join → verify pipeline. Output:
    (doc_i, doc_j, jaccard) for LSH-caught pairs with exact Jaccard ≥
    threshold. With 12 hashes in 4 bands of 3, P(catch) ≈ 1-(1-j³)⁴ —
    ≈0.999 at j=0.9; raise num_hashes/bands for lower thresholds."""
    sigs = minhash_signatures(shingled, id_col, shingle_col, num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    return verify_jaccard(cands, shingled, id_col, shingle_col, threshold)


def ngram_jaccard_pairs(
    shingled: DataFrame, id_col: str, shingle_col: str, threshold: float,
    *, df_max: int | None = None,
) -> DataFrame:
    """Near-dup pairs via inverted index: pairs sharing ≥1 shingle are
    the only ones with Jaccard > 0, so shingle-join + verify is exact for
    any threshold > 0 when ``df_max`` is None.

    ``df_max`` is the 100 TB scale knob: shingles appearing in more than
    ``df_max`` documents ("stop-shingles") are dropped from the inverted
    index BEFORE the self-join, bounding every join key's fan-out at
    df_max² candidate pairs. One ubiquitous shingle otherwise makes the
    join quadratic in its document frequency. The hot-shingle set is tiny
    by definition, so it broadcasts and the cap is a map-side anti-join —
    no extra shuffle of the index. Trade-off (documented contract): a pair
    whose ONLY shared shingles are hot is missed; such pairs are dominated
    by stop-shingles and near-never exceed a meaningful threshold.
    """
    inv = shingled.select(
        F.col(id_col), F.explode(F.array_distinct(shingle_col)).alias("__s")
    )
    if df_max is not None:
        hot = (
            inv.groupBy("__s")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > df_max)
            .select("__s")
        )
        inv = inv.join(F.broadcast(hot), "__s", "left_anti")
    a = inv.alias("a")
    b = inv.alias("b")
    cands = (
        a.join(b, "__s")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_i"),
            F.col(f"b.{id_col}").alias("doc_j"),
        )
        .distinct()
    )
    return verify_jaccard(cands, shingled, id_col, shingle_col, threshold)


def simhash_signature(
    shingled: DataFrame, id_col: str, shingle_col: str, bits: int = 16
) -> DataFrame:
    """SimHash over shingle sets: bit i of the signature is the sign of
    Σ±1 across shingles, where the ±1 is hex digit i of md5(shingle) ≥ '8'.
    Near-identical shingle sets produce identical (or Hamming-close)
    signatures. Output: (id_col, simhash: string of 0/1).

    One explode + groupBy (single shuffle); at scale, bucket by the full
    signature, then probe Hamming-1 neighborhoods by re-keying on signature
    with each bit flipped.
    """
    assert bits <= 32  # md5 hex has 32 digits
    exploded = shingled.select(
        F.col(id_col), F.explode(F.array_distinct(shingle_col)).alias("__s")
    ).withColumn("__h", F.md5(F.col("__s")))
    aggs = [
        F.sum(
            F.when(F.substring(F.col("__h"), i + 1, 1) >= F.lit("8"), 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    summed = exploded.groupBy(id_col).agg(*aggs)
    sig = F.concat(*[
        F.when(F.col(f"b{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ])
    return summed.select(F.col(id_col), sig.alias("simhash"))
