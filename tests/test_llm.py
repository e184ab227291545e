"""Unit tests for the training-data-pipeline operators (dedup, similarity,
multimodal) — hand-computed goldens plus an LSH-recall property check."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

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
from drill_calcite_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_blocked,
    hyperplanes,
    lsh_ann_topk,
)


# ------------------------------------------------------------------- dedup
def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y")], "doc_id long, text string"
    )
    out = {r.keep_id: r.n_copies for r in exact_dedup(df, "text", "doc_id").collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_catches_identical_and_skips_disjoint(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "zebra yak xylophone walrus vulture tiger snake rabbit quail pig"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], "doc_id long, text string"
    ).select("doc_id", shingles(tokens(F.col("text"))).alias("sh"))
    out = minhash_lsh_dedup(df, "doc_id", "sh", threshold=0.5).collect()
    assert [(r.doc_i, r.doc_j, r.jaccard) for r in out] == [(1, 2, 1.0)]


def test_ngram_jaccard_exact_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "p q r s")],
        "doc_id long, text string",
    ).select("doc_id", shingles(tokens(F.col("text"))).alias("sh"))
    out = ngram_jaccard_pairs(df, "doc_id", "sh", 0.3).collect()
    # docs 1,2 share shingles {a b, b c}; union = {a b, b c, c d, c e} → 0.5
    assert [(r.doc_i, r.doc_j, r.jaccard) for r in out] == [(1, 2, 0.5)]


def test_frame_sample_and_resize_deterministic(spark):
    import hashlib

    text = "x" * 200  # 200 bytes → frames 0..3 (64,64,64,8); stride 3 → 0, 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    frames = frame_sample(attach_binary_payload(df), stride=3).collect()
    got = sorted((r.frame_idx, r.frame_len, r.frame_md5) for r in frames)
    exp = [
        (0, 64, hashlib.md5(b"x" * 64).hexdigest()),
        (3, 8, hashlib.md5(b"x" * 8).hexdigest()),
    ]
    assert got == exp
    r1 = resize_stub(attach_binary_payload(df)).collect()[0]
    r2 = resize_stub(attach_binary_payload(df)).collect()[0]
    assert (r1.out_w, r1.out_h) == (8, 8) and r1.resized_md5 == r2.resized_md5
    # uniform bytes → grid is 64 x's
    assert r1.resized_md5 == hashlib.md5(b"x" * 64).hexdigest()


def test_ngram_df_cap_bounds_hot_shingle_fanout(spark):
    # Planted skew: shingle "hot hot" appears in ALL 12 docs; each doc pair
    # additionally shares nothing else except (1,2) which are near-identical.
    # Uncapped: the hot shingle alone generates C(12,2)=66 candidate pairs.
    # With df_max=3 the hot shingle is anti-joined out, so candidates come
    # only from rare shingles — the (1,2) near-dup pair must still survive
    # on its own rare shingles.
    rows = [(1, "hot hot a b c d"), (2, "hot hot a b c e")]
    rows += [(i, f"hot hot u{i} v{i} w{i} x{i}") for i in range(3, 13)]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", shingles(tokens(F.col("text"))).alias("sh")
    )
    capped = ngram_jaccard_pairs(df, "doc_id", "sh", 0.3, df_max=3).collect()
    assert [(r.doc_i, r.doc_j) for r in capped] == [(1, 2)]
    # and the candidate set itself is bounded: rerun at threshold 0 to see
    # every surviving candidate pair — the 66 hot-only pairs must be gone
    cands = ngram_jaccard_pairs(df, "doc_id", "sh", 1e-9, df_max=3).collect()
    assert {(r.doc_i, r.doc_j) for r in cands} == {(1, 2)}
    # uncapped control: the hot shingle makes every pair a candidate
    uncapped = ngram_jaccard_pairs(df, "doc_id", "sh", 1e-9).collect()
    assert len(uncapped) == 66


def test_shingles_empty_and_single_token_docs(spark):
    # empty / whitespace-only / 1-token docs must yield [] (slice length is
    # clamped at 0 — previously slice(…, -1) threw at runtime)
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "solo"), (4, "a b")],
        "doc_id long, text string",
    ).select("doc_id", shingles(tokens(F.col("text"))).alias("sh"))
    got = {r.doc_id: r.sh for r in df.collect()}
    assert got == {1: [], 2: [], 3: [], 4: ["a b"]}


def test_shingles_general_n(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "")], "doc_id long, text string"
    ).select("doc_id", shingles(tokens(F.col("text")), n=3).alias("g3"))
    got = {r.doc_id: r.g3 for r in df.collect()}
    assert got == {1: ["a b c", "b c d"], 2: [], 3: []}


def test_simhash_identical_docs_same_signature(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "u v w x y z")],
        "doc_id long, text string",
    ).select("doc_id", shingles(tokens(F.col("text"))).alias("sh"))
    sigs = {r.doc_id: r.simhash for r in
            simhash_signature(df, "doc_id", "sh").collect()}
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == 16 and set(sigs[1]) <= {"0", "1"}
    assert sigs[1] != sigs[3]


# -------------------------------------------------------------- similarity
def _random_vectors(n, dim, seed=7):
    rng = np.random.default_rng(seed)
    return [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)]


def test_cosine_topk_golden(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = cosine_topk(df, df, "vec_id", "embedding", k=1).collect()
    best = {r.query_id: r.neighbor_id for r in out}
    assert best[0] == 1 and best[1] == 0 and best[2] == 1


def test_blocked_matmul_topk_equals_fold_path(spark):
    df = spark.createDataFrame(
        _random_vectors(80, 16), "vec_id long, embedding array<double>"
    )
    fold = {(r.query_id, r.rank): r.neighbor_id
            for r in cosine_topk(df, df, "vec_id", "embedding", k=3).collect()}
    blocked = {(r.query_id, r.rank): r.neighbor_id
               for r in cosine_topk_blocked(df, df, "vec_id", "embedding", k=3).collect()}
    assert fold == blocked


def test_lsh_ann_recall_vs_bruteforce(spark):
    df = spark.createDataFrame(
        _random_vectors(120, 16), "vec_id long, embedding array<double>"
    )
    exact = cosine_topk(df, df, "vec_id", "embedding", k=3)
    top1 = {r.query_id: r.neighbor_id for r in exact.collect() if r.rank == 1}
    approx = lsh_ann_topk(df, "vec_id", "embedding", k=3,
                          num_planes=4, dim=16, num_tables=8)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    hits = sum((q, n) in got for q, n in top1.items())
    # 8 tables × 4 planes: P(top-1 neighbor collides somewhere) ≈
    # 1-(1-(1-θ/π)^4)^8 ≳ 0.8 for the cosines random data produces
    assert hits / len(top1) >= 0.6, f"LSH recall {hits}/{len(top1)}"


def test_ivf_ann_recall_vs_bruteforce(spark):
    from drill_calcite_spark.operators.similarity import ivf_ann_topk

    df = spark.createDataFrame(
        _random_vectors(120, 16), "vec_id long, embedding array<double>"
    )
    exact = cosine_topk(df, df, "vec_id", "embedding", k=3)
    top1 = {r.query_id: r.neighbor_id for r in exact.collect() if r.rank == 1}
    approx = ivf_ann_topk(df, "vec_id", "embedding", k=3, nlist=8, nprobe=4)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    hits = sum((q, n) in got for q, n in top1.items())
    # probing half the cells (nprobe=4 of nlist=8) must catch most
    # true top-1 neighbors — kmeans cells respect cosine locality
    assert hits / len(top1) >= 0.6, f"IVF recall {hits}/{len(top1)}"


def test_hyperplanes_deterministic():
    a = hyperplanes(3, 8)
    b = hyperplanes(3, 8)
    assert a == b
    assert len(a) == 3 and all(len(w) == 8 for w in a)
    first = hashlib.md5(b"0:0|0").digest()[0] - 127.5
    assert a[0][0] == first
    assert hyperplanes(3, 8, table=1) != a


# ------------------------------------------------------------- fingerprint
def test_rolling_fingerprint_golden(spark):
    df = spark.createDataFrame([("ab c",)], "text string")
    out = df.select(
        rolling_fingerprint(tokens(F.col("text"))).alias("fp")
    ).collect()[0].fp
    # ((7*131 + (2*31+97))*131 + (1*31+99)) % (2^31-1)
    expect = ((7 * 131 + (2 * 31 + ord("a"))) * 131 + (1 * 31 + ord("c"))) % (
        2**31 - 1
    )
    assert out == expect


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b a")], "i long, text string")
    fps = [r.fp for r in df.select(
        rolling_fingerprint(tokens(F.col("text"))).alias("fp")).collect()]
    assert fps[0] != fps[1]


# -------------------------------------------------------------- multimodal
def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "xyz")], "doc_id long, text string"
    )
    feats = extract_features(attach_binary_payload(df)).collect()
    by_id = {r.doc_id: r for r in feats}
    assert by_id[1].n_bytes == len(b"hello world")
    assert len(by_id[1].feat) == N_FEATURES
    assert by_id[1].width >= 16 and by_id[1].height >= 16
    assert abs(sum(by_id[1].feat) - 1.0) < 1e-9  # L1-normalized histogram
    # deterministic across runs
    again = extract_features(attach_binary_payload(df)).collect()
    assert sorted(map(str, again)) == sorted(map(str, feats))


def test_lsh_plan_size_bounded_at_high_dim(spark):
    """Advice round-5: plane weights must ride as array VALUES, not
    per-weight literal expression nodes — at dim=1024 × 16 planes × 8
    tables the old unrolled form built ~10⁵ Literal nodes. The optimized
    plan string is a proxy for expression-tree size: with value-literals
    it stays small and analysis stays fast."""
    import time

    from drill_calcite_spark.operators.similarity import lsh_bucket, _table_buckets

    dim, planes, tables = 1024, 16, 8
    df = spark.createDataFrame(
        [(1, [0.5] * dim), (2, [-0.5] * dim)], "id long, emb array<double>"
    )
    t0 = time.monotonic()
    b = lsh_bucket(df, "emb", planes, dim)
    multi = df.select("id", F.explode(
        _table_buckets("emb", planes, dim, tables)).alias("tb"))
    plan = b._jdf.queryExecution().optimizedPlan().toString()
    plan_multi = multi._jdf.queryExecution().optimizedPlan().toString()
    elapsed = time.monotonic() - t0
    # the unrolled form produced plans in the tens of MB at this shape
    assert len(plan) < 500_000, len(plan)
    assert len(plan_multi) < 2_000_000, len(plan_multi)
    # the unrolled pathology took MINUTES; 90 s keeps the guard
    # meaningful without flaking when the suite shares the box with
    # other Spark sessions (observed 31.7 s under full-core contention)
    assert elapsed < 90, elapsed
    # and it still computes: both rows bucketed, 16 sign bits
    rows = b.select("id", "__bucket").collect()
    assert all(len(r["__bucket"]) == planes for r in rows)


def test_connected_components_transitive_chain(spark):
    """Min-label propagation must close TRANSITIVE chains (diameter >
    1) — the sf0.01 LSH graph only has isolated pairs, so the property
    is pinned here: a 4-node path, a separate triangle, and an isolated
    pair, labels = min node id of each component."""
    from drill_calcite_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40),          # path: diameter 3
         (100, 200), (200, 300), (100, 300),    # triangle
         (7, 8)],                               # pair
        "src bigint, dst bigint")
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 10,
                   100: 100, 200: 100, 300: 100, 7: 7, 8: 7}


def test_connected_components_converges_early(spark):
    """A clique closes in one round; the loop's convergence check must
    stop it well before max_iterations (no wasted shuffles)."""
    import time

    from drill_calcite_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, j) for i in range(1, 5) for j in range(i + 1, 5)],
        "src bigint, dst bigint")
    t0 = time.monotonic()
    rows = connected_components(edges, max_iterations=25).collect()
    assert {r["component"] for r in rows} == {1}
    # 25 un-converged rounds of shuffles would take far longer
    assert time.monotonic() - t0 < 60


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iterations with labels still moving must raise —
    silently returning partially-propagated (wrong) component ids was
    the r7 ADVICE finding. A 6-node path has diameter 5, so 2 rounds
    cannot finish min-label propagation."""
    import pytest as _pytest

    from drill_calcite_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src bigint, dst bigint")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2).collect()


def test_dedup_clusters_canonical_per_cluster(spark):
    """Every cluster has exactly ONE canonical row (the min doc_id) and
    cluster_size matches the member count."""
    from drill_calcite_spark.queries.llm import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    assert rows, "degenerate: no duplicate clusters at this SF"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert sum(m["is_canonical"] for m in members) == 1
        assert all(m["cluster_size"] == len(members) for m in members)
        assert min(m["doc_id"] for m in members) == cid


def test_bpe_merge_replace_semantics(spark):
    """The padded double-space literal replace reproduces BPE's
    left-to-right non-overlapping pair fusion — including the
    "a a a a" tiling (both disjoint pairs merge), the "a a a" odd tail
    (third symbol survives), and interior merges keeping their
    neighbors' delimiters."""
    rows = spark.sql("""
        SELECT trim(replace(replace(' ' || replace(seq, ' ', '  ') || ' ',
                    ' ' || replace(p, ' ', '  ') || ' ',
                    ' ' || replace(p, ' ', '') || ' '), '  ', ' ')) AS m
        FROM VALUES ('a a a a', 'a a'), ('a a a', 'a a'),
                    ('h e l l o', 'l l'), ('x y', 'a b'),
                    ('b a a', 'a a'), ('a', 'a a') AS t(seq, p)
    """).collect()
    assert [r.m for r in rows] == [
        "aa aa", "aa a", "h e ll o", "x y", "b aa", "a"]


def test_bpe_merges_match_reference_trainer(spark):
    """Drive the operator's full loop on a tiny in-memory corpus and
    compare against a straightforward single-machine BPE trainer."""
    import collections

    def reference_bpe(word_freq, rounds):
        seqs = {w: list(w) for w in word_freq}
        out = []
        for r in range(rounds):
            cnt = collections.Counter()
            for w, f in word_freq.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    cnt[(s[i], s[i + 1])] += f
            if not cnt:
                break
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            out.append((r + 1, " ".join(best), "".join(best),
                        cnt[best]))
            for w in seqs:
                s, ns, i = seqs[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                        ns.append(s[i] + s[i + 1])
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                seqs[w] = ns
        return out

    corpus = {"lower": 9, "low": 7, "newest": 6, "widest": 3, "new": 2}
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        text = " ".join(w for w, f in corpus.items() for _ in range(f))
        spark.createDataFrame(
            [("d1", "synthetic", text)], "doc_id string, source string, text string"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        from drill_calcite_spark.queries.llm import text_bpe_merges
        got = sorted(
            (r.merge_round, r.pair, r.merged, r.cnt)
            for r in text_bpe_merges(spark, d).collect())
    assert got == reference_bpe(corpus, 5)


def test_cms_overestimates_and_merges(spark):
    """Count-min sketch invariants (operators/sketch.py): estimates
    never underestimate; an uncolliding key estimates exactly; sketches
    merge cellwise — sketch(A ∪ B) = merge(sketch(A), sketch(B)); an
    unseen key estimates only collision mass (0 when its cells are
    untouched)."""
    from drill_calcite_spark.operators.sketch import (
        CMS_DEPTH, CMS_WIDTH, cms_estimate, cms_merge, cms_sketch)

    a = spark.createDataFrame(
        [(f"k{i % 7}", 1) for i in range(70)], "k string, w long")
    b = spark.createDataFrame(
        [(f"k{i % 5}", 1) for i in range(25)], "k string, w long")
    union = a.unionByName(b)

    sk_u = cms_sketch(union, "k", "w")
    assert sk_u.count() <= CMS_DEPTH * CMS_WIDTH
    merged = cms_merge(cms_sketch(a, "k", "w"), cms_sketch(b, "k", "w"))
    assert sorted(map(tuple, sk_u.collect())) == \
        sorted(map(tuple, merged.collect()))

    keys = union.select("k").distinct()
    true = {r.k: r.n for r in
            union.groupBy("k").agg(__import__(
                "pyspark.sql.functions", fromlist=["F"]).sum("w").alias("n")
            ).collect()}
    est = {r.k: r.est_n for r in cms_estimate(sk_u, keys, "k").collect()}
    assert set(est) == set(true)
    for k, t_n in true.items():
        assert est[k] >= t_n, (k, est[k], t_n)

    unseen = spark.createDataFrame([("zzz-not-in-corpus",)], "k string")
    (zrow,) = cms_estimate(sk_u, unseen, "k").collect()
    assert zrow.est_n >= 0


def test_hll_registers_and_merge(spark):
    """HyperLogLog (operators/sketch.py): register ranks match a Python
    mirror of the 60-bit-md5 / bin-length formulation exactly; registers
    merge by per-bucket max — hll(A ∪ B) = merge(hll(A), hll(B)); the
    raw estimate lands within 4 standard errors (σ = 1.04/√64 ≈ 13%)
    of the true cardinality."""
    import hashlib

    from drill_calcite_spark.operators.sketch import (
        hll_merge, hll_registers, hll_summary)

    def mirror(keys):
        regs = {}
        for k in keys:
            hv = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
            b, p = hv % 64, hv >> 6
            rank = 55 if p == 0 else 55 - p.bit_length()
            regs[b] = max(regs.get(b, 0), rank)
        return regs

    a = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(500, 1700)], "k long")
    got = {r.bucket: r.m for r in hll_registers(a, "k").collect()}
    assert got == mirror(range(1000))

    u = a.unionByName(b)
    direct = sorted(map(tuple, hll_registers(u, "k").collect()))
    merged = sorted(map(tuple, hll_merge(
        hll_registers(a, "k"), hll_registers(b, "k")).collect()))
    assert direct == merged

    (s,) = hll_summary(hll_registers(u, "k")).collect()
    assert abs(s.est_raw - 1700) / 1700 < 4 * 1.04 / 8  # 4σ for m=64


def test_bpe_merge_replace_property():
    """Property (hypothesis, DuckDB-side — no JVM needed): for random
    symbol sequences and random pairs, the padded double-space literal
    replace equals the reference left-to-right non-overlapping merger."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.sampled_from(["a", "b", "c", "ab", "ba"])
    seqs = st.lists(sym, min_size=1, max_size=12)

    def reference_merge(s, x, y):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    con = duckdb.connect()

    @settings(max_examples=300, deadline=None)
    @given(seqs, sym, sym)
    def check(s, x, y):
        seq = " ".join(s)
        pair = f"{x} {y}"
        (got,) = con.execute(
            "SELECT trim(replace(replace(' ' || replace(?, ' ', '  ') || ' ',"
            " ' ' || replace(?, ' ', '  ') || ' ',"
            " ' ' || replace(?, ' ', '') || ' '), '  ', ' '))",
            [seq, pair, pair]).fetchone()
        assert got == " ".join(reference_merge(s, x, y)), (s, x, y, got)

    check()


def test_hll_null_keys_drop(spark):
    """NULL keys must not mint a phantom register (COUNT DISTINCT NULL
    semantics)."""
    from drill_calcite_spark.operators.sketch import hll_registers

    df = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    nn = spark.createDataFrame([(1,), (2,)], "k long")
    assert sorted(map(tuple, hll_registers(df, "k").collect())) == \
        sorted(map(tuple, hll_registers(nn, "k").collect()))

def test_int8_quantize_bounds_and_error(spark):
    from drill_calcite_spark.operators.similarity import int8_quantize

    df = spark.createDataFrame(
        _random_vectors(40, 16) + [(999, [0.0] * 16)],
        "vec_id long, embedding array<double>",
    )
    out = int8_quantize(df, "embedding").collect()
    for r in out:
        m = max(abs(x) for x in r.embedding)
        assert r["__maxabs"] == m
        assert all(-127 <= qv <= 127 for qv in r["__q8"])
        if m == 0.0:
            assert all(qv == 0 for qv in r["__q8"])
            continue
        scale = m / 127.0
        for x, qv in zip(r.embedding, r["__q8"]):
            # sign preserved (half-up rounds ±0.5-boundary toward +inf,
            # so a tiny negative can quantize to 0 — never flip sign)
            assert qv * x >= 0 or qv == 0
            # dequantization error bounded by half a quantization step
            assert abs(qv * scale - x) <= scale / 2 + 1e-12


def test_int8_ann_recall_vs_bruteforce(spark):
    from drill_calcite_spark.operators.similarity import int8_ann_topk

    df = spark.createDataFrame(
        _random_vectors(120, 16), "vec_id long, embedding array<double>"
    )
    exact = cosine_topk(df, df, "vec_id", "embedding", k=3)
    top1 = {r.query_id: r.neighbor_id for r in exact.collect() if r.rank == 1}
    approx = int8_ann_topk(df, "vec_id", "embedding", k=3,
                           num_planes=4, dim=16, num_tables=8)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    hits = sum((q, n) in got for q, n in top1.items())
    # same candidate generation as the float LSH path; int8 scoring
    # perturbs cosines by < 1/127 — top-1 ordering survives
    assert hits / len(top1) >= 0.6, f"int8 recall {hits}/{len(top1)}"


def test_qsketch_merge_and_error_bound(spark):
    """Quantile-sketch invariants (operators/qsketch.py): sketches merge
    cellwise — sketch(A ∪ B) = merge(sketch A, sketch B) exactly; every
    reported quantile bucket lo satisfies lo <= x_q < lo * (1 + 2^-B)
    against the EXACT rank-rule quantile; keyspace stays capped."""
    import math

    from drill_calcite_spark.operators.qsketch import (
        QSKETCH_SUB_BITS, qsketch_build, qsketch_merge, qsketch_quantiles,
    )

    vals_a = [(i * i * 7 + 13) % 100000 + 1 for i in range(4000)]
    vals_b = [(i * i * 11 + 5) % 250000 + 1 for i in range(3000)]
    a = spark.createDataFrame([(v,) for v in vals_a], "v long")
    b = spark.createDataFrame([(v,) for v in vals_b], "v long")
    union = a.unionByName(b)

    sk_u = qsketch_build(union, "v")
    assert sk_u.count() <= 64 * (1 << QSKETCH_SUB_BITS)
    merged = qsketch_merge(qsketch_build(a, "v"), qsketch_build(b, "v"))
    assert sorted(map(tuple, sk_u.collect())) == \
        sorted(map(tuple, merged.collect()))

    qs = [(1, 100), (1, 4), (1, 2), (3, 4), (9, 10), (99, 100)]
    got = {(r.q_num, r.q_den): r.lo
           for r in qsketch_quantiles(sk_u, qs).collect()}
    allv = sorted(vals_a + vals_b)
    n = len(allv)
    rel = 2.0 ** -QSKETCH_SUB_BITS
    for num, den in qs:
        rank = -(-num * n // den)  # ceil(q*N), the PERCENTILE_DISC rule
        x_q = allv[rank - 1]
        lo = got[(num, den)]
        assert lo <= x_q, (num, den, lo, x_q)
        assert x_q < lo * (1 + rel) + 1, (num, den, lo, x_q)

    # distinct rationals flooring to the SAME display percent keep
    # their own rows (ADVICE r9: the old percent-keyed groupBy silently
    # merged (1,3) with (33,100))
    close = qsketch_quantiles(sk_u, [(1, 3), (33, 100)]).collect()
    assert len(close) == 2
    assert {(r.q_num, r.q_den) for r in close} == {(1, 3), (33, 100)}
    assert all(r.q_pct == 33 for r in close)


def test_qsketch_signed_two_sided(spark):
    """Signed-sketch invariants (r10 — the two-sided DDSketch layout):
    cell keys sign(v)·bucket(|v|) stay monotone, so the SAME rank rule
    and cellwise merge apply; keyspace ≤ 2·64·2^B + 1; every reported
    quantile keeps the 2^-B relative-magnitude bound on BOTH tails
    (negative cells report their value-space UPPER bound); zero gets
    its own cell."""
    from drill_calcite_spark.operators.qsketch import (
        QSKETCH_SUB_BITS, qsketch_build, qsketch_merge, qsketch_quantiles,
    )

    vals_a = [((i * i * 7 + 13) % 100000) - 50000 for i in range(4000)]
    vals_b = [((i * i * 11 + 5) % 250000) - 125000 for i in range(3000)]
    vals_a[17] = 0  # pin the zero cell
    a = spark.createDataFrame([(v,) for v in vals_a], "v long")
    b = spark.createDataFrame([(v,) for v in vals_b], "v long")
    union = a.unionByName(b)

    sk_u = qsketch_build(union, "v", signed=True)
    assert sk_u.count() <= 2 * 64 * (1 << QSKETCH_SUB_BITS) + 1
    assert sk_u.filter("bucket_lo = 0").count() == 1
    assert sk_u.filter("bucket_lo < 0").count() > 0
    merged = qsketch_merge(qsketch_build(a, "v", signed=True),
                           qsketch_build(b, "v", signed=True))
    assert sorted(map(tuple, sk_u.collect())) == \
        sorted(map(tuple, merged.collect()))

    qs = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]
    got = {(r.q_num, r.q_den): r.lo
           for r in qsketch_quantiles(sk_u, qs).collect()}
    allv = sorted(vals_a + vals_b)
    n = len(allv)
    rel = 2.0 ** -QSKETCH_SUB_BITS
    for num, den in qs:
        rank = -(-num * n // den)
        x_q = allv[rank - 1]
        lo = got[(num, den)]
        if lo >= 0:
            assert lo <= x_q, (num, den, lo, x_q)
            assert x_q < lo * (1 + rel) + 1, (num, den, lo, x_q)
        else:  # negative cell: key is the value-space UPPER bound
            assert x_q <= lo, (num, den, lo, x_q)
            assert x_q > lo * (1 + rel) - 1, (num, den, lo, x_q)


def test_qsketch_double_two_sided(spark):
    """DOUBLE-sketch invariants (r11 — IEEE mantissa-prefix bucketing,
    operators/qsketch.py): the bucket lower bound is EXACT binary
    floating point (lo <= v < lo·(1+2^-B) per value, not just per
    quantile); exact powers of two — where a libm floor(log2) is most
    likely off by one — land in their own cell lower bound exactly;
    merge stays cellwise-exact; both tails keep the 2^-B
    relative-magnitude bound; zero and sub-normal-range magnitudes
    collapse into the zero cell."""
    from drill_calcite_spark.operators.qsketch import (
        QSKETCH_SUB_BITS, qsketch_bucket_double_signed, qsketch_build,
        qsketch_merge, qsketch_quantiles,
    )

    rel = 2.0 ** -QSKETCH_SUB_BITS
    # deterministic pseudo-random doubles spanning ~12 decades + edges
    vals_a = [((i * i * 7 + 13) % 99991 + 1) * 10.0 ** ((i % 7) - 3)
              * (-1 if i % 3 == 0 else 1) for i in range(3000)]
    vals_b = [((i * i * 11 + 5) % 49999 + 1) * 10.0 ** ((i % 9) - 4)
              * (-1 if i % 5 == 0 else 1) for i in range(2000)]
    # libm-boundary edges: exact powers of two on both sides, zero,
    # and a sub-normal-range magnitude (must collapse to the 0 cell)
    vals_a += [2.0 ** k for k in (-10, -1, 0, 1, 30, 300)]
    vals_a += [-(2.0 ** k) for k in (-9, 0, 2, 100)]
    vals_a += [0.0, 1e-310, -1e-320]
    a = spark.createDataFrame([(v,) for v in vals_a], "v double")
    b = spark.createDataFrame([(v,) for v in vals_b], "v double")
    union = a.unionByName(b)

    # per-value exactness: lo <= v < lo*(1+2^-B) (mirrored for v<0),
    # and v = 2^k maps to lo = v exactly (the ±1 exponent correction)
    from pyspark.sql import functions as F
    pairs = union.select("v", qsketch_bucket_double_signed(F.col("v"))
                         .alias("lo")).collect()
    for r in pairs:
        v, lo = r.v, r.lo
        if abs(v) < 2.0 ** -1022:
            assert lo == 0.0, (v, lo)
        elif v > 0:
            assert lo <= v <= lo * (1 + rel), (v, lo)
        else:
            assert lo >= v >= lo * (1 + rel), (v, lo)
    for k in (-10, -1, 0, 1, 30, 300):
        got = [r.lo for r in pairs if r.v == 2.0 ** k]
        assert got and all(g == 2.0 ** k for g in got), (k, got)

    sk_u = qsketch_build(union, "v", signed=True, double=True)
    assert sk_u.filter("bucket_lo = 0.0").count() == 1
    assert sk_u.filter("bucket_lo < 0.0").count() > 0
    merged = qsketch_merge(
        qsketch_build(a, "v", signed=True, double=True),
        qsketch_build(b, "v", signed=True, double=True))
    assert sorted(map(tuple, sk_u.collect())) == \
        sorted(map(tuple, merged.collect()))

    qs = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]
    got = {(r.q_num, r.q_den): r.lo
           for r in qsketch_quantiles(sk_u, qs, lo_type="double")
           .collect()}
    allv = sorted(vals_a + vals_b)
    n = len(allv)
    for num, den in qs:
        rank = -(-num * n // den)
        x_q = allv[rank - 1]
        lo = got[(num, den)]
        if lo > 0:
            assert lo <= x_q <= lo * (1 + rel), (num, den, lo, x_q)
        elif lo < 0:  # negative cell: value-space UPPER bound
            assert lo >= x_q >= lo * (1 + rel), (num, den, lo, x_q)
        else:
            assert abs(x_q) < 2.0 ** -1022, (num, den, lo, x_q)


# ------------------------------------------- r11 non-vacuousness (VERDICT #5)
def test_dedup_keep_best_nonvacuous(spark):
    """The r10 verdict: parity green alone can be vacuous. Pin that at
    the driver SF the resolver actually RESOLVES something — at least
    one multi-member cluster exists, its dropped_chars accounting is
    positive, and kept_chars never exceeds the cluster total."""
    import __spark_entry__ as em
    from tests.conftest import SF_DIR

    rows = em.queries()["dedup_keep_best"](spark, SF_DIR).collect()
    assert rows, "no clusters at all"
    multi = [r for r in rows if r.n_members > 1]
    assert multi, "no multi-member cluster resolved — vacuous"
    assert any(r.dropped_chars > 0 for r in multi), \
        "nothing was ever dropped — vacuous"
    for r in rows:
        assert r.kept_chars + r.dropped_chars >= r.kept_chars
        assert (r.n_members == 1) == (r.dropped_chars == 0) or \
            r.n_members > 1, r


def test_boilerplate_mask_nonvacuous(spark):
    """Boiler hits must actually occur (> 0 somewhere) and the clean
    token arithmetic must hold row-by-row."""
    import __spark_entry__ as em
    from tests.conftest import SF_DIR

    rows = em.queries()["text_boilerplate_mask"](spark, SF_DIR).collect()
    assert rows
    assert sum(r.n_boiler for r in rows) > 0, "zero boiler hits — vacuous"
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_windows
        assert r.clean_tokens == 2 * (r.n_windows - r.n_boiler)


def test_boilerplate_mask_zero_window_doc_excluded(spark, tmp_path):
    """A document too short to form one 2-word window contributes no
    rows (both engines drop it at the explode/unnest): pin that on a
    hand-built corpus where doc 99 is a single token and docs 1-3
    share a template phrase, against the same DuckDB oracle."""
    import duckdb
    import __spark_entry__ as em

    fix = str(tmp_path / "sf_fixture")
    docs = spark.createDataFrame(
        [(1, "breaking news today copyright acme corp", "en", "web", 40),
         (2, "weather report sunny copyright acme corp", "en", "web", 41),
         (3, "sports final scores copyright acme corp", "en", "web", 40),
         (99, "singleton", "en", "web", 9)],
        "doc_id long, text string, lang string, source string, n_chars long")
    docs.coalesce(1).write.mode("overwrite").parquet(
        f"{fix}/documents.parquet")

    out = {r.doc_id: r for r in
           em.queries()["text_boilerplate_mask"](spark, fix).collect()}
    assert 99 not in out, "zero-window doc must vanish at the explode"
    assert set(out) == {1, 2, 3}
    assert sum(r.n_boiler for r in out.values()) > 0
    # every 2-window doc here is fully template or half template; the
    # shared tail 'copyright acme corp' guarantees at least one hit in
    # each doc (top-20 covers every distinct shingle of this corpus)
    assert all(r.n_boiler >= 1 for r in out.values())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{fix}/documents.parquet/*.parquet')")
    oracle = {r[0]: r for r in con.execute(
        em.oracle_sql()["text_boilerplate_mask"]).fetchall()}
    con.close()
    assert set(oracle) == set(out)
    for k, r in out.items():
        assert (r.n_windows, r.n_boiler, r.clean_tokens) == oracle[k][1:4]


def test_qsketch_grouped_invariants(spark):
    """Grouped-sketch invariants (r11): per-group sketches must equal
    the per-group single-sketch builds cell for cell (grouping must not
    perturb bucketing), merge cellwise within each group, and keep the
    2^-B bound per group quantile."""
    from drill_calcite_spark.operators.qsketch import (
        QSKETCH_SUB_BITS, qsketch_build, qsketch_build_grouped,
        qsketch_quantiles_grouped,
    )

    rel = 2.0 ** -QSKETCH_SUB_BITS
    rows = [("g%d" % (i % 3), ((i * i * 7 + 13) % 99991 + 1)
             * 10.0 ** ((i % 5) - 2) * (-1 if i % 4 == 0 else 1))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "k string, v double")

    grouped = qsketch_build_grouped(df, ["k"], "v",
                                    signed=True, double=True)
    for k in ("g0", "g1", "g2"):
        solo = qsketch_build(df.filter(F.col("k") == k), "v",
                             signed=True, double=True)
        a = sorted((r.bucket_lo, r.cnt) for r in
                   grouped.filter(F.col("k") == k)
                   .select("bucket_lo", "cnt").collect())
        b = sorted(map(tuple, solo.collect()))
        assert a == b, f"group {k} sketch differs from solo build"

    qs = [(1, 4), (1, 2), (9, 10)]
    got = {(r.k, r.q_num, r.q_den): r.lo
           for r in qsketch_quantiles_grouped(
               grouped, ["k"], qs, lo_type="double").collect()}
    import collections
    by_k = collections.defaultdict(list)
    for k, v in rows:
        by_k[k].append(v)
    for k, vals in by_k.items():
        vals.sort()
        n = len(vals)
        for num, den in qs:
            x_q = vals[-(-num * n // den) - 1]
            lo = got[(k, num, den)]
            if lo > 0:
                assert lo <= x_q <= lo * (1 + rel), (k, num, den, lo, x_q)
            elif lo < 0:
                assert lo >= x_q >= lo * (1 + rel), (k, num, den, lo, x_q)


def test_grouped_sketch_reserved_key_guard(spark):
    """r12 (ADVICE): grouped builders select internal working columns
    unqualified — a group key named like one (e.g. ``bucket_lo``,
    ``m``) must fail LOUD at the API boundary, not produce an
    ambiguous-column error or a silently wrong aggregate downstream."""
    import pytest
    from drill_calcite_spark.operators.qsketch import (
        qsketch_build_grouped, qsketch_quantiles_grouped,
    )
    from drill_calcite_spark.operators.sketch import (
        hll_registers_grouped, hll_summary_grouped,
    )

    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "bucket_lo string, v long")
    with pytest.raises(ValueError, match="bucket_lo"):
        qsketch_build_grouped(df, ["bucket_lo"], "v")
    with pytest.raises(ValueError, match="cum"):
        qsketch_quantiles_grouped(df, ["cum"], [(1, 2)])
    df2 = spark.createDataFrame([("a", "x")], "m string, tok string")
    with pytest.raises(ValueError, match="'m'"):
        hll_registers_grouped(df2, ["m"], "tok")
    with pytest.raises(ValueError, match="est_raw"):
        hll_summary_grouped(df2, ["est_raw", "m"])
    # clean keys still build
    ok = spark.createDataFrame([("a", 1), ("a", 9), ("b", 3)],
                               "src string, v long")
    assert qsketch_build_grouped(ok, ["src"], "v").count() > 0
    assert hll_registers_grouped(
        ok.selectExpr("src", "cast(v as string) tok"),
        ["src"], "tok").count() > 0


def test_grouped_merge_epochs_non_vacuous(spark):
    """sketch_qsketch_grouped_merge (r12): the merge must combine two
    genuinely different non-empty epoch sketches — if either epoch
    were empty or the sketches identical, the merge identity the
    driver row hash-proves would be vacuous. Also asserts the merged
    sketch differs from each input (counts strictly grew somewhere)."""
    from drill_calcite_spark.operators.qsketch import (
        qsketch_build_grouped, qsketch_merge_grouped,
    )
    from drill_calcite_spark.queries.common import t
    from tests.conftest import SF_DIR

    ev = t(spark, SF_DIR, "events").select(
        "event_id", "event_type",
        (F.col("value") - F.lit(50.0)).cast("double").alias("v"))
    cells, sks = {}, {}
    for tag, pred in (("a", F.col("event_id") % 2 == 0),
                      ("b", F.col("event_id") % 2 == 1)):
        sks[tag] = qsketch_build_grouped(
            ev.filter(pred), ["event_type"], "v",
            signed=True, double=True)
        cells[tag] = {(r.event_type, r.bucket_lo): r.cnt
                      for r in sks[tag].collect()}
        assert cells[tag], f"epoch {tag} sketch is empty"
    assert cells["a"] != cells["b"], "epoch sketches identical"
    merged = {(r.event_type, r.bucket_lo): r.cnt
              for r in qsketch_merge_grouped(
                  ["event_type"], sks["a"], sks["b"]).collect()}
    for tag in ("a", "b"):
        assert merged != cells[tag], f"merge equals epoch {tag} alone"
    for k, n in merged.items():
        assert n == cells["a"].get(k, 0) + cells["b"].get(k, 0), \
            f"cell {k} not the sum of its epoch cells"


def test_hll_grouped_merge_epochs_non_vacuous(spark):
    """sketch_hll_grouped_merge (r12): both epoch register tables must
    be non-empty and differ, and every merged register must equal the
    MAX of its epoch registers (absent = 0) — otherwise the driver
    row's merge identity would be vacuous."""
    from drill_calcite_spark.operators.sketch import (
        hll_merge_grouped, hll_registers_grouped,
    )
    from drill_calcite_spark.queries.common import t
    from tests.conftest import SF_DIR

    ev = t(spark, SF_DIR, "events")
    regs = {}
    for tag, pred in (("a", F.col("event_id") % 2 == 0),
                      ("b", F.col("event_id") % 2 == 1)):
        r = hll_registers_grouped(ev.filter(pred), ["event_type"],
                                  "user_id")
        regs[tag] = {(x.event_type, x.bucket): x.m for x in r.collect()}
        assert regs[tag], f"epoch {tag} registers empty"
    assert regs["a"] != regs["b"], "epoch registers identical"
    ra = hll_registers_grouped(ev.filter(F.col("event_id") % 2 == 0),
                               ["event_type"], "user_id")
    rb = hll_registers_grouped(ev.filter(F.col("event_id") % 2 == 1),
                               ["event_type"], "user_id")
    merged = {(x.event_type, x.bucket): x.m
              for x in hll_merge_grouped(["event_type"], ra, rb)
              .collect()}
    assert set(merged) == set(regs["a"]) | set(regs["b"])
    for k, m in merged.items():
        assert m == max(regs["a"].get(k, 0), regs["b"].get(k, 0)), \
            f"register {k} is not the epoch max"


def test_cms_grouped_merge_property(spark):
    """cms_merge_grouped (r12): per-group epoch builds must combine
    cellwise into exactly the union's build — merge(build(A), build(B))
    == build(A|B) per (group, j, bucket) — with both epochs non-empty
    and distinct."""
    from drill_calcite_spark.operators.sketch import (
        cms_merge_grouped, cms_sketch_grouped,
    )
    from drill_calcite_spark.queries.common import t
    from tests.conftest import SF_DIR

    ev = t(spark, SF_DIR, "events").select(
        "event_id", "event_type",
        F.col("user_id").cast("string").alias("u"))
    full = {(r.event_type, r.j, r.bucket): r.cnt
            for r in cms_sketch_grouped(ev, ["event_type"], "u")
            .collect()}
    parts = {}
    for tag, pred in (("a", F.col("event_id") % 2 == 0),
                      ("b", F.col("event_id") % 2 == 1)):
        parts[tag] = cms_sketch_grouped(ev.filter(pred),
                                        ["event_type"], "u")
        cells = {(r.event_type, r.j, r.bucket): r.cnt
                 for r in parts[tag].collect()}
        assert cells and cells != full, f"epoch {tag} vacuous"
    merged = {(r.event_type, r.j, r.bucket): r.cnt
              for r in cms_merge_grouped(["event_type"], parts["a"],
                                         parts["b"]).collect()}
    assert merged == full, "grouped CMS merge != union build"


def test_cms_grouped_merge_row_epochs_non_vacuous(spark):
    """sketch_cms_grouped_merge (r13): the driver row's two DOCUMENT
    epochs (even/odd doc_id) must both be non-empty and produce
    different per-source sketches — otherwise its merge ≡ single-build
    hash identity would be vacuous."""
    from drill_calcite_spark.operators.sketch import cms_sketch_grouped
    from drill_calcite_spark.queries.common import t
    from drill_calcite_spark.queries.llm import tokens
    from tests.conftest import SF_DIR

    wf_all = (t(spark, SF_DIR, "documents")
              .select("doc_id", "source",
                      F.explode(tokens(F.col("text"))).alias("tok")))
    cells = {}
    for parity in (0, 1):
        wf = (wf_all.filter(F.col("doc_id") % 2 == parity)
              .groupBy("source", "tok")
              .agg(F.count(F.lit(1)).cast("bigint").alias("freq")))
        sk = cms_sketch_grouped(wf, ["source"], "tok", "freq")
        cells[parity] = {(r.source, r.j, r.bucket): r.cnt
                         for r in sk.collect()}
        assert cells[parity], f"epoch {parity} sketch empty"
    assert cells[0] != cells[1], "document epoch sketches identical"


# ------------------------------------------------- hot-bucket split (r15)
def test_bucket_pairs_split_parity_and_hot_routing(spark):
    """bucket_pairs(split_above=s): the pair set is identical to the
    uncapped aggregation, over-cap buckets route through the streaming
    key self-join (bounded aggregation buffer), and a planted hot bucket
    — the mass-duplicate-corpus shape — still yields its complete i<j
    pair set."""
    from pyspark.sql import functions as F

    from drill_calcite_spark.operators.similarity import bucket_pairs

    # 3 buckets: hot (40 ids), medium (4 ids), pair (2 ids)
    rows = ([("hot", i) for i in range(40)]
            + [("med", i) for i in (100, 101, 102, 103)]
            + [("two", i) for i in (200, 201)])
    banded = spark.createDataFrame(rows, "bkt string, id long")
    base = bucket_pairs(banded, ["bkt"], "id", "i", "j", ordered=False)
    split = bucket_pairs(banded, ["bkt"], "id", "i", "j", ordered=False,
                         split_above=8)
    got_base = {(r.i, r.j) for r in base.collect()}
    got_split = {(r.i, r.j) for r in split.collect()}
    want = {(a, b) for a in range(40) for b in range(40) if a < b}
    want |= {(a, b) for a in (100, 101, 102, 103)
             for b in (100, 101, 102, 103) if a < b}
    want |= {(200, 201)}
    assert got_base == want and got_split == want
    # the hot bucket must NOT enter the collect_list branch: the plan's
    # join branch carries it (an equi SortMerge/ShuffledHash join on the
    # bucket key — never a cartesian product)
    plan = split._sc._jvm.PythonSQLUtils.explainString(
        split._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "Join" in plan, "hot branch self-join missing from the plan"
    # ordered=True variant: both directions, no self-pairs
    osplit = bucket_pairs(banded, ["bkt"], "id", "i", "j", ordered=True,
                          split_above=8)
    got_o = {(r.i, r.j) for r in osplit.collect()}
    assert got_o == {(a, b) for (a, b) in want} | {(b, a)
                                                   for (a, b) in want}
    # NULL bucket keys pair in neither branch
    with_null = banded.union(
        spark.createDataFrame([(None, 300), (None, 301)],
                              "bkt string, id long"))
    ns = bucket_pairs(with_null, ["bkt"], "id", "i", "j", ordered=False,
                      split_above=8)
    assert {(r.i, r.j) for r in ns.collect()} == want


def test_verify_jaccard_skewed_pair_fanout(spark):
    """VERDICT r14 item 7: one document appearing in many candidate pairs
    (the hub-document skew shape) — the melt re-widen must stay exact and
    the per-group state bounded (2 rows per (doc_i, doc_j) group
    regardless of how many pairs share a member)."""
    from pyspark.sql import functions as F

    from drill_calcite_spark.operators.dedup import verify_jaccard

    n = 300  # doc 0 is a member of 299 pairs
    docs = [(0, ["a b", "b c", "c d"])]
    docs += [(i, ["a b", "b c", f"x{i} y{i}"]) for i in range(1, n)]
    shingled = spark.createDataFrame(docs, "doc_id long, sh array<string>")
    pairs = spark.createDataFrame([(0, i) for i in range(1, n)],
                                  "doc_i long, doc_j long")
    out = verify_jaccard(pairs, shingled, "doc_id", "sh", 0.4)
    got = {(r.doc_i, r.doc_j): r.jaccard for r in out.collect()}
    # each pair shares {a b, b c} of a 4-element union: jaccard = 0.5
    assert got == {(0, i): 0.5 for i in range(1, n)}
    # a pair with a member missing from the corpus drops (NULL set)
    pairs2 = pairs.union(spark.createDataFrame([(0, 999)],
                                               "doc_i long, doc_j long"))
    out2 = verify_jaccard(pairs2, shingled, "doc_id", "sh", 0.4)
    assert out2.count() == n - 1


def test_bucket_pairs_counts_first_routing_max_and_split(spark):
    """r15 final bucket_pairs form: sizes are counted FIRST and routing
    happens via broadcast anti/semi joins, so an over-``max_size``
    bucket is dropped BEFORE any collect_list buffer is built (the old
    ``max_size<=split_above`` shortcut collected it first and filtered
    after — the unbounded allocation the split exists to prevent), and
    the three-way routing (drop / hot self-join / aggregation) is
    pair-set-exact."""
    from drill_calcite_spark.operators.similarity import bucket_pairs

    # buckets: "drop" (40 rows > max), "hot" (10 rows: split < 10 <= max),
    # "med" (4 rows <= split), "two" (2 rows)
    rows = ([("drop", i) for i in range(40)]
            + [("hot", i) for i in range(100, 110)]
            + [("med", i) for i in (200, 201, 202, 203)]
            + [("two", i) for i in (300, 301)])
    banded = spark.createDataFrame(rows, "bkt string, id long")
    want = {(a, b) for a in range(100, 110) for b in range(100, 110)
            if a < b}
    want |= {(a, b) for a in (200, 201, 202, 203)
             for b in (200, 201, 202, 203) if a < b}
    want |= {(300, 301)}

    # combined: max_size above split_above — drop / hot / agg all live
    out = bucket_pairs(banded, ["bkt"], "id", "i", "j", ordered=False,
                       max_size=20, split_above=8)
    assert {(r.i, r.j) for r in out.collect()} == want

    # max_size BELOW split_above (the ngram stop-shingle shape): the
    # over-max bucket must be anti-joined out BEFORE the aggregation —
    # the plan's ObjectHashAggregate input carries a broadcast anti join
    capped = bucket_pairs(banded, ["bkt"], "id", "i", "j", ordered=False,
                          max_size=8, split_above=64)
    want_capped = ({(a, b) for a in (200, 201, 202, 203)
                    for b in (200, 201, 202, 203) if a < b}
                   | {(300, 301)})
    assert {(r.i, r.j) for r in capped.collect()} == want_capped
    plan = capped._sc._jvm.PythonSQLUtils.explainString(
        capped._jdf.queryExecution(), "formatted")
    assert "LeftAnti, BuildRight" in plan or "LeftAnti BuildRight" in plan \
        or "BroadcastHashJoin" in plan, plan
    # no window-count pass anywhere in the routing
    assert "Window" not in plan
