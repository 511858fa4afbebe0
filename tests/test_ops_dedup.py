"""Dedup + similarity operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kg.ops import (
    brute_force_topk,
    embedding_near_duplicates,
    exact_duplicates,
    lsh_ann_topk,
    minhash_duplicates,
    ngram_jaccard_pairs,
    simhash_candidates,
    simhash_col,
    simhash_col_jvm,
)
# pinned in test_simhash_pinned_value; regenerate ONLY on a deliberate
# hash-recipe change (old signatures become invalid — re-band everything)
SIMHASH_PIN = 1621299339139776728


@pytest.fixture()
def docs_with_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup
        (4, "completely different content about spark shuffles and joins"),
        (5, "spark shuffle partitions and broadcast joins explained fully"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs_with_dups):
    out = {
        r.keeper_id: r.n_copies
        for r in exact_duplicates(docs_with_dups, "doc_id", "text").collect()
    }
    assert out[1] == 2  # docs 1,2 collapse
    assert sum(out.values()) == 5 and len(out) == 4


def test_minhash_near_duplicates(docs_with_dups):
    pairs = {
        (r.a, r.b)
        for r in minhash_duplicates(
            docs_with_dups, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert ("1", "2") in pairs  # exact dup found
    assert ("1", "3") in pairs or ("2", "3") in pairs  # near dup found
    # precision: the two dissimilar docs must NOT pair
    assert not any({"4", "5"} == {a, b} for a, b in pairs)


def test_ngram_jaccard_exact_dup_is_one(spark, docs_with_dups):
    pairs = spark.createDataFrame([(1, 2), (1, 4)], "a long, b long")
    out = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(pairs, docs_with_dups, "doc_id", "text").collect()
    }
    assert out[(1, 2)] == 1.0
    assert out[(1, 4)] < 0.1


def test_simhash_deterministic_and_near(docs_with_dups):
    sim = simhash_col(docs_with_dups, "doc_id", "text")
    vals = {r.id: r.simhash for r in sim.collect()}
    assert vals["1"] == vals["2"]
    cands = {
        (r.a, r.b): r.hamming for r in simhash_candidates(sim).collect()
    }
    assert cands[("1", "2")] == 0
    # near-dup 3 shares bands with 1 (one word changed)
    assert ("1", "3") in cands and cands[("1", "3")] <= 16


def test_simhash_jvm_and_arrow_folds_agree(spark):
    """The JVM explode/groupBy fold and the Arrow numpy fold must produce
    identical signatures — including ties (2s == n → bit 0), empty docs,
    and documents long enough to span multiple fold chunks."""
    rows = [
        (1, ""),
        (2, "one"),
        (3, "a b a b"),  # tie-heavy tiny doc
        (4, " ".join(f"w{i % 97}" for i in range(5000))),  # long doc
        (5, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    jvm = {r.id: r.simhash for r in simhash_col_jvm(df, "doc_id", "text").collect()}
    # chunk of 512 makes doc 4 (5000 tokens) span multiple reduceat chunks
    arrow = {
        r.id: r.simhash
        for r in simhash_col(df, "doc_id", "text", chunk_tokens=512).collect()
    }
    assert jvm == arrow


def test_simhash_pinned_value(spark):
    """Signature stability golden: xxhash64-based simhash of a fixed
    string must never drift (resume + banding depend on it)."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "")], "doc_id long, text string"
    )
    vals = {r.id: r.simhash for r in simhash_col(df, "doc_id", "text").collect()}
    assert vals["2"] == 0  # empty doc → zero signature
    assert vals["1"] == SIMHASH_PIN


def test_brute_force_topk_self_similarity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(3)
    out = brute_force_topk(queries, emb, "vec_id", "vec_id", "embedding", k=4)
    rows = out.collect()
    assert len(rows) == 12  # 3 queries × k
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.cosine)
    for scores in by_q.values():
        assert scores == sorted(scores, reverse=True)
        assert all(-1.0001 <= s <= 1.0001 for s in scores)


def test_lsh_ann_subset_of_brute_force_space(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    queries = emb.limit(2)
    ann = lsh_ann_topk(
        queries, emb, "vec_id", "vec_id", "embedding", dim=64, k=3,
        planes=16, bands=8,
    )
    rows = ann.collect()
    # ANN returns ranked rows with valid cosine; bucket may be small
    for r in rows:
        assert -1.0001 <= r.cosine <= 1.0001 and r.rk >= 1


def test_simhash_candidates_degenerate_bucket_capped(spark):
    """500 empty docs all hash to simhash 0 and share every band; without
    the max_bucket cap the self-join is quadratic (~125k pairs here,
    corpus² at scale).  With the cap the degenerate bucket is dropped
    while real near-dup pairs survive."""
    rows = [(i, "") for i in range(500)] + [
        (1000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1001, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    sim = simhash_col(
        spark.createDataFrame(rows, "doc_id long, text string"), "doc_id", "text"
    )
    pairs = simhash_candidates(sim, max_bucket=64).collect()
    ids = {int(r.a) for r in pairs} | {int(r.b) for r in pairs}
    assert all(i >= 1000 for i in ids)  # empty-doc cluster fully dropped
    assert ("1000", "1001") in {(r.a, r.b) for r in pairs}  # real pair kept


def test_lsh_ann_degenerate_bucket_capped(spark):
    """500 zero vectors share one band key per band (every sign bit fires
    the same way); the corpus-side cap must drop them so candidates stay
    |q|×|small buckets|, while a distinctive vector remains findable."""
    zeros = [(i, [0.0, 0.0, 0.0, 0.0]) for i in range(500)]
    real = [
        (1000, [1.0, 2.0, -3.0, 0.5]),
        (1001, [1.0, 2.1, -3.0, 0.4]),
        (1002, [-5.0, 1.0, 2.0, -0.5]),
    ]
    emb = spark.createDataFrame(zeros + real, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") == 1000)
    out = lsh_ann_topk(
        queries, emb, "vec_id", "vec_id", "embedding", dim=4, k=5,
        planes=16, bands=4, max_bucket=64,
    ).collect()
    neighbors = {r.neighbor_id for r in out}
    assert all(n >= 1000 for n in neighbors)  # zero-vector cluster dropped
    assert 1001 in neighbors  # the true near neighbor survives the cap


def test_ivf_topk_exact_rerank_and_twin_guarantee(spark, sf_dir):
    """IVF cell-probe ANN: (a) identical vectors land in the same cell
    (total-order tie-break), so an exact twin is ALWAYS found at cosine
    1.0 rank 1; (b) every returned cosine equals the brute-force cosine
    for that pair (exact re-rank); (c) corpus vectors sit in exactly one
    cell."""
    from kg.ops import brute_force_topk, ivf_assign, ivf_topk

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    # plant an exact twin of vector 50
    twin = emb.filter(F.col("vec_id") == 50).select(
        F.lit(9999).cast(emb.schema["vec_id"].dataType).alias("vec_id"), "v"
    )
    aug = emb.unionByName(twin).localCheckpoint()
    centroids = aug.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    queries = aug.filter(F.col("vec_id") == 50)

    cells = ivf_assign(aug, "vec_id", "v", centroids, nprobe=1)
    assert cells.count() == aug.count()  # exactly one cell per vector

    ivf = ivf_topk(queries, aug, centroids, "vec_id", "vec_id", "v", k=5)
    rows = {r.neighbor_id: (r.cosine, r.rk) for r in ivf.collect()}
    assert rows[9999] == (1.0, 1)  # twin guaranteed: same cell, cosine 1

    brute = {
        r.neighbor_id: r.cosine
        for r in brute_force_topk(
            queries, aug, "vec_id", "vec_id", "v", k=250
        ).collect()
    }
    for nid, (cos, _) in rows.items():
        assert brute[nid] == cos  # re-rank is the exact cosine


def test_embedding_near_duplicates_finds_identical(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.99, 0.14, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        (r.a, r.b): r.cosine
        for r in embedding_near_duplicates(
            emb, "vec_id", "embedding", dim=4, threshold=0.95
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    assert (1, 4) not in out


def test_embedding_near_duplicates_join_shapes_agree(spark, monkeypatch):
    """r6: the vector-attach joins broadcast the (linear-sized) emb side
    and pin the Python re-rank stage's width with an explicit-count
    repartition when the gate fires; over-budget corpora keep the old
    sort-merge shape.  Both shapes must produce identical rows — force
    the gate shut via the budget and compare against the default path
    on a corpus dense enough to make multi-band duplicate candidates."""
    import random

    import kg.hints

    rng = random.Random(7)
    rows = []
    for i in range(80):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, [float(x) for x in base]))
        # planted near-dup: tiny perturbation keeps cosine ≥ threshold
        rows.append((1000 + i, [float(x + 0.01 * rng.random()) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def run():
        return sorted(
            map(
                tuple,
                embedding_near_duplicates(
                    emb, "vec_id", "embedding", dim=8, threshold=0.98,
                    planes=16, bands=8,
                ).collect(),
            )
        )

    fast = run()  # broadcast + pinned-width path (gate open on test data)
    monkeypatch.setattr(kg.hints, "DEFAULT_MAX_BYTES", 0)  # gate shut
    slow = run()  # sort-merge attach path
    assert fast == slow
    assert len(fast) > 0  # the corpus actually produced near-dup pairs


def _token_doc(seed: int, n: int = 60) -> list[str]:
    """Deterministic pseudo-random token list over a 500-token vocab."""
    import hashlib

    return [
        f"tok{int(hashlib.sha256(f'{seed}:{i}'.encode()).hexdigest()[:8], 16) % 500}"
        for i in range(n)
    ]


def _shingle_set(toks: list[str], n: int = 3) -> set[str]:
    """Python twin of kg.ops.dedup.token_ngrams (distinct word n-grams)."""
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_minhash_recall_vs_exact_jaccard(spark):
    """Quantitative quality gate (VERDICT r2 #3), mirroring the banded-LSH
    embedding gate: recall ≥ 0.9 against EXACT-Jaccard ground truth on a
    planted near-dup corpus.  At t=0.7, r=4, b=16 banding theory predicts
    per-pair candidate probability 1-(1-J^4)^16 ≥ 0.99 for J ≥ 0.73, so
    0.9 leaves honest slack.  Precision needs no gate: candidates are
    re-scored with the exact Jaccard before thresholding."""
    docs, truth = [], set()
    did = 0
    for b in range(40):
        base = _token_doc(b)
        twin = list(base)
        for j in range((b % 6) + 1):  # 1..6 replaced tokens
            twin[10 + 7 * j] = f"alt{b}_{j}"
        docs += [(did, " ".join(base)), (did + 1, " ".join(twin))]
        did += 2
    # exact ground truth over ALL pairs (test scale only)
    sh = {i: _shingle_set(t.split()) for i, t in docs}
    ids = sorted(sh)
    for i_pos, i in enumerate(ids):
        for j in ids[i_pos + 1 :]:
            jac = len(sh[i] & sh[j]) / len(sh[i] | sh[j])
            if jac >= 0.7:
                truth.add(tuple(sorted((str(i), str(j)))))
    assert len(truth) >= 15  # the plant worked (m=1..3 twins qualify)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    found = {
        tuple(sorted((r.a, r.b)))
        for r in minhash_duplicates(df, "doc_id", "text", threshold=0.7).collect()
    }
    assert found <= truth  # exact re-score → perfect precision
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"minhash recall {recall:.3f} < 0.9"


def test_simhash_candidates_catch_all_hamming_le_3(spark):
    """SimHash quality bound: 4 bands × 16 bits over a 64-bit signature
    GUARANTEE (pigeonhole) that every pair within hamming distance 3
    shares at least one band — recall for hamming ≤ 3 is exactly 1.0.
    Verified against exhaustively computed hamming ground truth."""
    docs = []
    did = 0
    for b in range(20):
        base = _token_doc(100 + b, n=200)
        twin = list(base)
        twin[17] = f"alt{b}"  # one replaced token of 200 → tiny hamming
        docs += [(did, " ".join(base)), (did + 1, " ".join(twin))]
        did += 2
    sim = simhash_col(
        spark.createDataFrame(docs, "doc_id long, text string"), "doc_id", "text"
    ).localCheckpoint()
    vals = {r.id: r.simhash for r in sim.collect()}
    ids = sorted(vals)
    close = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    assert len(close) >= 5  # the plant worked
    cands = {tuple(sorted((r.a, r.b))) for r in simhash_candidates(sim).collect()}
    missed = {tuple(sorted(p)) for p in close} - cands
    assert not missed, f"hamming≤3 pairs missed by banding: {missed}"


def _planted_near_dups(spark, sf_dir, n_twins=50):
    """Corpus + perturbed twins (cosine ≈ 0.98-0.995): ground truth for
    recall, since the raw testdata has no pairs above cosine ~0.6."""
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .limit(250)
    )
    twins = emb.filter(F.col("vec_id") < n_twins).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.6) * x * x).alias("v"),
    )
    return emb.unionByName(twins)


def test_banded_lsh_recall_vs_brute_force(spark, sf_dir):
    """VERDICT r1 gate: banded OR-of-ANDs recall ≥ 0.9 vs the exact
    ground truth on a planted near-dup set (the AND-only design this
    replaces had ~8% recall at its own default threshold)."""
    from kg.ops.similarity import _cosine

    aug = _planted_near_dups(spark, sf_dir).localCheckpoint()
    found = {
        (r.a, r.b)
        for r in embedding_near_duplicates(
            aug, "vec_id", "v", dim=64, threshold=0.9
        ).collect()
    }
    # exact ground truth by brute force (test scale only)
    a = aug.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = aug.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    truth = {
        (r.a, r.b)
        for r in a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn("c", _cosine(F.col("va"), F.col("vb")))
        .filter(F.col("c") >= 0.9)
        .select("a", "b")
        .collect()
    }
    assert len(truth) >= 40  # the plant worked
    assert found <= truth  # exact re-rank → perfect precision
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9"


def test_banded_signatures_arrow_matches_expr(spark, sf_dir):
    """The Arrow engine's left-to-right dim accumulation reproduces the
    SQL fold's IEEE operation sequence exactly — every (id, band, key)
    row identical, including twin vectors perturbed off the raw data
    (sign bits near 0 are where an order change would flip first)."""
    from kg.ops.similarity import banded_signatures

    aug = _planted_near_dups(spark, sf_dir).localCheckpoint()
    rows = {}
    for engine in ("arrow", "expr"):
        got = banded_signatures(
            aug, "vec_id", "v", dim=64, planes=64, bands=8, engine=engine
        ).collect()
        rows[engine] = sorted((r.vec_id, r.band, r.key) for r in got)
    assert rows["arrow"] == rows["expr"]
    assert len(rows["arrow"]) == aug.count() * 8


def test_banded_signatures_arrow_handles_dirty_vectors(spark):
    """NULL vectors and wrong-length vectors must not kill the python
    worker: the arrow engine mirrors the expr engine's degradation
    (zip_with null-padding → NULL dot → all-'0' band keys)."""
    from kg.ops.similarity import banded_signatures

    df = spark.createDataFrame(
        [
            (1, [float(i) for i in range(8)]),
            (2, None),
            (3, [1.0, 2.0]),  # shorter than dim
            (4, [float(i) for i in range(12)]),  # longer than dim
        ],
        "vec_id long, v array<double>",
    )
    rows = {}
    for engine in ("arrow", "expr"):
        got = banded_signatures(
            df, "vec_id", "v", dim=8, planes=16, bands=4, engine=engine
        ).collect()
        rows[engine] = sorted((r.vec_id, r.band, r.key) for r in got)
    assert rows["arrow"] == rows["expr"]
    dirty = {k for k in rows["arrow"] if k[0] in (2, 3, 4)}
    assert all(key == "0000" for _, _, key in dirty)


def test_winnow_duplicates_catches_shared_run(spark):
    """The MOSS guarantee carried to the pair level: two docs sharing a
    verbatim run of ≥ window+k-1 tokens become a candidate pair and
    survive the Jaccard re-rank when actually similar; dissimilar docs
    sharing nothing produce no pair."""
    from kg.ops import winnow_duplicates

    base = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [
            (1, base + " alpha beta"),
            (2, base + " gamma delta"),  # near-dup of 1 (long shared run)
            (3, "totally unrelated words about other topics entirely here"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.a, r.b) for r in winnow_duplicates(df, "doc_id", "text").collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_paragraph_dedup_hand_corpus(spark):
    """Corpus order (id, idx) decides keepers; within-doc and cross-doc
    later occurrences are removed; docs reassemble in original paragraph
    order; fully-duplicated and empty docs yield n_kept=0 / ''."""
    from kg.ops import paragraph_dedup

    df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha"),      # within-doc dup: 2nd 'alpha' dropped
            (2, "beta\ngamma"),              # 'beta' already seen in doc 1
            (3, "alpha\nbeta"),              # both seen → fully removed
            (4, "  \n\n"),                   # only empty/whitespace paragraphs
            (5, "delta"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.text_clean)
        for r in paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert got[1] == (3, 2, "alpha\nbeta")
    assert got[2] == (2, 1, "gamma")
    assert got[3] == (2, 0, "")
    assert got[4] == (0, 0, "")
    assert got[5] == (1, 1, "delta")
    assert len(got) == 5


def test_tokenless_docs_are_not_near_duplicates(spark):
    """Symbol-only / non-Latin docs tokenize to NOTHING; they must get an
    empty shingle set (not [\"\"]) or minhash pairs them all at
    jaccard 1.0 and clean mode deletes all but one."""
    from kg.ops.dedup import minhash_duplicates, token_ngrams

    docs = spark.createDataFrame(
        [(1, "!!! ???"), (2, "@@@ ###"), (3, "plain english words here")],
        ["doc_id", "text"],
    )
    sh = docs.select(token_ngrams(F.col("text")).alias("s")).collect()
    assert [len(r["s"]) for r in sh] == [0, 0, 2]  # 4 tokens -> two 3-grams
    pairs = minhash_duplicates(docs, "doc_id", "text", threshold=0.1)
    assert pairs.count() == 0


def test_pq_encode_and_adc_hand_vectors(spark):
    from kg.ops import pq_encode, pq_topk

    # dim=4, m=2 subspaces of 2 dims; codebook per subspace: code 0 at
    # origin-ish, code 1 offset — hand-checkable argmins and ADC sums
    cb = spark.createDataFrame(
        [
            (0, 0, [0.0, 0.0]), (0, 1, [10.0, 0.0]),
            (1, 0, [0.0, 0.0]), (1, 1, [0.0, 10.0]),
        ],
        "sub int, code int, cv array<double>",
    )
    vecs = spark.createDataFrame(
        [
            (1, [0.1, 0.0, 0.0, 0.1]),   # codes (0, 0)
            (2, [9.0, 0.0, 0.0, 9.5]),   # codes (1, 1)
            (3, [5.0, 0.0, 0.0, 0.0]),   # sub0 equidistant -> tie -> code 0
        ],
        "vid long, v array<double>",
    )
    codes = {
        (r["vid"], r["sub"]): r["code"]
        for r in pq_encode(vecs, "vid", "v", cb, m=2, dim=4).collect()
    }
    assert codes == {
        (1, 0): 0, (1, 1): 0,
        (2, 0): 1, (2, 1): 1,
        (3, 0): 0, (3, 1): 0,
    }
    # ADC for query 1 against neighbor 2: codes (1,1) ->
    # d(sub0=[0.1,0], [10,0]) = 9.9^2 = 98.01 ; d(sub1=[0,0.1],[0,10]) =
    # 9.9^2 -> adc_fp = 2 * 98_010_000
    top = {
        (r["query_id"], r["neighbor_id"]): (r["adc_fp"], r["rk"])
        for r in pq_topk(
            vecs, vecs, cb, "vid", "vid", "v", m=2, dim=4, k=2
        ).collect()
    }
    assert top[(1, 2)][0] == 196_020_000
    # neighbor 3 shares query 1's codes -> adc = d to code(0,0) twice
    # = 0.01 + 0.01 -> 20_000
    assert top[(1, 3)][0] == 20_000
    assert top[(1, 3)][1] == 1 and top[(1, 2)][1] == 2


def test_pq_rejects_indivisible_dim(spark):
    import pytest

    from kg.ops import pq_encode

    cb = spark.createDataFrame([(0, 0, [0.0])], "sub int, code int, cv array<double>")
    vecs = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vid long, v array<double>")
    with pytest.raises(ValueError):
        pq_encode(vecs, "vid", "v", cb, m=2, dim=3)


def test_pq_adc_ranks_track_true_neighbors(spark, sf_dir):
    """With a codebook spanning the data (first 8 vectors), ADC ranking
    must put a planted near-duplicate at rank 1 for its twin."""
    from pyspark.sql import functions as F

    from kg.ops import pq_topk, subvectors

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    twin = emb.filter(F.col("vec_id") == 0).select(
        F.lit(1000000).cast("long").alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.01) * x).alias("v"),
    )
    corpus = emb.unionByName(twin)
    cb = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("code"),
        F.posexplode(subvectors(F.col("v"), 8, 64)).alias("sub", "cv"),
    ).select("sub", "code", "cv")
    queries = corpus.filter(F.col("vec_id") == 1000000)
    top = pq_topk(
        queries, corpus, cb, "vec_id", "vec_id", "v", m=8, dim=64, k=1
    ).first()
    assert top["neighbor_id"] == 0  # the twin's source wins rank 1


def test_ivf_pq_residual_adc_hand_vectors(spark):
    """Hand-checkable IVF-PQ: 2 cells on axis 0/2, residual codebook with
    codes at [0,0] and [0,0.1] per subspace; every cell assignment,
    residual code and ADC sum below is computed by hand."""
    from kg.ops import ivf_pq_topk

    cent = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])],
        "cid int, cv array<double>",
    )
    cb = spark.createDataFrame(
        [(s, c, [0.0, 0.1 * c]) for s in (0, 1) for c in (0, 1)],
        "sub int, code int, cv array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.1, 0.0, 0.0]),   # cell 0, resid [0,.1|0,0] → codes (1,0)
            (2, [1.0, -0.1, 0.0, 0.0]),  # cell 0, resid [0,-.1|0,0] → codes (0,0)
            (3, [0.0, 0.0, 1.0, 0.1]),   # cell 1, resid [0,0|0,.1] → codes (0,1)
        ],
        "vec_id int, v array<double>",
    )
    q = spark.createDataFrame(
        [(100, [1.0, 0.05, 0.0, 0.0])], "vec_id int, v array<double>"
    )
    # nprobe=1: only cell 0 scanned; q resid [0,.05|0,0] → LUT sub0:
    # {code0: 2500, code1: 2500}, sub1: {code0: 0, code1: 10000}
    got = {
        (r["query_id"], r["neighbor_id"]): (r["adc_fp"], r["rk"])
        for r in ivf_pq_topk(
            q, corpus, cent, cb, "vec_id", "vec_id", "v",
            m=2, dim=4, k=5, nprobe=1,
        ).collect()
    }
    assert got == {(100, 1): (2500, 1), (100, 2): (2500, 2)}
    # nprobe=2 adds cell 1: q resid there [1,.05|-1,0] → v3 adc =
    # 1002500 + 1010000
    got2 = {
        r["neighbor_id"]: (r["adc_fp"], r["rk"])
        for r in ivf_pq_topk(
            q, corpus, cent, cb, "vec_id", "vec_id", "v",
            m=2, dim=4, k=5, nprobe=2,
        ).collect()
    }
    assert got2 == {1: (2500, 1), 2: (2500, 2), 3: (2012500, 3)}
    import pytest as _pt

    with _pt.raises(ValueError):
        ivf_pq_topk(q, corpus, cent, cb, "vec_id", "vec_id", "v", m=3, dim=4)


def test_sq_train_and_encode_hand_vectors(spark):
    """Hand-checkable SQ: bounds from one min/max pass, affine codes
    with edge clamping and the degenerate-dimension rule."""
    from pyspark.sql import functions as F

    from kg.ops import sq_encode, sq_train

    corpus = spark.createDataFrame(
        [("a", [1.0, 1.0]), ("b", [4.0, 2.0]), ("c", [2.0, 1.0])],
        "vec_id string, v array<double>",
    )
    bounds = sq_train(corpus, "v", dim=2)
    brow = bounds.first()
    assert brow["mins"] == [1.0, 1.0] and brow["maxs"] == [4.0, 2.0]
    # levels=3 → 4 buckets: a=[0,0]; b hits the max on both dims and
    # clamps to 3; c: floor(1/3·4)=1, floor(0)=0
    got = {
        r["vec_id"]: r["codes"]
        for r in sq_encode(corpus, "vec_id", "v", bounds, levels=3).collect()
    }
    assert got == {"a": [0, 0], "b": [3, 3], "c": [1, 0]}
    # out-of-range values clamp to the edge codes (queries quantized
    # against corpus bounds)
    oor = spark.createDataFrame(
        [("q", [-10.0, 50.0])], "vec_id string, v array<double>"
    )
    assert sq_encode(oor, "vec_id", "v", bounds, levels=3).first()[
        "codes"
    ] == [0, 3]
    # a degenerate dimension (max == min) codes to 0
    degen = spark.createDataFrame(
        [("x", [5.0, 1.0]), ("y", [5.0, 3.0])],
        "vec_id string, v array<double>",
    )
    dbounds = sq_train(degen, "v", dim=2)
    dgot = {
        r["vec_id"]: r["codes"]
        for r in sq_encode(degen, "vec_id", "v", dbounds, levels=3).collect()
    }
    assert dgot == {"x": [0, 0], "y": [0, 3]}
    import pytest

    with pytest.raises(ValueError):
        sq_encode(corpus, "vec_id", "v", bounds, levels=0)


def test_ivf_sq_hand_distances(spark):
    """One cell, three corpus vectors, levels=3: every code and every
    integer code-distance below is computed by hand."""
    from kg.ops import ivf_sq_topk

    corpus = spark.createDataFrame(
        [(10, [1.0, 1.0]), (11, [4.0, 2.0]), (12, [2.0, 1.0])],
        "vec_id long, v array<double>",
    )
    centroids = spark.createDataFrame(
        [(0, [1.0, 1.0])], "cid int, cv array<double>"
    )
    queries = corpus.filter("vec_id = 10")
    # codes: 10→[0,0], 11→[3,3], 12→[1,0]
    # dist(10,12) = 1²+0² = 1 ; dist(10,11) = 3²+3² = 18
    got = [
        (r["neighbor_id"], r["sq_fp"], r["rk"])
        for r in ivf_sq_topk(
            queries, corpus, centroids, "vec_id", "vec_id", "v",
            dim=2, levels=3, k=5, nprobe=1,
        ).orderBy("rk").collect()
    ]
    assert got == [(12, 1, 1), (11, 18, 2)]


def test_ivf_sq_ranks_track_true_neighbors(spark, sf_dir):
    """A planted near-duplicate must come back at rank 1 for its twin
    through the full bounds→encode→probe→rank chain."""
    from pyspark.sql import functions as F

    from kg.ops import ivf_sq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    twin = emb.filter(F.col("vec_id") == 0).select(
        F.lit(1000000).cast("long").alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.01) * x).alias("v"),
    )
    corpus = emb.unionByName(twin)
    centroids = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("v").alias("cv"),
    )
    queries = corpus.filter(F.col("vec_id") == 1000000)
    top = ivf_sq_topk(
        queries, corpus, centroids, "vec_id", "vec_id", "v",
        dim=64, k=1, nprobe=2,
    ).first()
    assert top["neighbor_id"] == 0


# ------------------------------------------------------------- knn graph
def test_knn_graph_cluster_neighbors(spark):
    """Three tight clusters around orthogonal axes: every vector's k=3
    neighbors are exactly its cluster peers (cross-cluster cosine ≈ 0,
    in-cluster ≈ 1; near-identical vectors share every LSH band)."""
    import pytest

    from kg.ops import knn_graph

    rows = []
    for c in range(3):
        for j in range(4):
            v = [0.0] * 8
            v[c] = 1.0
            v[(c + 3) % 8] = 0.001 * (j + 1)  # tiny per-member wiggle
            rows.append((c * 10 + j, v))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = knn_graph(emb, "vec_id", "v", dim=8, k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["vec_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine"])
        )
    assert set(got) == {c * 10 + j for c in range(3) for j in range(4)}
    for vid, nbrs in got.items():
        nbrs.sort()
        cluster = vid // 10
        assert {n for _, n, _ in nbrs} == {
            cluster * 10 + j for j in range(4) if cluster * 10 + j != vid
        }, vid
        assert [rk for rk, _, _ in nbrs] == [1, 2, 3]
        cosines = [c for _, _, c in nbrs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(c > 0.999 for c in cosines)
    with pytest.raises(ValueError):
        knn_graph(emb, "vec_id", "v", dim=8, k=0)


def test_knn_graph_matches_brute_force_within_candidates(spark, sf_dir):
    """On the planted-twin corpus, every reported (src, neighbor, rank)
    ranks candidates by exact cosine: the rank-1 neighbor of each twin
    is its original (cosine ≈ 0.99 ≫ any natural pair ~0.6)."""
    from kg.ops import knn_graph

    aug = _planted_near_dups(spark, sf_dir, n_twins=20).localCheckpoint()
    out = knn_graph(aug, "vec_id", "v", dim=64, k=1)
    top1 = {r["vec_id"]: r["neighbor_id"] for r in out.collect()}
    hits = sum(1 for t in range(20) if top1.get(100000 + t) == t)
    assert hits >= 18  # LSH recall on near-identical pairs


# ---------------------------------------------------------------------------
# edit-distance (Levenshtein) fuzzy dedup
# ---------------------------------------------------------------------------
_ED_BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _ed_corpus(spark):
    return spark.createDataFrame(
        [
            (1, _ED_BASE),
            (2, _ED_BASE.replace("epsilon", "epsilonx")),  # 1 insert
            (3, "totally unrelated words about something else entirely"),
        ],
        ["doc_id", "text"],
    )


def test_edit_distance_hand_pair(spark):
    from kg.ops import edit_distance_duplicates

    got = edit_distance_duplicates(
        _ed_corpus(spark), "doc_id", "text", max_dist=16, portable=True
    ).collect()
    assert len(got) == 1
    r = got[0]
    ln = max(len(_ED_BASE) + 1, len(_ED_BASE))
    assert (r["a"], r["b"], r["dist"]) == ("1", "2", 1)
    assert r["sim"] == round(1.0 - 1.0 / ln, 6)


def test_edit_distance_max_dist_zero_drops_near_pair(spark):
    from kg.ops import edit_distance_duplicates

    got = edit_distance_duplicates(
        _ed_corpus(spark), "doc_id", "text", max_dist=0, portable=True
    ).collect()
    assert got == []


def test_edit_distance_validates(spark):
    import pytest

    from kg.ops import edit_distance_duplicates

    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_duplicates(
            _ed_corpus(spark), "doc_id", "text", max_dist=-1
        )


# ---------------------------------------------------------------------------
# overlap-coefficient (containment) dedup
# ---------------------------------------------------------------------------
def test_overlap_catches_quote_inclusion(spark):
    """Doc 2 = doc 1 quoted whole plus a tail: overlap is exactly 1.0
    while jaccard sits well below it — the asymmetric signal.  (The
    tail is kept short enough that the pair's jaccard still collides a
    band: LSH recall tracks jaccard, the documented caveat.)"""
    from kg.ops import overlap_duplicates

    quoted = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, quoted),
            (2, quoted + " with extra tail"),
            (3, "completely different content about other things"),
        ],
        ["doc_id", "text"],
    )
    got = overlap_duplicates(
        docs, "doc_id", "text", threshold=0.9, portable=True
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["a"], r["b"], r["overlap"]) == ("1", "2", 1.0)
    assert r["jaccard"] < 0.7  # a 0.7-jaccard dedup would MISS this pair


def test_overlap_empty_shingles_score_zero(spark):
    from kg.ops import overlap_duplicates

    docs = spark.createDataFrame(
        [(1, "!!! ???"), (2, "!!! ???")], ["doc_id", "text"]
    )
    got = overlap_duplicates(
        docs, "doc_id", "text", threshold=0.1, portable=True
    ).collect()
    assert got == []


# ---------------------------------------------------------------------------
# semantic (SemDeDup)
# ---------------------------------------------------------------------------
def test_semantic_dedup_drops_lower_id_witnessed_dups(spark):
    """Two planted near-dup pairs land in opposite half-spaces; in each
    pair the higher id drops and its lower-id witness survives; the
    unrelated orthogonal vector survives."""
    from kg.ops import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]), (5, [-0.999, -0.02, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    got = {
        r["vid"]: r["kept"]
        for r in semantic_dedup(
            df, "vid", "v", k=2, iters=1, threshold_fp=990_000
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: True, 5: False}


def test_semantic_dedup_cell_cap_exempts_degenerate_cells(spark):
    """A cell over max_cell contributes no pairs: everyone survives."""
    from kg.ops import semantic_dedup

    rows = [(i, [1.0, 0.001 * i]) for i in range(6)]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    out = semantic_dedup(df, "vid", "v", k=1, iters=1, max_cell=3)
    assert all(r["kept"] for r in out.collect())
    capped = semantic_dedup(df, "vid", "v", k=1, iters=1, max_cell=10)
    assert sum(not r["kept"] for r in capped.collect()) == 5  # 0 survives


def test_semantic_dedup_cross_cell_dups_are_not_paired(spark):
    """Near-identical vectors split across cells never pair — the
    SemDeDup trade-off is per-cell locality, not global recall."""
    from kg.ops import semantic_dedup

    rows = [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.9999, 0.001]),
            (4, [-0.9999, -0.001])]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    out = {r["vid"]: (r["cid"], r["kept"])
           for r in semantic_dedup(df, "vid", "v", k=2, iters=1).collect()}
    # 1,3 share a cell (3 drops); 2,4 share the other (4 drops)
    assert out[3][1] is False and out[4][1] is False
    assert out[1][1] is True and out[2][1] is True
    assert out[1][0] != out[2][0]


def test_semantic_dedup_validates(spark):
    from kg.ops import semantic_dedup

    df = spark.createDataFrame([(1, [1.0])], "vid long, v array<double>")
    import pytest as _pt

    with _pt.raises(ValueError, match="k must"):
        semantic_dedup(df, "vid", "v", k=0)
    with _pt.raises(ValueError, match="threshold_fp"):
        semantic_dedup(df, "vid", "v", k=1, threshold_fp=0)
    with _pt.raises(ValueError, match="max_cell"):
        semantic_dedup(df, "vid", "v", k=1, max_cell=0)
