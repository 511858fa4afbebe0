"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB: every variant avoids the O(n²) all-pairs trap —
exact dedup is one hash-shuffle; MinHash/SimHash block first and only
score within buckets; embedding near-dup goes through hyperplane-LSH
buckets (kg.ops.similarity).  The only Python is the SimHash bit-fold
(vectorized, Arrow-batched).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from kg.ops.minhash import minhash_candidate_pairs
from kg.ops.text import tokens_col


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------
def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct content hash: keeper id + duplicate count.
    Single hash-partitioned aggregation; no join, no Python."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def paragraph_dedup(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Corpus-level exact PARAGRAPH dedup (the span-granular cousin of
    whole-document dedup, after Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better", restricted to exact paragraph
    granularity so it stays deterministic and SQL-twinnable): every
    occurrence of a (trimmed, non-empty) line-delimited paragraph except
    the corpus-order first — ordered by (id, paragraph index) — is
    removed, and each document is reassembled from its kept paragraphs.

    Returns (id, n_paras, n_kept, text_clean); n_kept = 0 and
    text_clean = '' when every paragraph was a later duplicate.

    Scale shape: posexplode → ONE hash aggregation on md5(paragraph)
    (map-side partial combine collapses a boilerplate paragraph repeated
    10^9 times to one row per map partition — this is why the first
    occurrence comes from groupBy-min and NOT a row_number window, whose
    sort would ship every occurrence of the hot key to one reducer) →
    join back on the hash (AQE skew-join splits the hot probe side) →
    per-doc reassembly via array_sort(collect_list(struct)) so the
    nondeterministic collect order cannot leak into the output.  All
    JVM; md5 keys so the oracle computes identical hashes."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_x"))
    paras = F.filter(
        F.transform(F.split(F.col("_x"), r"\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    d = base.select("id", paras.alias("_p"))
    occ = d.select("id", F.posexplode("_p").alias("idx", "para")).withColumn(
        "h", F.md5("para")
    )
    first = occ.groupBy("h").agg(
        F.min(F.struct("id", "idx")).alias("_f")
    )
    kept = (
        occ.join(first, "h")
        .where(
            (F.col("id") == F.col("_f.id")) & (F.col("idx") == F.col("_f.idx"))
        )
        .select("id", "idx", "para")
    )
    clean = kept.groupBy("id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s.para,
            ),
            "\n",
        ).alias("text_clean"),
    )
    return (
        d.select("id", F.size("_p").alias("n_paras"))
        .join(clean, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_paras",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------
def ngrams_of_tokens(toks: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles from a token-array column that is
    BOUND AS AN ATTRIBUTE (a column produced by a previous projection).
    The ``gram_at`` element reads reference ``toks`` n times per gram —
    on an attribute that is n row-buffer reads; on a raw tokenizer
    expression it would be n regex splits per gram (the repo's
    documented HOF-capture trap), which is why the text-input wrapper
    below exists for un-bound callers."""
    from kg.ops.text import gram_at

    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.when(F.size(toks) == 0, F.array().cast("array<string>"))
        .when(F.size(toks) <= n, F.array(F.concat_ws(" ", toks)))
        .otherwise(F.transform(idx, lambda i: gram_at(toks, i, n)))
    )


def token_ngrams(text: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a document (JVM-side), from the
    raw text column.  Prefer binding ``tokens_col(text)`` in its own
    projection and calling :func:`ngrams_of_tokens` on the attribute —
    this wrapper keeps the tokenizer reference OUT of the per-gram
    lambda (one ``concat_ws(slice(...))`` per gram, each re-reading the
    captured token expression once) for callers that cannot add a
    projection.

    Token-less documents (symbol-only files, scripts whose text has no
    [a-z0-9] runs) get an EMPTY shingle set, not ``[""]``: the un-guarded
    short-doc branch stringifies the empty token array to one empty-string
    shingle, which made every such document a jaccard-1.0 "near-duplicate"
    of every other one — minhash clean mode would then silently delete
    all but one of them.  No shingles → no signature → never blocked."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.when(F.size(toks) == 0, F.array().cast("array<string>"))
        .when(F.size(toks) <= n, F.array(F.concat_ws(" ", toks)))
        .otherwise(
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
            )
        )
    )


def ngram_jaccard_pairs(
    pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Score given candidate (a,b) pairs with word-n-gram Jaccard."""
    sh = docs.select(
        F.col(id_col), token_ngrams(F.col(text_col), n).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            # token-less docs carry EMPTY shingle sets (see token_ngrams):
            # a pair of two such docs has union size 0 — no n-gram
            # evidence either way, scored 0.0 (ANSI would raise on the
            # bare 0/0 integer division)
            F.when(
                F.size(F.array_union("sh_a", "sh_b")) == 0, F.lit(0.0)
            )
            .otherwise(
                F.round(
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b")),
                    6,
                )
            )
            .alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup
# ---------------------------------------------------------------------------
def minhash_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    perms: int = 64,
    bands: int = 16,
    ngram: int = 3,
    portable: bool = False,
) -> DataFrame:
    """shingle → minhash → band → bucket-join → Jaccard filter.
    Returns (a, b, jaccard) near-duplicate pairs above threshold.

    ``portable=True`` switches the base hash to md5 and keeps band keys
    engine-neutral so the WHOLE operator has a DuckDB twin (see
    kg.ops.minhash.md5_base); default stays xxhash64 — the fast path.

    Plan shape: the full-corpus pass computes shingles only
    TRANSIENTLY inside the signature projection (hashed in-row, never
    materialized — the pre-r6 shape checkpointed every document's
    shingle-string array just so the score join could probe it, and
    serializing that corpus-sized string payload dominated the query);
    the exact-Jaccard re-rank then re-shingles ONLY the documents that
    appear in a candidate pair (semi-join first — candidates are a
    vanishing fraction of the corpus whenever dedup is worth running,
    and at 100 TB re-reading the candidate slice beats materializing
    the corpus's shingle arrays by orders of magnitude)."""
    from kg.hints import broadcast_if_small, spread_to_slots
    from kg.ops.minhash import md5_base, xxhash64_base

    base = spread_to_slots(df).select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(text_col).alias("_txt"),
    )
    cands = minhash_candidate_pairs(
        base.select(id_col, tokens_col(F.col("_txt")).alias("_t")).select(
            id_col, ngrams_of_tokens(F.col("_t"), ngram).alias("sh")
        ),
        id_col=id_col, shingles_col="sh", perms=perms, bands=bands,
        base_hash=md5_base if portable else xxhash64_base,
        portable_keys=portable,
    ).localCheckpoint()  # consumed 3× (both score sides' id scope + the
    # score join itself); checkpoint, not persist: blocks are GC-freed,
    # a persist here would leak in long-lived sessions
    n_cands = cands.count()
    cand_ids = (
        cands.select(F.explode(F.array("a", "b")).alias(id_col)).distinct()
    )
    # pair-count evidence the checkpoint already paid for gates the
    # semi-join broadcast; a pathological pair explosion degrades to the
    # shuffle semi-join instead of an OOM
    cand_ids = broadcast_if_small(
        cand_ids, row_count=2 * max(n_cands, 1), bytes_per_row=48
    )
    sh = (
        base.join(cand_ids, id_col, "left_semi")
        .select(id_col, tokens_col(F.col("_txt")).alias("_t"))
        .select(id_col, ngrams_of_tokens(F.col("_t"), ngram).alias("sh"))
        .localCheckpoint()
    )  # candidate-doc shingles only; consumed twice
    a = sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "a")
        .join(b, "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
# peak transient of the bit-fold is CHUNK×64 int32 (~64 MB at 256k): the
# (T, 64) bit matrix is built per chunk, never for a whole Arrow batch —
# 10k long documents per batch would otherwise push each of the parallel
# python workers to multi-GB allocations
_FOLD_CHUNK_TOKENS = 256 * 1024


def _simhash_fold_fn(chunk_tokens: int):
    """Build the Arrow bit-fold (closure so the chunk bound ships to the
    python workers).  Input column ``hashes``: array<long> of per-token
    xxhash64 values (computed JVM-side — NO per-token Python anywhere;
    the pre-r2 version ran a pure-Python FNV loop per token)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        shifts = np.arange(64, dtype=np.uint64)

        def fold(rows: list, lens: "np.ndarray") -> "np.ndarray":
            flat = np.concatenate(rows).view(np.uint64)
            # (T, 64) bit matrix → per-row segment sums via reduceat
            bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            starts = np.zeros(len(rows), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sums = np.add.reduceat(bits, starts, axis=0)
            votes = 2 * sums - lens[:, None]  # +1/-1 fold
            simbits = (votes > 0).astype(np.uint64)
            packed = np.zeros(len(rows), dtype=np.uint64)
            for b in range(64):
                packed |= simbits[:, b] << np.uint64(b)
            return packed

        for pdf in batches:
            n = len(pdf)
            packed = np.zeros(n, dtype=np.uint64)
            if n:
                # NULL text → NULL hashes array: fold as empty so the
                # signature is 0, exactly the JVM twin's explode_outer
                # path (count 0 → all votes lose → 0)
                rows = [
                    np.asarray(h if h is not None else [], dtype=np.int64)
                    for h in pdf["hashes"]
                ]
                lens = np.array([len(r) for r in rows], dtype=np.int64)
                nz = np.flatnonzero(lens)
                # chunk on cumulative token count so peak memory is
                # bounded independent of document length or batch size
                lo = 0
                while lo < len(nz):
                    hi, tok = lo, 0
                    while hi < len(nz) and (
                        tok == 0 or tok + lens[nz[hi]] <= chunk_tokens
                    ):
                        tok += lens[nz[hi]]
                        hi += 1
                    idx = nz[lo:hi]
                    packed[idx] = fold([rows[i] for i in idx], lens[idx])
                    lo = hi
            yield pd.DataFrame(
                {"id": pdf["id"], "simhash": packed.view(np.int64)}
            )

    return run


def simhash_col(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = _FOLD_CHUNK_TOKENS,
    portable: bool = False,
) -> DataFrame:
    """→ (id, simhash long).  JVM token hashing (``xxhash64`` inside
    ``F.transform``), numpy bit-fold in Python over bounded-memory Arrow
    chunks.

    A/B vs the zero-Python ``simhash_col_jvm`` fold (best-of-4
    interleaved, sf0.1 documents, 16 slots): arrow 0.70 s, jvm 1.52 s —
    the 64-wide explode + 65-column aggregate costs more than one
    array<long> Arrow crossing, so the Arrow fold stays the default;
    the JVM twin is kept and equivalence-tested bit-for-bit.

    ``portable=True`` hashes tokens with the top-60-bit md5 instead of
    xxhash64 — DuckDB computes the identical value, so the portable
    signature (bits 60-63 always 0) has a FULL SQL oracle."""
    from kg.hints import spread_to_slots

    if portable:
        from kg.ops.minhash import md5_60 as tok_hash
    else:
        def tok_hash(t):
            return F.xxhash64(t)

    toks = spread_to_slots(df).select(
        F.col(id_col).cast("string").alias("id"),
        F.transform(tokens_col(F.col(text_col)), tok_hash).alias("hashes"),
    )
    return toks.mapInPandas(
        _simhash_fold_fn(chunk_tokens), schema="id string, simhash long"
    )


def simhash_col_jvm(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """100% JVM-side simhash (zero Python crossings): explode the
    per-token xxhash64 values and majority-vote each of the 64 bits with
    one conditional-sum aggregate per bit — partial (map-side)
    aggregation reduces every partition to one 65-column row per doc
    before the shuffle, and the whole fold stays inside codegen.

    Slower than the Arrow fold at bench scale (see simhash_col) but kept
    as its independent cross-check and for clusters where python workers
    are unavailable/expensive.  Vote semantics match bit-for-bit: bit b
    set iff 2·Σ bit_b(h) > n_tokens (ties → 0), empty doc → signature 0."""
    one = F.lit(1).cast("long")
    toks = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.explode_outer(
            F.transform(tokens_col(F.col(text_col)), lambda t: F.xxhash64(t))
        ).alias("h"),
    )
    sums = toks.groupBy("id").agg(
        F.count("h").alias("n"),
        *[
            F.sum(
                F.shiftrightunsigned(F.col("h"), b).bitwiseAND(one)
            ).alias(f"s{b}")
            for b in range(64)
        ],
    )
    from functools import reduce

    packed = reduce(
        lambda acc, term: acc.bitwiseOR(term),
        [
            F.when(
                F.col(f"s{b}") * 2 > F.col("n"), F.shiftleft(one, b)
            ).otherwise(F.lit(0).cast("long"))
            for b in range(64)
        ],
    )
    return sums.select("id", packed.alias("simhash"))


def simhash_candidates(
    sim: DataFrame, band_bits: int = 16, max_bucket: int = 1024
) -> DataFrame:
    """Near-dup candidates = docs sharing any 16-bit band of the simhash
    (catches hamming distance ≤ 3 for 4 bands over 64 bits).

    ``max_bucket`` drops degenerate buckets before the self-join: every
    empty/boilerplate document hashes to simhash 0 and shares ALL four
    bands, so one such cluster makes the pair set quadratic in corpus
    size.  Same guard as kg.ops.minhash.minhash_candidate_pairs — a pair
    lost to the cap sat in a bucket with zero selectivity anyway (its
    members are better handled by exact dedup, which such docs hit)."""
    nbands = 64 // band_bits
    bands = sim.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col("simhash"), i * band_bits
                        ).bitwiseAND(F.lit((1 << band_bits) - 1)).alias("key"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    from kg.ops.similarity import cap_buckets

    # consumed 3× (bucket-count cap + both sides of the self-join)
    bands = bands.localCheckpoint()
    bands = cap_buckets(bands, ["band", "key"], max_bucket)
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------
def embedding_near_duplicates(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.9,
    planes: int = 64,
    bands: int = 8,
    max_bucket: int = 1024,
    rerank_engine: str = "arrow",
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold.

    Candidates come from **banded** hyperplane LSH (OR-of-ANDs,
    kg.ops.similarity.banded_lsh_pairs) and are re-ranked with the EXACT
    cosine, so precision is exact and recall ≈ 1-(1-p^r)^bands (r =
    planes/bands, p = 1-θ/π).  An AND-only full-signature join — the
    previous design — has recall p^planes, ~8% at its own default
    threshold; banding is what makes the operator usable.  The self-join
    stays bucket-local (``max_bucket`` guards degenerate buckets), never
    all-pairs: the 100 TB path.

    ``rerank_engine``: the candidate set is quadratic-ish in bucket
    density, so the per-pair interpreted HOF cosine was this operator's
    dominant term at bench scale.  ``"arrow"`` (default) scores with the
    vectorized numpy pass (``_pair_cosine_arrow`` — the JVM fold's exact
    IEEE accumulation sequence; fastest on an uncontended box, where the
    python workers have slack cores); ``"codegen"`` uses the unrolled
    whole-stage-codegen expression
    (``kg.ops.similarity._cosine_unrolled`` — bit-identical on every
    input, zero Python, the better pick when python workers would fight
    a saturated box but it re-Janino-compiles its ~3·dim-term method on
    every fresh plan); ``"expr"`` keeps the original HOF fold as the
    independent cross-check.  Interleaved best-of-3, sf1.0 full query:
    arrow 9.3 s / codegen 11.7 s quiet box, arrow 14.2 s / codegen
    13.0 s under load ≈ 10.

    The candidate pairs deliberately arrive WITHOUT the pair-level
    distinct (``distinct_pairs=False``): a pair surfaces once per
    shared band, but duplicates are 2% of rows here while the dedup
    shuffle cost a third of candidate generation — the exact cosine is
    a deterministic function of the pair, so the duplicates collapse in
    a distinct over the HANDFUL of rows that survive the threshold,
    with bit-identical output."""
    from kg.ops.similarity import (
        _cosine, _cosine_unrolled, _pair_cosine_arrow, banded_lsh_pairs,
    )

    if rerank_engine not in ("codegen", "arrow", "expr"):
        raise ValueError(
            "rerank_engine must be 'codegen', 'arrow' or 'expr', "
            f"got {rerank_engine!r}"
        )
    cand = banded_lsh_pairs(
        emb, id_col, vec_col, dim, planes=planes, bands=bands,
        max_bucket=max_bucket, distinct_pairs=False,
    )
    # The candidate set is the corpus-density-quadratic side (7.4M pairs
    # at the sf1.0 bench) while the vector table is corpus-LINEAR: left
    # unhinted, both attach joins ran sort-merge and shuffled every
    # candidate pair twice — the second time dragging a dim×8-byte
    # vector per row (guide §8: decisions should move to the payload,
    # not the payload to the decisions).  Broadcast the dim sides at the
    # same 4× budget the triangle adjacency uses for broadcasts that
    # remove a corpus-sized shuffle (parquet-backed emb ⇒ Catalyst stats
    # are real bytes; a billion-vector corpus blows the gate and keeps
    # the sort-merge shape this code was).
    #
    # When the gate fires, the attach exchanges disappear — and with
    # them the only wide shuffle between the band join and the Python
    # re-rank, so AQE's coalescing then sizes the whole probe+MapInPandas
    # stage off the band join's COMPRESSED pair bytes (~120 MB at sf1.0
    # → 2 partitions) and serializes the expensive Python stage onto two
    # cores (measured 45 s vs 9 s — the repo's compressed-bytes trap in
    # AQE form).  An explicit-count repartition on the pair key pins the
    # stage's width (explicit numPartitions is exempt from AQE
    # coalescing); it costs one narrow 16-byte-pair exchange, which the
    # removed sort-merge attaches paid anyway just to get started.
    # A/B at sf1.0: broadcast+repartition 6.3-7.3 s (interleaved wins
    # all 3 rounds) vs sort-merge attach 9.2 s (stash A/B; frozen bench
    # 9.18 s) vs broadcast WITHOUT the width pin 45 s.
    from kg.hints import DEFAULT_MAX_BYTES, plan_size_bytes

    a = emb.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = emb.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    sz = plan_size_bytes(a)
    if sz is not None and sz <= 4 * DEFAULT_MAX_BYTES:
        slots = emb.sparkSession.sparkContext.defaultParallelism
        cand = cand.repartition(slots, "a", "b")
        a, b = F.broadcast(a), F.broadcast(b)
    paired = cand.join(a, "a").join(b, "b")
    if rerank_engine == "codegen":
        scored = paired.withColumn(
            "cosine", _cosine_unrolled(F.col("va"), F.col("vb"), dim)
        )
    elif rerank_engine == "arrow":
        scored = _pair_cosine_arrow(paired)
    else:
        scored = paired.withColumn(
            "cosine", _cosine(F.col("va"), F.col("vb"))
        )
    return (
        scored
        # threshold on the unrounded value (the DuckDB twin does the same);
        # NaN (zero-norm vectors) compares ABOVE every double in Spark,
        # so it must be excluded explicitly
        .filter((F.col("cosine") >= threshold) & ~F.isnan("cosine"))
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
        # band-duplicate candidates collapse HERE, on the threshold
        # survivors (see docstring) — same rows as deduping before the
        # re-rank, minus the 7M-row distinct shuffle
        .distinct()
    )


# ---------------------------------------------------------------------------
# winnowing (MOSS) near-dup
# ---------------------------------------------------------------------------
def winnow_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
    ngram: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1024,
) -> DataFrame:
    """MOSS-style near-dup pairs: winnowing fingerprints as the blocking
    key (docs sharing ANY fingerprint are candidates), word n-gram
    Jaccard re-rank above ``threshold``.

    Complements the MinHash path with a different guarantee: MinHash
    recall is probabilistic in overall set similarity, while winnowing
    DETERMINISTICALLY catches any verbatim token run of length
    ≥ window+k-1 — the plagiarism/boilerplate detection contract — even
    between documents that are otherwise dissimilar.  ``cap_buckets``
    guards ubiquitous-fingerprint boilerplate, same 100 TB posture as
    every other blocking join in the library; fingerprints use the
    portable md5 hash, so the WHOLE operator has a DuckDB twin.

    Like :func:`minhash_duplicates`, the Jaccard re-rank re-shingles
    ONLY documents that appear in a candidate pair (semi-join first):
    the pre-r6 shape checkpointed every document's shingle-string
    array, and serializing that corpus-sized payload cost more than
    the whole candidate join."""
    from kg.hints import broadcast_if_small, spread_to_slots
    from kg.ops.similarity import cap_buckets
    from kg.ops.text import winnow_fingerprints

    d = spread_to_slots(df)
    fps = winnow_fingerprints(
        d, id_col, text_col, k=k, window=window
    ).localCheckpoint()  # consumed by the cap count + both join sides
    fps = cap_buckets(fps, ["fingerprint"], max_bucket)
    x, y = fps.alias("x"), fps.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.fingerprint") == F.col("y.fingerprint"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .distinct()
        .localCheckpoint()  # consumed 3×: id scope + the score join
    )
    n_cands = cands.count()
    cand_ids = (
        cands.select(F.explode(F.array("a", "b")).alias(id_col)).distinct()
    )
    cand_ids = broadcast_if_small(
        cand_ids, row_count=2 * max(n_cands, 1), bytes_per_row=48
    )
    sh = (
        d.join(cand_ids, id_col, "left_semi")
        .select(F.col(id_col), tokens_col(F.col(text_col)).alias("_t"))
        .select(F.col(id_col), ngrams_of_tokens(F.col("_t"), ngram).alias("sh"))
        .localCheckpoint()
    )  # candidate-doc shingles only; consumed twice
    a = sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "a")
        .join(b, "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def edit_distance_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 16,
    perms: int = 64,
    bands: int = 16,
    ngram: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Character-level near-dup pairs: MinHash-LSH candidate blocking,
    then an EXACT Levenshtein re-rank → ``(a, b, dist, sim)`` for pairs
    within ``max_dist`` edits (``sim = 1 − dist/max(len_a, len_b)``,
    6dp).  The edit-distance tier catches what set-based Jaccard
    can't distinguish: small in-place mutations (typo reposts,
    template fills, OCR shifts) where ORDER matters, the classic
    fuzzy-dedup complement to shingle overlap.

    Cost discipline (100 TB): Levenshtein is O(len·max_dist) per pair
    (Spark's banded DP via the threshold argument) and runs ONLY on
    LSH-blocked candidates that survive the exact length prefilter
    ``|len_a − len_b| ≤ max_dist`` (a lower bound on the distance, so
    the prefilter is lossless) — never corpus-quadratic, never full-DP
    on a hopeless pair.  Everything is JVM expressions; zero Python.

    ``portable=True`` switches the blocking to the md5 base hash with
    raw band keys (the :func:`minhash_duplicates` contract) so the
    WHOLE operator — blocking, prefilter, distance — has a DuckDB twin
    (both engines implement unit-cost Levenshtein).
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    from kg.hints import spread_to_slots
    from kg.ops.minhash import md5_base, xxhash64_base

    base = spread_to_slots(df).select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(text_col).alias("_txt"),
    )
    # shingles live only TRANSIENTLY inside the signature projection
    # (the minhash_duplicates plan shape); the score sides re-read the
    # raw text column — unlike the shingle-array sides this is a plain
    # pruned scan, so no corpus-sized derived payload is ever
    # checkpointed
    cands = minhash_candidate_pairs(
        base.select(id_col, tokens_col(F.col("_txt")).alias("_t")).select(
            id_col, ngrams_of_tokens(F.col("_t"), ngram).alias("sh")
        ),
        id_col=id_col, shingles_col="sh", perms=perms, bands=bands,
        base_hash=md5_base if portable else xxhash64_base,
        portable_keys=portable,
    )
    a = base.select(F.col(id_col).alias("a"), F.col("_txt").alias("_ta"))
    b = base.select(F.col(id_col).alias("b"), F.col("_txt").alias("_tb"))
    scored = (
        cands.join(a, "a")
        .join(b, "b")
        .filter(
            F.abs(F.length("_ta") - F.length("_tb")) <= F.lit(max_dist)
        )
        .select(
            "a",
            "b",
            F.levenshtein("_ta", "_tb", max_dist).alias("dist"),
            F.greatest(
                F.length("_ta"), F.length("_tb"), F.lit(1)
            ).alias("_len"),
        )
        # banded DP returns -1 when the true distance exceeds max_dist
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
    return scored.select(
        "a",
        "b",
        "dist",
        F.round(
            F.lit(1.0) - F.col("dist").cast("double") / F.col("_len"), 6
        ).alias("sim"),
    )


def overlap_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    perms: int = 64,
    bands: int = 16,
    ngram: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Containment near-dup pairs → ``(a, b, overlap, jaccard)``:
    MinHash-LSH candidates scored with the Szymkiewicz–Simpson overlap
    coefficient ``|A∩B| / min(|A|, |B|)`` over word n-gram shingle
    sets (Broder's containment, symmetrized by taking the smaller
    set as denominator).  This is the ASYMMETRIC-duplication detector
    Jaccard structurally misses: a short document quoted whole inside
    a much longer one has overlap 1.0 but Jaccard ≈ |A|/|B| → 0, so a
    Jaccard-thresholded dedup keeps both.  Jaccard rides along for
    triage (low jaccard + high overlap ⇒ subset, not twin).

    Same blocking, bucket cap, id ordering, empty-shingle-set guard
    and ``portable`` contract as :func:`minhash_duplicates` (with
    ``portable=True`` the WHOLE operator has a DuckDB twin).

    LSH recall caveat, documented for honest use: band collision
    probability tracks JACCARD, so a tiny-doc-inside-huge-doc pair
    (overlap 1, jaccard → 0) may not surface as a candidate; at
    production scale the quote-detection tier combines this scorer
    with a seed-shingle index.  Within a corpus of comparable-length
    documents (the entry's regime) the blocking is the same one the
    jaccard dedup trusts.
    """
    from kg.hints import broadcast_if_small, spread_to_slots
    from kg.ops.minhash import md5_base, xxhash64_base

    base = spread_to_slots(df).select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(text_col).alias("_txt"),
    )
    # same plan shape as minhash_duplicates: shingles are transient
    # inside the signature projection; the overlap re-rank re-shingles
    # only candidate documents (semi-join first)
    cands = minhash_candidate_pairs(
        base.select(id_col, tokens_col(F.col("_txt")).alias("_t")).select(
            id_col, ngrams_of_tokens(F.col("_t"), ngram).alias("sh")
        ),
        id_col=id_col, shingles_col="sh", perms=perms, bands=bands,
        base_hash=md5_base if portable else xxhash64_base,
        portable_keys=portable,
    ).localCheckpoint()  # consumed 3×: id scope + the score join
    n_cands = cands.count()
    cand_ids = (
        cands.select(F.explode(F.array("a", "b")).alias(id_col)).distinct()
    )
    cand_ids = broadcast_if_small(
        cand_ids, row_count=2 * max(n_cands, 1), bytes_per_row=48
    )
    sh = (
        base.join(cand_ids, id_col, "left_semi")
        .select(id_col, tokens_col(F.col("_txt")).alias("_t"))
        .select(id_col, ngrams_of_tokens(F.col("_t"), ngram).alias("sh"))
        .localCheckpoint()
    )  # candidate-doc shingles only; consumed twice
    a = sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    smaller = F.least(F.size("sh_a"), F.size("sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(a, "a")
        .join(b, "b")
        .select(
            "a",
            "b",
            # token-less docs carry empty shingle sets: no evidence,
            # scored 0.0 (the ngram_jaccard_pairs ANSI-safe guard)
            F.when(smaller == 0, F.lit(0.0))
            .otherwise(inter / smaller)
            .alias("_ov"),
            F.when(union == 0, F.lit(0.0))
            .otherwise(F.round(inter / union, 6))
            .alias("jaccard"),
        )
        .filter(F.col("_ov") >= threshold)
        .select("a", "b", F.round("_ov", 6).alias("overlap"), "jaccard")
    )


# ---------------------------------------------------------------------------
# semantic (SemDeDup)
# ---------------------------------------------------------------------------
def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 2,
    threshold_fp: int = 950_000,
    max_cell: int = 4096,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embedding space with the deterministic Lloyd's trainer
    (:func:`kg.ops.kmeans.kmeans_fit`), then within each cluster drop
    every vector that has a LOWER-id near-duplicate (pairwise cosine ≥
    ``threshold_fp`` micro-units) in the same cell.  →
    ``(id_col, cid, kept)`` for every assignable vector — the
    embedding-space tier of the dedup ladder (exact → MinHash → SimHash
    → embedding-LSH → semantic), catching paraphrases and re-encodes
    that share no n-grams at all.

    Keeper rule: a vector survives iff NO smaller-id vector in its cell
    is within the threshold — a closed-form, order-free predicate (every
    drop has an explicit surviving witness; contrast with chain-greedy
    pair dropping, which this library replaced with CC keepers in the
    clean stage — here the per-cell quadratic candidate set makes the
    witness rule exact, no chain ambiguity exists within a cell).

    Plan shape (100 TB): k-means cost is the IVF trainer's (k scales
    with corpus so cells stay bounded); the pairwise stage is an
    equi-join ON THE CELL ID — never a corpus cross join — and cells
    larger than ``max_cell`` are excluded from pairing entirely (their
    members all survive; the ``cap_buckets`` degenerate-bucket rule,
    mirrored in the SQL twin).  Cosines are fixed-pointed
    ``floor(round(cos,6)·10⁶ + ½)`` — the engine-stable integer used by
    the whole kmeans family, so the twin matches bit-for-bit.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 < threshold_fp <= 1_000_000:
        raise ValueError(
            f"threshold_fp must be in (0, 1e6], got {threshold_fp}"
        )
    if max_cell < 1:
        raise ValueError(f"max_cell must be >= 1, got {max_cell}")
    from kg.hints import maybe_broadcast
    from kg.ops.kmeans import FIXED_POINT, kmeans_fit
    from kg.ops.similarity import _cosine, ivf_assign

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    centroids = kmeans_fit(df, id_col, vec_col, k=k, iters=iters)
    asg = ivf_assign(base, "_id", "_v", centroids, nprobe=1)
    # one materialization: the frame feeds both sides of the pair join
    # AND the final report — without it the assignment (and the Lloyd's
    # chain above it) re-executes three times
    withv = (
        asg.join(base, "_id").select("_id", "cid", "_v").localCheckpoint()
    )
    small = withv.join(
        maybe_broadcast(
            withv.groupBy("cid")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_cell)
            .select("cid")
        ),
        "cid",
    )
    a = small.select("cid", F.col("_id").alias("_a"), F.col("_v").alias("_va"))
    b = small.select("cid", F.col("_id").alias("_b"), F.col("_v").alias("_vb"))
    # zero-norm vectors never reach here (ivf_assign drops NaN-cosine
    # rows), but the isnan guard keeps the NaN→long ANSI cast impossible
    # by construction rather than by data
    cos = _cosine(F.col("_va"), F.col("_vb"))
    dropped = (
        a.join(b, "cid")
        .filter(F.col("_a") < F.col("_b"))
        .select("_b", cos.alias("_c"))
        .filter(~F.isnan(F.col("_c")))
        .select(
            "_b",
            F.floor(F.round(F.col("_c"), 6) * FIXED_POINT + F.lit(0.5))
            .cast("long")
            .alias("_cfp"),
        )
        .filter(F.col("_cfp") >= threshold_fp)
        .select("_b")
        .distinct()
    )
    return (
        withv.join(dropped, withv["_id"] == dropped["_b"], "left")
        .select(
            F.col("_id").alias(id_col),
            "cid",
            F.col("_b").isNull().alias("kept"),
        )
    )
