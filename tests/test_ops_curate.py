"""Curation-operator tests: decontamination, splits, stratified
sampling, TF-IDF — hand corpora with known answers."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kg.ops.curate import (
    decontaminate,
    split_assign,
    stratified_sample,
    tfidf_topk,
    word_ngrams,
)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


# ---------------------------------------------------------------- ngrams
def test_word_ngrams_shape_and_dedup(spark):
    df = _df(spark, [(1, "a b c a b c a b")], ["doc_id", "text"])
    got = sorted(
        df.select(F.explode(word_ngrams(F.col("text"), 3)).alias("g"))
        .toPandas()["g"]
        .tolist()
    )
    # 6 sliding 3-grams, duplicates collapsed in-array
    assert got == sorted({"a b c", "b c a", "c a b"})


def test_word_ngrams_short_doc_is_empty(spark):
    df = _df(spark, [(1, "only two")], ["doc_id", "text"])
    assert (
        df.select(F.size(word_ngrams(F.col("text"), 3)).alias("n"))
        .first()["n"]
        == 0
    )


# -------------------------------------------------------- decontaminate
def test_decontaminate_flags_13gram_overlap_only(spark):
    bench_text = " ".join(f"w{i}" for i in range(20))
    # doc 1: verbatim 13-token run from the benchmark -> contaminated
    leak = " ".join(f"w{i}" for i in range(13)) + " zzz qqq"
    # doc 2: only a 12-token run -> clean at n=13
    near = " ".join(f"w{i}" for i in range(12)) + " unrelated tail here"
    # doc 3: disjoint vocabulary -> clean
    clean = " ".join(f"x{i}" for i in range(30))
    docs = _df(
        spark, [(1, leak), (2, near), (3, clean)], ["doc_id", "text"]
    )
    bench = _df(spark, [(100, bench_text)], ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(docs, bench, n=13).collect()
    }
    assert set(got) == {1}
    assert got[1] == 1  # exactly one distinct shared 13-gram


def test_decontaminate_counts_distinct_grams(spark):
    bench_text = " ".join(f"w{i}" for i in range(30))
    # 16-token verbatim run shares 16-13+1 = 4 distinct 13-grams
    leak = " ".join(f"w{i}" for i in range(16))
    docs = _df(spark, [(1, leak)], ["doc_id", "text"])
    bench = _df(spark, [(100, bench_text)], ["doc_id", "text"])
    got = decontaminate(docs, bench, n=13).collect()
    assert got[0]["n_hits"] == 4


def test_contamination_score_fraction_and_zeros(spark):
    from kg.ops.curate import contamination_score

    bench_text = " ".join(f"w{i}" for i in range(20))
    # 16-token verbatim run: 4 distinct 13-grams, all hits -> fraction 1
    leak = " ".join(f"w{i}" for i in range(16))
    # 14 tokens, 2 grams, 1 shared (the second gram ends in zzz)
    partial = " ".join(f"w{i}" for i in range(13)) + " zzz"
    clean = " ".join(f"x{i}" for i in range(30))
    short = "too short"
    docs = _df(
        spark,
        [(1, leak), (2, partial), (3, clean), (4, short)],
        ["doc_id", "text"],
    )
    bench = _df(spark, [(100, bench_text)], ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contamination_fp"])
        for r in contamination_score(docs, bench, n=13).collect()
    }
    assert got[1] == (4, 4, 1_000_000)
    assert got[2] == (2, 1, 500_000)
    assert got[3] == (18, 0, 0)
    assert got[4] == (0, 0, 0)  # gram-less doc present with zeros


def test_contamination_score_matches_decontaminate_hits(spark):
    from kg.ops.curate import contamination_score

    bench_text = " ".join(f"w{i}" for i in range(30))
    docs = _df(
        spark,
        [(i, " ".join(f"w{j}" for j in range(i, i + 15))) for i in range(5)],
        ["doc_id", "text"],
    )
    bench = _df(spark, [(100, bench_text)], ["doc_id", "text"])
    flags = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(docs, bench, n=13).collect()
    }
    scores = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_score(docs, bench, n=13).collect()
    }
    assert flags == {k: v for k, v in scores.items() if v > 0}


# --------------------------------------------------------- split_assign
def test_split_assign_deterministic_and_total(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = split_assign(df).select("doc_id", "split", "bucket")
    b = split_assign(df).select("doc_id", "split", "bucket")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # binomial sanity at p=.98/.01/.01 over 2000 draws
    assert counts["train"] > 1900
    assert 0 < counts.get("val", 0) < 100
    assert 0 < counts.get("test", 0) < 100


def test_split_assign_stable_under_corpus_growth(spark):
    small = spark.range(500).withColumnRenamed("id", "doc_id")
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    s = {r["doc_id"]: r["split"] for r in split_assign(small).collect()}
    g = {r["doc_id"]: r["split"] for r in split_assign(big).collect()}
    assert all(g[k] == v for k, v in s.items())


def test_split_assign_rejects_bad_weights(spark):
    import pytest

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        split_assign(df, weights={"train": 0.5, "val": 0.1})


def test_split_assign_rejects_existing_bucket_or_split_column(spark):
    """withColumn would silently clobber a pre-existing bucket/split —
    e.g. the warehouse tables' own ``bucket`` partition column (ADVICE
    r4); the op must fail loudly instead."""
    import pytest

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="bucket"):
        split_assign(df.withColumn("bucket", F.lit(1)))
    with pytest.raises(ValueError, match="split"):
        split_assign(df.withColumn("split", F.lit("x")))


# --------------------------------------------------- stratified_sample
def test_stratified_sample_exact_quotas(spark):
    rows = [(i, "en" if i < 100 else "de") for i in range(130)]
    df = _df(spark, rows, ["doc_id", "lang"])
    got = stratified_sample(df, "lang", fraction=0.1)
    counts = {r["lang"]: r["n"] for r in
              got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": math.ceil(100 * 0.1), "de": math.ceil(30 * 0.1)}


def test_stratified_sample_deterministic(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(200)]
    df = _df(spark, rows, ["doc_id", "lang"])
    a = sorted(r["doc_id"] for r in stratified_sample(df, "lang").collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, "lang").collect())
    assert a == b


def test_stratified_sample_rejects_bad_fraction(spark):
    import pytest

    df = _df(spark, [(1, "en")], ["doc_id", "lang"])
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", fraction=0.0)


# ------------------------------------------------------------- tfidf
def test_tfidf_rare_term_beats_ubiquitous(spark):
    docs = _df(
        spark,
        [
            (1, "common common common rareword"),
            (2, "common filler filler"),
            (3, "common other other"),
        ],
        ["doc_id", "text"],
    )
    top = tfidf_topk(docs, k=1).collect()
    d1 = next(r for r in top if r["doc_id"] == 1)
    # 'common' has tf=3 in doc 1 but df=3 (idf=ln(4/4)+1=1 -> score 3.0);
    # 'rareword' tf=1 df=1 (idf=ln(2)+1 ~ 1.693) -> common still wins on
    # tf -- verify the EXACT smooth-idf arithmetic instead of vibes
    assert d1["token"] == "common"
    assert abs(d1["score"] - 3.0) < 1e-9
    d2 = next(r for r in top if r["doc_id"] == 2)
    assert d2["token"] == "filler"
    exp = 2 * (math.log(4 / 2) + 1)
    assert abs(d2["score"] - round(exp, 6)) < 1e-9


def test_tfidf_k_bound_and_tiebreak(spark):
    docs = _df(spark, [(1, "b a c"), (2, "z z")], ["doc_id", "text"])
    got = tfidf_topk(docs, k=2).collect()
    d1 = [r for r in got if r["doc_id"] == 1]
    assert len(d1) == 2
    # identical scores -> token-asc tie-break
    assert [r["token"] for r in sorted(d1, key=lambda r: r["rank"])] == [
        "a",
        "b",
    ]


# ------------------------------------------------------- pack_sequences
def test_pack_sequences_hand_check(spark):
    # token counts: d1=3, d2=4, d3=2, d4=5 -> offsets 0, 3, 7, 9
    docs = _df(
        spark,
        [
            (1, "a b c"),
            (2, "a b c d"),
            (3, "a b"),
            (4, "a b c d e"),
        ],
        ["doc_id", "text"],
    )
    from kg.ops.curate import pack_sequences

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["first_pack"], r["last_pack"]
        )
        for r in pack_sequences(docs, max_tokens=4).collect()
    }
    assert got == {
        1: (3, 0, 0, 0),     # tokens 0-2 in pack 0
        2: (4, 3, 0, 1),     # tokens 3-6 span packs 0 and 1
        3: (2, 7, 1, 2),     # tokens 7-8 span packs 1 and 2
        4: (5, 9, 2, 3),     # tokens 9-13 span packs 2 and 3
    }


def test_pack_sequences_offsets_are_contiguous(spark):
    # 200 docs with varying sizes across many partitions: offsets must
    # form an exact prefix sum in id order regardless of partitioning
    rows = [(i, " ".join(["tok"] * (i % 7 + 1))) for i in range(200)]
    docs = _df(spark, rows, ["doc_id", "text"]).repartition(13)
    from kg.ops.curate import pack_sequences

    out = sorted(
        pack_sequences(docs, max_tokens=32).collect(),
        key=lambda r: r["doc_id"],
    )
    acc = 0
    for r in out:
        assert r["start_offset"] == acc
        acc += r["n_tokens"]


def test_pack_sequences_zero_token_doc(spark):
    docs = _df(
        spark, [(1, "a b c"), (2, "!!! ..."), (3, "d e")], ["doc_id", "text"]
    )
    from kg.ops.curate import pack_sequences

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["first_pack"], r["last_pack"]
        )
        for r in pack_sequences(docs, max_tokens=2).collect()
    }
    # doc 2 tokenizes to nothing: occupies no stream space, lands at its
    # offset's pack with last_pack == first_pack
    assert got[2] == (0, 3, 1, 1)
    assert got[3] == (2, 3, 1, 2)


def test_pack_sequences_rejects_bad_max_tokens(spark):
    docs = _df(spark, [(1, "a")], ["doc_id", "text"])
    from kg.ops.curate import pack_sequences

    try:
        pack_sequences(docs, max_tokens=0)
        assert False, "expected ValueError"
    except ValueError:
        pass


# ------------------------------------------------------- curate_corpus
def test_curate_corpus_composes(spark):
    """Pins the stage INTERACTIONS, not the stages themselves (each has
    its own unit tests): quality runs before dedup (a filtered doc can't
    be a keeper), dedup runs before decontamination (a contaminated
    keeper's duplicates are NOT resurrected when the keeper is dropped),
    and every survivor gets a split assignment."""
    from kg.ops.curate import curate_corpus

    filler = " ".join(f"word{chr(97 + i)}ish" for i in range(60))  # >500 alpha chars
    bench_run = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliett kilo lima mike"
    )  # 13 tokens, no stopwords
    good = "unique opening line " + filler
    contaminated = bench_run + " " + filler
    docs = _df(
        spark,
        [
            (1, good),
            (2, good),                      # exact dup of 1 -> dedup drops
            (3, contaminated),              # 13-gram hit -> decontaminate drops
            (4, contaminated),              # dup of 3: dropped by DEDUP, must
                                            # not resurrect when 3 is removed
            (5, "the and of is a " * 40),   # stopword soup -> quality drops
            (6, "another survivor text " + filler),
        ],
        ["doc_id", "text"],
    )
    bench = _df(spark, [(100, bench_run + " trailing benchmark prose")],
                ["doc_id", "text"])

    out = curate_corpus(
        docs, benchmark=bench, min_quality=0.2, dedup="exact"
    ).collect()
    got = {r["doc_id"]: r["split"] for r in out}
    assert set(got) == {1, 6}
    assert all(s in ("train", "val", "test") for s in got.values())
    assert all(0 <= r["bucket"] < 1_000_000 for r in out)


def test_curate_corpus_quality_filter_precedes_dedup(spark):
    """A low-quality doc with the LOWEST id must not become the dedup
    keeper for a high-quality twin: the quality gate runs first, so the
    good copy survives even though its id is larger."""
    from kg.ops.curate import curate_corpus

    filler = " ".join(f"word{chr(97 + i)}ish" for i in range(60))
    good = "shared body " + filler
    # doc 0 normalizes to the SAME fingerprint as doc 7 (case/whitespace
    # only) but we make it low quality instead: impossible for identical
    # text — so instead plant a DISTINCT low-quality doc at id 0 and the
    # good pair at 7/8; keeper must be 7 (min id among QUALITY survivors)
    docs = _df(
        spark,
        [(0, "the and of is a " * 40), (7, good), (8, "  " + good.upper() + " ")],
        ["doc_id", "text"],
    )
    out = curate_corpus(docs, min_quality=0.2, dedup="exact").collect()
    assert {r["doc_id"] for r in out} == {7}


# ------------------------------------------------------ corpus_profile
def test_corpus_profile_hand_check(spark):
    from kg.ops.curate import corpus_profile

    docs = _df(
        spark,
        [
            (1, "one two", "a"),
            (2, "ONE  two", "a"),   # same normalized fingerprint as 1
            (3, "three", "a"),
            (4, "x y z w", "b"),
        ],
        ["doc_id", "text", "lang"],
    )
    got = {r["lang"]: r.asDict() for r in corpus_profile(docs).collect()}
    a = got["a"]
    assert a["n_docs"] == 3 and a["n_distinct"] == 2
    assert a["dup_ratio"] == round(1 - 2 / 3, 6)
    assert a["max_tokens"] == 2 and a["avg_tokens"] == round(5 / 3, 6)
    # sorted token counts [1,2,2]: rank (n-1)*q -> p50 at index 1 = 2.0
    assert a["tokens_p50"] == 2.0 and a["tokens_p25"] == 1.5
    b = got["b"]
    assert b["n_docs"] == 1 and b["dup_ratio"] == 0.0
    assert b["tokens_p25"] == b["tokens_p99"] == 4.0


def test_corpus_profile_rejects_bad_quantiles(spark):
    import pytest

    from kg.ops.curate import corpus_profile

    docs = _df(spark, [(1, "t", "a")], ["doc_id", "text", "lang"])
    with pytest.raises(ValueError):
        corpus_profile(docs, quantiles=(1.5,))
    with pytest.raises(ValueError):
        corpus_profile(docs, quantiles=())


# ------------------------------------------------------ weighted_sample
def test_weighted_sample_rate_extremes_and_default(spark):
    from kg.ops.curate import weighted_sample

    docs = _df(
        spark,
        [(i, "t", ["a", "b", "c"][i % 3]) for i in range(300)],
        ["doc_id", "text", "lang"],
    )
    kept = weighted_sample(docs, {"a": 1.0, "b": 0.0}).collect()
    langs = {r["lang"] for r in kept}
    assert langs == {"a"}                      # b rate-0, c absent -> default 0
    assert len(kept) == 100                    # rate 1.0 keeps every 'a'


def test_weighted_sample_binomial_and_growth_stable(spark):
    from kg.ops.curate import weighted_sample

    small = _df(spark, [(i, "t", "a") for i in range(500)],
                ["doc_id", "text", "lang"])
    big = _df(spark, [(i, "t", "a") for i in range(2000)],
              ["doc_id", "text", "lang"])
    rates = {"a": 0.5}
    s = {r["doc_id"] for r in weighted_sample(small, rates).collect()}
    g = {r["doc_id"] for r in weighted_sample(big, rates).collect()}
    # growth-stable: the small corpus's decisions are a restriction
    assert s == {i for i in g if i < 500}
    # binomial sanity: 2000 draws at p=.5
    assert 900 < len(g) < 1100


def test_weighted_sample_rejects_bad_rates(spark):
    import pytest

    from kg.ops.curate import weighted_sample

    docs = _df(spark, [(1, "t", "a")], ["doc_id", "text", "lang"])
    with pytest.raises(ValueError):
        weighted_sample(docs, {"a": 1.5})
    with pytest.raises(ValueError):
        weighted_sample(docs, {"a": 0.5}, default_rate=-0.1)


# ---------------------------------------------------------------- lm score
def test_lm_score_hand_check(spark):
    from kg.ops.curate import lm_score

    # corpus unigram counts: a=3, b=2, c=1, N=6
    docs = _df(
        spark,
        [(1, "a a a b"), (2, "b c"), (3, "")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[2]["n_tokens"] == 2
    # zero-token doc survives with 0.0 (left join + coalesce)
    assert rows[3]["n_tokens"] == 0
    assert rows[3]["bits_per_token"] == 0.0
    bits_b = math.log2(3)  # -log2(2/6)
    bits_c = math.log2(6)  # -log2(1/6)
    assert abs(rows[1]["bits_per_token"] - (3 * 1.0 + bits_b) / 4) < 1e-6
    assert abs(rows[2]["bits_per_token"] - (bits_b + bits_c) / 2) < 1e-6
    # the filter's point: common-token boilerplate scores LOWER than
    # rare-token soup
    assert rows[1]["bits_per_token"] < rows[2]["bits_per_token"]


# ---------------------------------------------------------------- clean lines
def test_clean_lines_hand_doc(spark):
    from kg.ops.curate import clean_lines

    text = "\n".join(
        [
            "this line is long enough and ends well.",   # kept
            "too short.",                                 # < 3 words
            "no terminal punctuation on this line",       # no terminal
            "enable JavaScript to view this content.",    # blocklist
            "We use cookie banners on this site.",        # blocklist
            "function f() { return 1; }",                 # braces
            "",                                           # empty, not counted
            "  another good line survives here!  ",       # kept (trimmed)
        ]
    )
    docs = _df(spark, [(1, text)], ["doc_id", "text"])
    row = clean_lines(docs).first()
    assert row["n_lines"] == 7  # empties dropped before counting
    assert row["n_kept"] == 2
    assert row["text_clean"] == (
        "this line is long enough and ends well.\n"
        "another good line survives here!"
    )


def test_clean_lines_all_dropped_and_params(spark):
    import pytest

    from kg.ops.curate import clean_lines

    docs = _df(spark, [(1, "no punct here\nx."), (2, "")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in clean_lines(docs).collect()}
    assert rows[1]["n_kept"] == 0 and rows[1]["text_clean"] == ""
    assert rows[2]["n_lines"] == 0 and rows[2]["text_clean"] == ""
    # disabling the terminal rule keeps the 3-word unpunctuated line
    relaxed = {
        r["doc_id"]: r
        for r in clean_lines(docs, terminal=()).collect()
    }
    assert relaxed[1]["n_kept"] == 1
    assert relaxed[1]["text_clean"] == "no punct here"
    with pytest.raises(ValueError):
        clean_lines(docs, min_words=-1)


def test_dsir_weights_hand_counts(spark):
    """Hand-derived distributions: raw corpus {alpha:2, beta:2}, target
    {alpha:3} — alpha-docs must score positive (target-like), beta-docs
    negative, with the exact add-one-smoothed log ratio."""
    import pytest

    from kg.ops import dsir_weights

    docs = spark.createDataFrame(
        [(1, "alpha alpha"), (2, "beta beta"), (3, "")],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(9, "alpha alpha alpha")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in dsir_weights(docs, target, buckets=4096).collect()
    }
    lr_a = math.log(4 / 4099) - math.log(3 / 4100)
    lr_b = math.log(1 / 4099) - math.log(3 / 4100)
    assert {k: v[0] for k, v in got.items()} == {1: 2, 2: 2, 3: 0}
    assert got[1][1] == pytest.approx(lr_a, abs=2e-6)
    assert got[2][1] == pytest.approx(lr_b, abs=2e-6)
    assert got[1][1] > 0 > got[2][1]
    assert got[3][1] == 0.0
    with pytest.raises(ValueError):
        dsir_weights(docs, target, buckets=0)


# ---------------------------------------------------------- chunking
def test_chunk_documents_hand_check(spark):
    """10 tokens, window=4, stride=3: starts 0/3/6 kept; 9 dropped
    because the chunk at 6 already reaches the end (tail covered once,
    no redundant fully-contained chunk)."""
    from kg.ops import chunk_documents

    toks = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    df = _df(spark, [(1, toks)], ["doc_id", "text"])
    got = sorted(
        chunk_documents(df, "doc_id", "text", window=4, stride=3)
        .collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [
        (r["chunk_idx"], r["start_tok"], r["n_tok"], r["chunk_text"])
        for r in got
    ] == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_documents_partial_tail_kept(spark):
    """11 tokens, window=4, stride=3: start 9 survives (previous chunk
    stops at token 9, token 10 would be uncovered) with n_tok=2."""
    from kg.ops import chunk_documents

    df = _df(spark, [(1, " ".join(f"t{i}" for i in range(11)))],
             ["doc_id", "text"])
    got = {
        r["start_tok"]: (r["n_tok"], r["chunk_text"])
        for r in chunk_documents(
            df, "doc_id", "text", window=4, stride=3
        ).collect()
    }
    assert set(got) == {0, 3, 6, 9}
    assert got[9] == (2, "t9 t10")


def test_chunk_documents_disjoint_and_short_and_empty(spark):
    """stride == window is plain disjoint blocking with the partial
    tail kept; short docs yield one chunk; empty docs yield none."""
    from kg.ops import chunk_documents

    df = _df(
        spark,
        [(1, " ".join(f"t{i}" for i in range(7))), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    rows = chunk_documents(df, "doc_id", "text", window=3, stride=3)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start_tok"], r["n_tok"])
        for r in rows.collect()
    }
    assert got == {
        (1, 0): (0, 3),
        (1, 1): (3, 3),
        (1, 2): (6, 1),
        (2, 0): (0, 2),
    }


def test_chunk_documents_covers_every_token_once_per_overlap(spark):
    """Property over sizes 1..40 (window=8, stride=5): chunks cover
    [0, n) exactly, consecutive starts differ by stride, every
    non-final chunk is full-width, and no chunk is contained in the
    previous one."""
    from kg.ops import chunk_documents

    rows = [(n, " ".join(f"w{i}" for i in range(n))) for n in range(1, 41)]
    df = _df(spark, rows, ["doc_id", "text"])
    out = chunk_documents(df, "doc_id", "text", window=8, stride=5)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["start_tok"], r["n_tok"])
        )
    for n, chunks in by_doc.items():
        chunks.sort()
        covered = set()
        for s, ln in chunks:
            covered.update(range(s, s + ln))
        assert covered == set(range(n)), n
        starts = [s for s, _ in chunks]
        assert starts == list(range(0, starts[-1] + 1, 5)), n
        for s, ln in chunks[:-1]:
            assert ln == 8, n
        # the final chunk always adds new tokens beyond its predecessor
        if len(chunks) > 1:
            s_last, ln_last = chunks[-1]
            s_prev, ln_prev = chunks[-2]
            assert s_last + ln_last > s_prev + ln_prev, n
    assert set(by_doc) == set(range(1, 41))


def test_chunk_documents_rejects_bad_args(spark):
    import pytest

    from kg.ops import chunk_documents

    df = _df(spark, [(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", window=0, stride=1)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", window=4, stride=0)


# ---------------------------------------------------------------------------
# span_census
# ---------------------------------------------------------------------------
def test_span_census_hand_counts(spark):
    """Three docs share the 4-gram 'a b c d'; two share 'b c d e'.
    Per-doc presence counts once even when a doc repeats the span."""
    from kg.ops import span_census

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e x"),
            (3, "x a b c d a b c d"),  # span repeats inside one doc
            (4, "totally different words here now"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["gram"]: (r["n_docs"])
        for r in span_census(docs, n=4, min_docs=2, top=10).collect()
    }
    assert got["a b c d"] == 3
    assert got["b c d e"] == 2
    assert "totally different words here" not in got  # single-doc span
    # ranks: most-shared first
    rows = sorted(
        span_census(docs, n=4, min_docs=2, top=10).collect(),
        key=lambda r: r["rank"],
    )
    assert rows[0]["gram"] == "a b c d" and rows[0]["rank"] == 1


def test_span_census_top_caps_and_validates(spark):
    import pytest

    from kg.ops import span_census

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    got = span_census(docs, n=3, min_docs=2, top=2).collect()
    assert len(got) == 2
    assert sorted(r["rank"] for r in got) == [1, 2]
    with pytest.raises(ValueError, match="n must"):
        span_census(docs, n=0)
    with pytest.raises(ValueError, match="min_docs"):
        span_census(docs, min_docs=0)
    with pytest.raises(ValueError, match="top"):
        span_census(docs, top=0)


def test_temperature_mix_weights_hand_values(spark):
    """alpha=0.5: weight_g = floor(1e6*sqrt(n_g)) / sum; boost =
    weight / natural share — recomputed independently."""
    import math

    from kg.ops.curate import temperature_mix_weights

    counts = {"en": 16, "de": 4, "fr": 1}
    rows = [(f"d{g}{i}", g) for g, c in counts.items() for i in range(c)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    got = {r["lang"]: r for r in
           temperature_mix_weights(df, "lang", alpha=0.5).collect()}
    dfp = {g: math.floor(math.sqrt(c) * 1_000_000) for g, c in counts.items()}
    tot, n_total = sum(dfp.values()), sum(counts.values())
    for g, c in counts.items():
        w = dfp[g] / tot
        assert got[g]["n_docs"] == c
        assert got[g]["weight"] == round(w, 6)
        assert got[g]["boost"] == round(w / (c / n_total), 6)
    # low-resource fr is boosted above 1, dominant en damped below 1
    assert got["fr"]["boost"] > 1 > got["en"]["boost"]


def test_temperature_mix_alpha_one_is_natural_share(spark):
    from kg.ops.curate import temperature_mix_weights

    df = spark.createDataFrame(
        [("a", "x")] * 3 + [("b", "y")], "doc_id string, lang string"
    )
    got = {r["lang"]: r for r in
           temperature_mix_weights(df, "lang", alpha=1.0).collect()}
    assert got["x"]["boost"] == 1.0 and got["y"]["boost"] == 1.0
    assert got["x"]["weight"] == 0.75


def test_temperature_mix_validation(spark):
    import pytest as _pt

    from kg.ops.curate import temperature_mix_weights

    df = spark.createDataFrame([("a", "x")], "doc_id string, lang string")
    with _pt.raises(ValueError, match="alpha"):
        temperature_mix_weights(df, "lang", alpha=0.3)
    with _pt.raises(ValueError, match="not in frame"):
        temperature_mix_weights(df, "nope")


def test_split_leakage_hand_values(spark):
    """Dup groups spanning splits are counted per ordered pair with
    member-doc counts on each side; same-split dups don't leak."""
    from kg.ops.curate import split_leakage

    rows = [
        # group X: 2 train + 1 test  -> (train, test): 1 group, 2 vs 1
        (1, "same text x", "train"),
        (2, "same text x", "train"),
        (3, "same text x", "test"),
        # group Y: train + val       -> (train, val): 1 group, 1 vs 1
        (4, "same text y", "train"),
        (5, "same text y", "val"),
        # group Z: dup WITHIN train only -> no leakage row
        (6, "same text z", "train"),
        (7, "same text z", "train"),
        # unique doc -> nothing
        (8, "unique text", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    got = {(r["split_a"], r["split_b"]):
           (r["n_groups"], r["n_docs_a"], r["n_docs_b"])
           for r in split_leakage(df).collect()}
    assert got == {
        ("test", "train"): (1, 1, 2),
        ("train", "val"): (1, 1, 1),
    }


def test_split_leakage_clean_corpus_is_empty(spark):
    from kg.ops.curate import split_leakage

    df = spark.createDataFrame(
        [(1, "a", "train"), (2, "b", "test")],
        "doc_id long, text string, split string",
    )
    assert split_leakage(df).count() == 0
    with __import__("pytest").raises(ValueError, match="not in frame"):
        split_leakage(df.drop("split"))
