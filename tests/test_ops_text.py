"""Text-analysis operator tests over the driver testdata documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg.ops import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokens_col,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_count_matches_python(spark, sf_dir):
    rows = (
        _docs(spark, sf_dir)
        .select("doc_id", "text", token_count(F.col("text")).alias("n"))
        .limit(50)
        .collect()
    )
    import re

    for r in rows:
        expect = len([t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t])
        assert r.n == expect


def test_fingerprint_invariant_to_whitespace(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("A   b\tc",), ("a b d",)], "text string"
    ).select(doc_fingerprint(F.col("text")).alias("fp"))
    fps = [r.fp for r in df.collect()]
    assert fps[0] == fps[1] != fps[2]


def test_quality_score_bounds(spark, sf_dir):
    scores = (
        _docs(spark, sf_dir)
        .select(quality_score(F.col("text")).alias("q"))
        .agg(F.min("q"), F.max("q"))
        .first()
    )
    assert 0.0 <= scores[0] <= scores[1] <= 1.0


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of it is a",),
            ("der hund und die katze ist das",),
            ("el gato la casa de es los",),
            ("zzz qqq xxx",),
        ],
        "text string",
    ).select(language_id(F.col("text")).alias("lang"))
    assert [r.lang for r in df.collect()] == ["en", "de", "es", "und"]


def test_tokens_drop_empties(spark):
    row = (
        spark.createDataFrame([("  Hello,,, WORLD!  ",)], "text string")
        .select(tokens_col(F.col("text")).alias("t"))
        .first()
    )
    assert row.t == ["hello", "world"]


def test_winnow_fingerprints_guarantee_and_shape(spark):
    """Winnowing guarantee: two documents sharing a token run of length
    ≥ window+k-1 (= 8 at k=5, w=4) share at least one fingerprint; short
    docs (< k tokens) produce none; fingerprints are distinct ascending."""
    from kg.ops import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, "xx yy " + shared + " one two three"),
            (2, "aa bb cc " + shared + " other tail words here"),
            (3, "completely different content with many unrelated tokens"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(df, "doc_id", "text", k=5, window=4)
    rows = out.collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.fingerprint)
    assert set(by_doc[1]) & set(by_doc[2])  # the guarantee
    assert not set(by_doc[1]) & set(by_doc.get(3, []))
    assert 4 not in by_doc  # < k tokens → no fingerprints
    for fps in by_doc.values():
        assert fps == sorted(set(fps))


def test_repetition_stats_hand_docs(spark):
    """Hand-checked Gopher-style repetition signals.

    d1 'x y x y x y': 2-grams [x y]×3 + [y x]×2 → all 5 duplicated
    (ratio 1.0), top 3/5; one line → no line dups.
    d2 'hello\\nworld\\nhello': line 'hello' ×2 of 3 → 2/3; both 2-grams
    unique → dup 0, top 1/2.
    d3 empty and d4 single-token: no grams/lines → all ratios 0.0."""
    from kg.ops import repetition_stats

    df = spark.createDataFrame(
        [
            ("d1", "x y x y x y"),
            ("d2", "hello\nworld\nhello"),
            ("d3", ""),
            ("d4", "one"),
        ],
        "doc_id string, text string",
    )
    got = {
        r.doc_id: (r.dup_line_ratio, r.dup_2gram_ratio, r.top_2gram_ratio)
        for r in repetition_stats(df, "doc_id", "text").collect()
    }
    assert got["d1"] == (0.0, 1.0, 0.6)
    assert got["d2"] == (round(2 / 3, 6), 0.0, 0.5)
    assert got["d3"] == (0.0, 0.0, 0.0)
    assert got["d4"] == (0.0, 0.0, 0.0)
    assert len(got) == 4


def test_redact_pii_hand_doc(spark):
    from kg.ops.text import redact_pii

    text = (
        "mail alice.smith+x@example.co.uk or bob@test.org, "
        "server 10.0.255.7 fallback 192.168.1.1, "
        "acct 12345678 ref 999999 card 4111111111111111"
    )
    docs = spark.createDataFrame([(1, text), (2, "clean text")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    r = rows[1]
    assert r["n_emails"] == 2
    assert r["n_ips"] == 2
    # 999999 is only 6 digits -> NOT redacted
    assert r["n_numbers"] == 2
    assert r["text_redacted"] == (
        "mail <EMAIL> or <EMAIL>, "
        "server <IP> fallback <IP>, "
        "acct <NUM> ref 999999 card <NUM>"
    )
    assert rows[2]["n_emails"] == 0 and rows[2]["text_redacted"] == "clean text"


def test_redact_pii_staging_order(spark):
    from kg.ops.text import redact_pii

    # the digits inside an email / IP belong to those stages: the
    # long-digit pass must not double-count or eat them
    docs = spark.createDataFrame(
        [(1, "u1234567@host.com at 12.34.56.78 then 7654321")],
        ["doc_id", "text"],
    )
    r = redact_pii(docs).first()
    assert (r["n_emails"], r["n_ips"], r["n_numbers"]) == (1, 1, 1)
    assert r["text_redacted"] == "<EMAIL> at <IP> then <NUM>"


def test_gopher_quality_hand_docs(spark):
    """Each Gopher rule exercised by a doc built to trip exactly it."""
    import pytest

    from kg.ops.text import gopher_quality

    docs = spark.createDataFrame(
        [
            # 15 words, all 8 stopwords, mean len 44/15, clean → keep
            (1, "the cat sat with a hat and that dog have fun to be of note"),
            # every line bullet-led (and alpha_frac 6/9) → drop
            (2, "• item one\n• item two\n• item three"),
            # 12 '#' over 3 words → symbol_ratio 4.0 → drop
            (3, "#### #### ####"),
            # both lines ellipsis-terminated → drop
            (4, "to be continued... \nmaybe..."),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in gopher_quality(
            docs, min_words=5, min_mean_word_len=2.0
        ).collect()
    }
    assert {k: v["keep"] for k, v in got.items()} == {
        1: True, 2: False, 3: False, 4: False,
    }
    d1 = got[1]
    assert d1["n_words"] == 15
    assert d1["mean_word_len"] == pytest.approx(round(44 / 15, 6))
    assert d1["n_stop"] == 8 and d1["alpha_frac"] == 1.0
    assert got[2]["bullet_frac"] == 1.0
    assert got[3]["symbol_ratio"] == 4.0
    assert got[4]["ellipsis_frac"] == 1.0


def test_gopher_quality_vertical_tab_is_a_separator(spark):
    """The word split uses an explicit whitespace class because Java \\s
    includes \\x0B while RE2's does not — the class must split on it."""
    from kg.ops.text import gopher_quality

    docs = spark.createDataFrame([(1, "aa\x0bbb cc")], ["doc_id", "text"])
    assert gopher_quality(docs).first()["n_words"] == 3


def test_bpe_token_count_hand_pieces(spark):
    """GPT-2 pre-tokenizer pieces counted by hand: space-attached
    letter/digit/punct runs; contractions split (simplified pattern,
    documented); pure whitespace counts zero."""
    from kg.ops.text import bpe_token_count

    docs = spark.createDataFrame(
        [
            (1, "hello world 123!"),   # hello | " world" | " 123" | "!"
            (2, "don't"),              # don | ' | t
            (3, ""),                   # nothing
            (4, "你好 世界"),           # 你好 | " 世界"
            (5, "   "),                # whitespace only
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    assert got == {1: 4, 2: 3, 3: 0, 4: 2, 5: 0}


# --------------------------------------------------------- vocab coverage
def test_vocab_coverage_hand_curve(spark):
    """Corpus 'a a a b b c': ranks by count desc then token asc, with
    exact cumulative fractions of the WHOLE corpus."""
    import pytest

    from kg.ops import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], ["doc_id", "text"]
    )
    got = [
        (r["rank"], r["token"], r["n"], r["cum_frac"])
        for r in sorted(
            vocab_coverage(df).collect(), key=lambda r: r["rank"]
        )
    ]
    assert got == [
        (1, "a", 3, 0.5),
        (2, "b", 2, round(5 / 6, 6)),
        (3, "c", 1, 1.0),
    ]
    with pytest.raises(ValueError):
        vocab_coverage(df, top_v=0)


def test_vocab_coverage_top_v_truncates_but_total_is_global(spark):
    """top_v=1 returns only the head token, yet its cum_frac is still a
    fraction of ALL occurrences (tail included) — and count ties break
    token-ascending."""
    from kg.ops import vocab_coverage

    df = spark.createDataFrame(
        [(1, "z y z y x")], ["doc_id", "text"]
    )
    got = vocab_coverage(df, top_v=1).collect()
    assert [(r["rank"], r["token"], r["n"], r["cum_frac"]) for r in got] == [
        (1, "y", 2, 0.4)
    ]


# ------------------------------------------------------------ bigram LM
def test_bigram_next_tokens_hand_counts(spark):
    """'a b a b a c' + 'a b': bigrams ab,ba,ab,ba,ac + ab → counts
    ab=3, ba=2, ac=1; P(·|a) over total 4 includes the pruned tail."""
    import pytest

    from kg.ops import bigram_next_tokens

    df = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "a b")], ["doc_id", "text"]
    )
    got = {
        (r["token"], r["next_token"]): (r["n"], r["p_next"], r["rank"])
        for r in bigram_next_tokens(df, k=3).collect()
    }
    assert got == {
        ("a", "b"): (3, 0.75, 1),
        ("a", "c"): (1, 0.25, 2),
        ("b", "a"): (2, 1.0, 1),
    }
    # min_count prunes the pair but NOT its mass in the denominator
    pruned = {
        (r["token"], r["next_token"]): (r["n"], r["p_next"], r["rank"])
        for r in bigram_next_tokens(df, k=3, min_count=2).collect()
    }
    assert pruned == {
        ("a", "b"): (3, 0.75, 1),
        ("b", "a"): (2, 1.0, 1),
    }
    with pytest.raises(ValueError):
        bigram_next_tokens(df, k=0)
    with pytest.raises(ValueError):
        bigram_next_tokens(df, min_count=0)


def test_bigram_next_tokens_no_cross_doc_and_k_cap(spark):
    """Bigrams never span documents; k=1 keeps only the plurality
    successor with token-asc tie-break."""
    from kg.ops import bigram_next_tokens

    df = spark.createDataFrame(
        [(1, "x y"), (2, "y z"), (3, "x w"), (4, "x")], ["doc_id", "text"]
    )
    got = {
        (r["token"], r["next_token"]): r["rank"]
        for r in bigram_next_tokens(df, k=1).collect()
    }
    # x→{y,w} tie at 1 each → 'w' wins asc; no (y,x) or (w,?) bigrams
    assert got == {("x", "w"): 1, ("y", "z"): 1}


# ---------------------------------------------------------------------------
# token_entropy
# ---------------------------------------------------------------------------
def test_token_entropy_hand_check(spark):
    """en: {a:2, b:1}, T=3 → H_fp = (2·⌊1e6·ln(3/2)⌋ + ⌊1e6·ln 3⌋) div 3;
    de: single token → entropy 0, ttr 1."""
    import math

    from kg.ops import token_entropy

    docs = spark.createDataFrame(
        [(1, "a a b", "en"), (2, "c", "de")], ["doc_id", "text", "lang"]
    )
    got = {
        r["lang"]: (r["n_tokens"], r["n_types"], r["ttr"], r["entropy_fp"])
        for r in token_entropy(docs).collect()
    }
    t_a = math.floor(1e6 * math.log(3 / 2))
    t_b = math.floor(1e6 * math.log(3))
    assert got == {
        "en": (3, 2, round(2 / 3, 6), (2 * t_a + t_b) // 3),
        "de": (1, 1, 1.0, 0),
    }


def test_token_entropy_uniform_beats_skewed(spark):
    """4 uniform tokens carry ~ln4 nats; 4 copies of one token carry 0."""
    from kg.ops import token_entropy

    docs = spark.createDataFrame(
        [(1, "a b c d", "u"), (2, "a a a a", "s")],
        ["doc_id", "text", "lang"],
    )
    got = {r["lang"]: r["entropy_fp"] for r in token_entropy(docs).collect()}
    assert got["s"] == 0
    assert abs(got["u"] - 1386294) <= 4  # 1e6·ln 4


# ---------------------------------------------------------------------------
# bigram_surprisal
# ---------------------------------------------------------------------------
def test_bigram_surprisal_hand_check(spark):
    """Corpus: d1 = 'a b a b', d2 = 'a b c', d3 = 'x'.
    Model: c(a,·)=3 with (a,b)=3 → -lnP(b|a)=0;
    (b,a)=1 of c(b,·)=2 → ln2; (b,c)=1 of 2 → ln2.
    d1 bigrams [ab, ba, ab] → avg = ln2/3; d2 [ab, bc] → ln2/2;
    d3 has no bigram → (0, 0)."""
    import math

    from kg.ops import bigram_surprisal

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nats_fp"])
        for r in bigram_surprisal(docs).collect()
    }
    ln2 = math.floor(1e6 * math.log(2))
    assert got == {
        1: (3, ln2 // 3),
        2: (2, ln2 // 2),
        3: (0, 0),
    }


def test_bigram_surprisal_template_scores_lower(spark):
    """A document repeating the corpus-dominant bigram scores lower
    surprisal than one made of rare transitions."""
    from kg.ops import bigram_surprisal

    rows = [(i, "the quick brown fox") for i in range(10)]
    rows += [(100, "the quick brown fox"), (101, "fox brown quick the")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["nats_fp"] for r in bigram_surprisal(docs).collect()}
    assert got[100] < got[101]


def test_ngram_diversity_hand_values(spark):
    """Bigrams with repeats in the denominator, corpus-level distinct
    in the numerator; docs shorter than n contribute nothing."""
    from kg.ops.text import ngram_diversity

    rows = [
        ("en", "a b a b"),      # bigrams: "a b","b a","a b" -> 3 total
        ("en", "a b"),          # "a b" -> 1 total (dup of above)
        ("en", "x"),            # < 2 tokens -> none
        ("fr", "c d e"),        # "c d","d e" -> 2 total, 2 distinct
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {r["lang"]: r for r in ngram_diversity(df, n=2).collect()}
    assert (got["en"]["ngrams_total"], got["en"]["ngrams_distinct"]) == (4, 2)
    assert got["en"]["distinct_ratio"] == 0.5
    assert (got["fr"]["ngrams_total"], got["fr"]["ngrams_distinct"]) == (2, 2)
    assert got["fr"]["distinct_ratio"] == 1.0
    assert set(got) == {"en", "fr"}  # the bigram-less doc adds no group


def test_ngram_diversity_flags_template_text(spark):
    from kg.ops.text import ngram_diversity

    rows = [("tpl", "click here to win " * 20)] + [
        ("nat", f"unique sentence number {i} with fresh words {i * 7}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {r["lang"]: r["distinct_ratio"]
           for r in ngram_diversity(df, n=2).collect()}
    assert got["tpl"] < 0.1 < got["nat"]


def test_ngram_diversity_validation(spark):
    import pytest as _pt

    from kg.ops.text import ngram_diversity

    df = spark.createDataFrame([("en", "a b")], "lang string, text string")
    with _pt.raises(ValueError, match="n must"):
        ngram_diversity(df, n=0)
    with _pt.raises(ValueError, match="not in frame"):
        ngram_diversity(df, group_col="nope")


def test_token_gini_hand_values(spark):
    """Uniform vocabulary -> 0; hand-checked skewed case via the exact
    rank formula."""
    from kg.ops.text import token_gini

    uniform = spark.createDataFrame(
        [("a b c d",)], "text string"
    )
    row = token_gini(uniform).collect()[0]
    assert (row["n_types"], row["n_tokens"], row["gini"]) == (4, 4, 0.0)

    # freqs ascending: b=1, a=3 -> G = 2*(1*1+2*3)/(2*4) - 3/2 = 0.25
    skewed = spark.createDataFrame([("a a a b",)], "text string")
    row = token_gini(skewed).collect()[0]
    assert (row["n_types"], row["n_tokens"], row["gini"]) == (2, 4, 0.25)


def test_token_gini_spikes_on_template_flood(spark):
    from kg.ops.text import token_gini

    natural = [(f"unique word{i} text{i * 3} body{i * 7}",) for i in range(30)]
    flooded = natural + [("click here to win",)] * 100
    g_nat = token_gini(
        spark.createDataFrame(natural, "text string")
    ).collect()[0]["gini"]
    g_flood = token_gini(
        spark.createDataFrame(flooded, "text string")
    ).collect()[0]["gini"]
    assert g_flood > g_nat + 0.3


def test_token_gini_validates(spark):
    import pytest as _pt

    from kg.ops.text import token_gini

    df = spark.createDataFrame([("a",)], "text string")
    with _pt.raises(ValueError, match="not in frame"):
        token_gini(df, text_col="nope")


def test_vocab_overlap_hand_values(spark):
    from kg.ops.text import vocab_overlap

    rows = [
        ("en", "cat dog bird"),
        ("en", "cat fish"),          # en vocab: cat dog bird fish (4)
        ("de", "cat dog maus"),      # de vocab: cat dog maus (3)
        ("fr", "zebre"),             # fr vocab: zebre (1), disjoint
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {(r["group_a"], r["group_b"]): r for r in vocab_overlap(df).collect()}
    de_en = got[("de", "en")]
    assert (de_en["n_a"], de_en["n_b"], de_en["n_common"]) == (3, 4, 2)
    assert de_en["jaccard"] == 0.4  # 2 / (3+4-2)
    # disjoint pairs produce no row at all (inner join semantics)
    assert set(got) == {("de", "en")}


def test_vocab_overlap_validates(spark):
    import pytest as _pt

    from kg.ops.text import vocab_overlap

    df = spark.createDataFrame([("en", "a")], "lang string, text string")
    with _pt.raises(ValueError, match="not in frame"):
        vocab_overlap(df, group_col="nope")


def test_zipf_slope_python_replica_and_shape(spark):
    """Moments recomputed independently from the same µ-unit ln rule;
    a freq ∝ 1/rank corpus fits slope ≈ −1."""
    import math

    from kg.ops.text import zipf_slope

    # freq ∝ 1/rank over 8 types: token t_i repeated 240//i times
    rows = [(" ".join(f"t{i}" for _ in range(240 // i)),) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "text string")
    row = zipf_slope(df).collect()[0]

    freqs = sorted((240 // i for i in range(1, 9)), reverse=True)
    pts = [
        (math.floor(math.log(r + 1) * 1e6), math.floor(math.log(f) * 1e6))
        for r, f in enumerate(freqs)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    assert row["n_types"] == 8
    assert row["slope"] == round(b, 6)
    assert row["intercept"] == round(a / 1e6, 6)
    assert -1.05 < row["slope"] < -0.95  # Zipf shape recovered


def test_zipf_slope_degenerate_and_validation(spark):
    import pytest as _pt

    from kg.ops.text import zipf_slope

    single = spark.createDataFrame([("hello hello",)], "text string")
    row = zipf_slope(single).collect()[0]
    assert row["n_types"] == 1
    assert row["slope"] is None and row["intercept"] is None
    with _pt.raises(ValueError, match="not in frame"):
        zipf_slope(single, text_col="nope")


def test_winnow_engines_bit_identical(spark):
    """The arrow window-minima engine must reproduce the expr form's
    exploded (id, fingerprint) rows exactly — including documents with
    fewer tokens than k or fewer grams than the window (no rows)."""
    from kg.ops.text import winnow_fingerprints

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "tiny doc"),                       # < k tokens -> no rows
        (4, "a b c d e f g h"),                # just enough for one window
        (5, ""),                               # empty -> no rows
        (6, "x " * 200),                       # repeated token, dup minima
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = winnow_fingerprints(df, "doc_id", "text", k=5, window=4)
    b = winnow_fingerprints(df, "doc_id", "text", k=5, window=4,
                            engine="expr")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() > 0
