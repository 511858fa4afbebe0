"""Text-analysis operators over a documents table.

All pure Column expressions (JVM, whole-stage codegen) so each has an
exact ANSI-SQL oracle twin in ``__spark_entry__.oracle_sql``.  Heuristics
are deliberately simple + deterministic: the point is the distributed
plumbing and oracle-checkability, not linguistic accuracy.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# language marker stopwords (tiny n-gram-free heuristic; deterministic)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "und", "die", "ist", "das"),
    "es": ("el", "la", "de", "es", "los"),
    "fr": ("le", "la", "et", "est", "les"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace/non-alpha tokenization, lowercased, empties dropped.

    Matches DuckDB ``regexp_split_to_array(lower(text), '[^a-z0-9]+')``
    + empty filter exactly (both RE2/Java agree on this class)."""
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != ""
    )


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def gram_at(toks: Column, i0: Column, n: int) -> Column:
    """Space-joined word ``n``-gram starting at 0-based position ``i0``
    of a BOUND token-array attribute, as one flat ``concat`` of element
    reads.  Byte-identical to ``concat_ws(" ", slice(toks, i0+1, n))``
    for in-range positions over a null-free array, and measured ~5×
    cheaper at the sf1.0 bench (the slice allocates a fresh n-element
    array per gram before joining it; this reads n elements in place).
    Callers guarantee ``i0 + n <= size(toks)`` via their sequence
    bounds — shared by every gram builder so the shingle strings the
    SQL twins hash stay identical across operators."""
    parts: list[Column] = []
    for j in range(n):
        if j:
            parts.append(F.lit(" "))
        parts.append(F.get(toks, i0 + j))
    return F.concat(*parts)


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text (rolling-hash stand-in that has an exact SQL twin)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length factor × alpha ratio ×
    (1 - stopword-overload).  Rounded to 6dp so float comparison against
    the SQL oracle is stable."""
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    toks = tokens_col(text)
    n_tok = F.size(toks)
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"]))
    )
    length_factor = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop / F.greatest(n_tok, F.lit(1))
    return F.round(
        length_factor * alpha_ratio * (F.lit(1.0) - F.least(stop_ratio * 2, F.lit(1.0))),
        6,
    )


def language_id(text: Column) -> Column:
    """Marker-stopword language ID: argmax of per-language marker hits,
    'und' (undetermined) when no marker fires.  Ties break by language
    code order (deterministic, mirrored in the SQL oracle)."""
    toks = tokens_col(text)

    def _hits(markers: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    hits = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (first WHEN wins in SQL CASE)
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def repetition_stats(df, id_col: str, text_col: str):
    """Within-document repetition signals (Gopher-style quality filters,
    Rae et al. 2021 §A1.1): per document,

    * ``dup_line_ratio``  — fraction of non-empty trimmed lines that are
      occurrences of a duplicated line;
    * ``dup_2gram_ratio`` — fraction of word 2-grams occupied by 2-grams
      that occur more than once;
    * ``top_2gram_ratio`` — fraction occupied by the single most frequent
      2-gram.

    Boilerplate/spam pages score high on all three; clean prose low.

    Scale shape: explode → hash-aggregate on the uniform composite key
    (doc, gram) → re-aggregate per doc.  The tempting pure-array
    alternative (count each distinct gram via a nested higher-order
    filter) is O(n²) JVM work PER DOCUMENT — a single 1 MB document
    would do ~10^10 comparisons on one core; the explode keeps per-doc
    cost O(n log n) and spreads it across the cluster.  Two shuffles,
    zero Python, exact SQL twin (ratios rounded to 6dp).  Documents with
    no 2-grams / no lines get ratio 0.0 (left join + coalesce)."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_x"))
    toks = tokens_col(F.col("_x"))
    d = base.select("id", toks.alias("_t"))
    n_grams = F.size(F.col("_t")) - 1
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: gram_at(F.col("_t"), i, 2),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gram_rows = d.select("id", F.explode(grams).alias("g"))
    per_gram = gram_rows.groupBy("id", "g").agg(F.count("*").alias("c"))
    gram_stats = per_gram.groupBy("id").agg(
        F.sum("c").alias("_n"),
        F.max("c").alias("_top"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("_dup"),
    )
    lines = F.filter(
        F.transform(F.split(F.col("_x"), r"\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    line_rows = base.select("id", F.explode(lines).alias("l"))
    per_line = line_rows.groupBy("id", "l").agg(F.count("*").alias("c"))
    line_stats = per_line.groupBy("id").agg(
        F.sum("c").alias("_ln"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("_ldup"),
    )
    return (
        base.select("id")
        .join(gram_stats, "id", "left")
        .join(line_stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(
                F.round(F.col("_ldup") / F.col("_ln"), 6), F.lit(0.0)
            ).alias("dup_line_ratio"),
            F.coalesce(
                F.round(F.col("_dup") / F.col("_n"), 6), F.lit(0.0)
            ).alias("dup_2gram_ratio"),
            F.coalesce(
                F.round(F.col("_top") / F.col("_n"), 6), F.lit(0.0)
            ).alias("top_2gram_ratio"),
        )
    )


# PII patterns: the Java-regex / RE2 COMMON SUBSET only (no lookaround,
# no backrefs), so Spark and the DuckDB oracle match identical spans.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONG_DIGITS = r"\b\d{7,}\b"


def redact_pii(df, id_col: str = "doc_id", text_col: str = "text"):
    """PII scrubbing — the redaction pass every pretraining corpus gets
    before release (emails / IPv4 addresses / long digit runs → typed
    placeholder tokens, the C4/CCNet-style regex tier; NER-grade PII
    detection is a model, not a regex, and out of scope).

    Returns ``(id_col, n_emails, n_ips, n_numbers, text_redacted)`` for
    every input row.  Replacement is STAGED — emails first, then IPs on
    the email-redacted text, then ≥7-digit runs on the IP-redacted text
    — and each count is measured on the stage input it was replaced in,
    so counts and text agree exactly and the whole op is a deterministic
    function of the input (the same staging mirrored in the SQL twin).
    ``PII_LONG_DIGITS`` runs last so it cannot eat the digits inside an
    address the earlier stages own.

    Scale shape: pure per-row JVM regex expressions (whole-stage
    codegen), zero shuffle, zero Python; each intermediate text is bound
    as an attribute so no regex pass re-evaluates.  Patterns stay inside
    the Java/RE2 common subset so the DuckDB oracle computes identical
    spans.
    """
    d = df.select(F.col(id_col), F.col(text_col).alias("_t0"))
    d = d.select(
        id_col,
        "_t0",
        F.size(F.regexp_extract_all(F.col("_t0"), F.lit(PII_EMAIL), F.lit(0)))
        .alias("n_emails"),
        F.regexp_replace("_t0", PII_EMAIL, "<EMAIL>").alias("_t1"),
    )
    d = d.select(
        id_col,
        "n_emails",
        F.size(F.regexp_extract_all(F.col("_t1"), F.lit(PII_IPV4), F.lit(0)))
        .alias("n_ips"),
        F.regexp_replace("_t1", PII_IPV4, "<IP>").alias("_t2"),
    )
    return d.select(
        id_col,
        "n_emails",
        "n_ips",
        F.size(
            F.regexp_extract_all(F.col("_t2"), F.lit(PII_LONG_DIGITS), F.lit(0))
        ).alias("n_numbers"),
        F.regexp_replace("_t2", PII_LONG_DIGITS, "<NUM>").alias(
            "text_redacted"
        ),
    )


def _winnow_minima_arrow(hashed, id_col: str, window: int):
    """(id, _h array<long>) → exploded (id, fingerprint long) rows: the
    sliding-window minima + distinct + ascending sort of the winnowing
    scheme in one vectorized pass per Arrow batch.

    Bit-identical to the expr form (pure int64 minima over the same
    md5-60 hashes; ``np.unique`` = ``array_sort(array_distinct(...))``
    followed by ``explode`` — rows with fewer than ``window`` hashes
    emit nothing, exactly like the empty-array explode).  The expr form
    pays ``n_windows × window`` interpreted ``array_min(slice(...))``
    lambda evaluations per document — the dominant term of the winnow
    pass at bench scale (guide §4.2)."""
    id_type = hashed.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, fingerprint long"

    def run(batches):
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, fps = [], []
            for i, h in zip(pdf[id_col], pdf["_h"]):
                if h is None or len(h) < window:
                    continue
                arr = np.asarray(h, dtype=np.int64)
                mins = np.unique(
                    sliding_window_view(arr, window).min(axis=1)
                )
                ids.append(np.full(len(mins), i, dtype=object))
                fps.append(mins)
            if not fps:
                continue
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids),
                    "fingerprint": np.concatenate(fps),
                }
            )

    return hashed.mapInPandas(run, schema=out_schema)


def winnow_fingerprints(
    df, id_col: str, text_col: str, k: int = 5, window: int = 4,
    engine: str = "arrow",
):
    """Winnowing document fingerprints (the MOSS scheme, Schleimer/
    Wilkerson/Aiken SIGMOD'03): hash every word k-gram, slide a window of
    ``window`` consecutive k-gram hashes, keep each window's minimum; the
    distinct minima are the document's fingerprints.  Any shared run of
    ≥ window+k-1 tokens between two documents is guaranteed to share at
    least one fingerprint, while only ~2/(window+1) of the k-gram hashes
    are stored — the index-size/recall trade the true rolling-hash
    scheme exists for.

    Plan shape: per-row JVM higher-order functions only — no shuffle, no
    Python.  Each array is BOUND AS AN ATTRIBUTE in its own projection
    before a lambda references it: an expression captured inside a
    higher-order-fn lambda is re-evaluated per element, which would make
    the window pass O(n_windows × n_grams) md5 calls instead of O(n).
    The k-gram hash is the top-60-bit md5 (same portable trick as
    kg.ops.minhash ``portable=True``), so DuckDB computes identical
    values and the operator has a FULL SQL oracle.

    Returns long-format (id, fingerprint:long) rows, fingerprints
    distinct + ascending per id.

    ``engine``: ``"arrow"`` (default) runs the window-minima pass as one
    vectorized numpy sweep per batch (``_winnow_minima_arrow`` —
    bit-identical int64 minima; k-gram construction and md5 hashing stay
    JVM-side so the portable-hash contract is untouched); ``"expr"``
    keeps the pure-JVM higher-order-fn form as the independent
    cross-check and for python-worker-less clusters.
    """
    if engine not in ("arrow", "expr"):
        raise ValueError(f"engine must be 'arrow' or 'expr', got {engine!r}")
    toks = tokens_col(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias("_t"))
    n_grams = F.size(F.col("_t")) - (k - 1)
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: gram_at(F.col("_t"), i, k),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from kg.ops.minhash import md5_60

    d = d.select(F.col(id_col), grams.alias("_g"))
    hashes = F.transform(F.col("_g"), md5_60)
    d = d.select(F.col(id_col), hashes.alias("_h"))
    if engine == "arrow":
        return _winnow_minima_arrow(d, id_col, window)
    n_win = F.size(F.col("_h")) - (window - 1)
    minima = F.when(
        n_win >= 1,
        F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.array_min(F.slice(F.col("_h"), i + 1, window)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return d.select(
        F.col(id_col),
        F.explode(F.array_sort(F.array_distinct(minima))).alias("fingerprint"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
):
    """Gopher document-quality rule bundle (Rae et al. 2021, A1.1 —
    the repetition half lives in :func:`repetition_stats`): per doc the
    measured signals plus one ``keep`` verdict over the paper's
    thresholds (all caller-overridable).  Rules: word count in
    [min, max]; mean word length in [min, max]; symbol-to-word ratio
    (``#`` and ``...``) ≤ max; < max fraction of lines starting with a
    bullet (• - *) and ≤ max ending in an ellipsis (... …); ≥ min
    fraction of words containing an alphabetic character; ≥ min of the
    eight Gopher stopwords present.

    Output ``(id_col, n_words, mean_word_len, symbol_ratio,
    bullet_frac, ellipsis_frac, alpha_frac, n_stop, keep)``; ratio
    columns are 6dp-rounded and the verdict compares the ROUNDED values
    so ``keep`` is bit-identical across engines (the repo float
    contract).  Words are whitespace-split (the paper's notion — NOT
    :func:`tokens_col`'s alnum tokens, which would erase the
    symbol/alpha signals); the stopword rule alone uses alnum tokens so
    punctuation can't hide ``the,``.

    Plan shape (100 TB): one pure map-side pass — word/line arrays
    bound as attributes once (the repo HOF discipline), every signal a
    Column expression over them, zero shuffle, zero Python.

    The word split uses an EXPLICIT whitespace class instead of ``\\s``:
    Java's ``\\s`` includes vertical tab, DuckDB's RE2 ``\\s`` does not,
    so the shorthand would silently break the bit-identical contract on
    ``\\x0B``-bearing text; the literal class below parses to the same
    set in both engines (mirrored in the SQL twin)."""
    words = F.filter(
        F.split(F.col(text_col), r"[ \t\n\x0B\f\r]+"), lambda w: w != ""
    )
    lines = F.split(F.col(text_col), "\n")
    b = (
        df.select(F.col(id_col), F.col(text_col))
        .withColumn("_w", words)
        .withColumn("_l", lines)
        .withColumn("_nw", F.size("_w"))
        .withColumn("_nl", F.size("_l"))
    )
    nw, nl = F.col("_nw"), F.col("_nl")
    tlen = F.length(F.col(text_col))
    n_sym = (tlen - F.length(F.replace(F.col(text_col), F.lit("#")))) + (
        (tlen - F.length(F.replace(F.col(text_col), F.lit("...")))) / 3
    ).cast("long")
    is_bullet = lambda l: (  # noqa: E731
        F.ltrim(l).startswith("•")
        | F.ltrim(l).startswith("- ")
        | F.ltrim(l).startswith("* ")
    )
    is_ell = lambda l: (  # noqa: E731
        F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…")
    )
    ratio = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
    )
    m = b.select(
        id_col,
        nw.cast("long").alias("n_words"),
        ratio(
            F.aggregate(
                "_w", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
            ),
            nw,
        ).alias("mean_word_len"),
        ratio(n_sym, nw).alias("symbol_ratio"),
        ratio(F.size(F.filter("_l", is_bullet)), nl).alias("bullet_frac"),
        ratio(F.size(F.filter("_l", is_ell)), nl).alias("ellipsis_frac"),
        ratio(
            F.size(F.filter("_w", lambda w: w.rlike("[A-Za-z]"))), nw
        ).alias("alpha_frac"),
        F.size(
            F.array_intersect(
                F.array_distinct(tokens_col(F.col(text_col))),
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            )
        ).alias("n_stop"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") < max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("n_stop") >= min_stopwords)
    )
    return m.withColumn("keep", keep)


# GPT-2-style pre-tokenizer split (Radford et al. 2019), simplified to
# the Java-regex/RE2 COMMON SUBSET: the original's contraction
# alternates ('s|'t|...) and trailing-space lookahead (?!\S) are dropped
# — RE2 (DuckDB) has no lookahead — and whitespace is the EXPLICIT class
# (Java \s includes \x0B, RE2's does not; the gopher_quality rule).
# Space-prefixed letter/digit/punctuation runs are the GPT-2 signature:
# "hello world 123!" → ["hello", " world", " 123", "!"].
BPE_SPLIT_PATTERN = (
    " ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: how many pre-tokenizer pieces a GPT-2-family
    tokenizer would split ``text`` into BEFORE byte-pair merges — the
    standard cheap upper-bound estimate for token budgets (packing,
    pricing, context-window fits) when the real tokenizer isn't on the
    cluster.  Whitespace-separated words, digit runs and punctuation
    runs each count once (with their GPT-2 leading-space attachment);
    pure whitespace between pieces counts zero.  One map-side
    ``regexp_extract_all`` + ``size`` — zero shuffle, exact RE2 twin."""
    return F.size(
        F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0))
    )


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    top_v: int = 1000,
) -> DataFrame:
    """Tokenizer-vocabulary induction → ``(rank, token, n, cum_frac)``:
    the corpus' ``top_v`` most frequent tokens (count desc, token asc)
    with each prefix's cumulative share of ALL token occurrences — the
    coverage curve that answers "what vocab size covers 95% of this
    corpus?" before training a tokenizer.  ``cum_frac`` at rank v is
    Σ_{i≤v} n_i / total, with total over the WHOLE vocabulary (tail
    included), 6dp.

    Plan shape (100 TB): one explode + ONE token hash agg (map-side
    combined); the grand total is a second constant-size agg joined as
    a lazy 1-row broadcast scalar; top-v selection is a distributed
    TakeOrdered (never a full sort), and the rank/cumsum window runs
    over ≤ ``top_v`` already-selected rows — bounded by the parameter,
    not the corpus (the pack_sequences single-partition-window rule
    does not apply to parameter-bounded frames)."""
    from pyspark.sql import Window

    if top_v < 1:
        raise ValueError(f"top_v must be >= 1, got {top_v}")
    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_tot"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(top_v)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    cum = Window.orderBy(F.desc("n"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "n",
            F.round(
                F.sum("n").over(cum).cast("double")
                / F.col("_tot").cast("double"),
                6,
            ).alias("cum_frac"),
        )
    )


def bigram_next_tokens(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Corpus bigram language-model table → ``(token, next_token, n,
    p_next, rank)``: for every token, its ``k`` most frequent successors
    with the exact conditional probability ``P(next | token) =
    n(token, next) / Σ_next n(token, ·)`` (6dp) — the n-gram LM
    statistic behind autocomplete evaluation, perplexity baselines and
    boilerplate detection (a token whose top successor carries most of
    its mass is template text).  Bigrams never cross document
    boundaries.  ``min_count`` prunes singleton bigrams before ranking;
    ranking is (count desc, next_token asc), the repo's cross-engine
    contract.

    Plan shape (100 TB): bigrams are zipped IN-ARRAY per document
    (``slice``+``zip_with`` over the bound token array — no self-join,
    no window over the corpus), then ONE hash agg on (token, next),
    ONE per-token marginal agg joined broadcast-gated, and a top-k
    window partitioned by token."""
    from pyspark.sql import DataFrame as _DF  # noqa: F401
    from pyspark.sql import Window

    from kg.hints import maybe_broadcast

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = tokens_col(F.col(text_col))
    pairs = (
        docs.select(toks.alias("_t"))
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice(
                        F.col("_t"),
                        2,
                        F.greatest(F.size("_t") - 1, F.lit(0)),
                    ),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("_p")
        )
        .select(F.col("_p.w1").alias("token"), F.col("_p.w2").alias("next_token"))
    )
    counts = pairs.groupBy("token", "next_token").agg(
        F.count("*").alias("n")
    )
    marg = counts.groupBy("token").agg(F.sum("n").alias("_tot"))
    w = Window.partitionBy("token").orderBy(
        F.desc("n"), F.asc("next_token")
    )
    return (
        counts.filter(F.col("n") >= min_count)
        .join(maybe_broadcast(marg), "token")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "token",
            "next_token",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("_tot").cast("double"), 6
            ).alias("p_next"),
            "rank",
        )
    )


def token_entropy(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group unigram token statistics →
    ``(group_col, n_tokens, n_types, ttr, entropy_fp)``: total token
    occurrences, distinct types, type-token ratio (6dp), and the
    Shannon entropy of the unigram distribution in exact integer
    micro-nats — the information-density / diversity profile that
    flags template-generated or boilerplate-heavy corpus slices
    (low entropy, low TTR) before training.

    Exactness contract (the bm25 discipline): ONE transcendental per
    distinct (group, token) — ``term_fp = floor(1e6 · ln(T/n))`` on
    the exact double ratio — after which the entropy is the
    association-order-free decimal(38,0) sum ``Σ n·term_fp`` floored
    by ``div T`` into BIGINT micro-nats, so the op carries a bit-exact
    DuckDB twin (HUGEINT ``//``).  H = (1/T)·Σ n·ln(T/n) is the
    standard plug-in estimator.

    Plan shape (100 TB): one explode + ONE (group, token) hash agg
    (map-side combined); group totals are a second constant-size agg
    broadcast back as a dim (|groups| rows); the final per-group agg
    reduces the token frame without another shuffle of the corpus.
    Zero-token groups cannot occur (groups exist only via tokens).
    """
    counts = (
        docs.select(
            F.col(group_col),
            F.explode(tokens_col(F.col(text_col))).alias("token"),
        )
        .groupBy(group_col, "token")
        .agg(F.count("*").alias("n"))
    )
    totals = counts.groupBy(group_col).agg(
        F.sum("n").cast("long").alias("_tot"),
        F.count("*").cast("long").alias("_types"),
    )
    from kg.hints import maybe_broadcast

    term = counts.join(maybe_broadcast(totals), group_col).select(
        group_col,
        "n",
        "_tot",
        "_types",
        F.floor(
            F.lit(1000000.0)
            * F.log(F.col("_tot").cast("double") / F.col("n").cast("double"))
        )
        .cast("long")
        .alias("_term_fp"),
    )
    dec = "decimal(38,0)"
    return (
        term.groupBy(group_col)
        .agg(
            F.first("_tot").alias("n_tokens"),
            F.first("_types").alias("n_types"),
            F.sum(
                (F.col("n").cast(dec) * F.col("_term_fp").cast(dec)).cast(dec)
            ).alias("_h_sum"),
        )
        .select(
            group_col,
            "n_tokens",
            "n_types",
            F.round(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("ttr"),
            F.expr("_h_sum div cast(n_tokens as decimal(38,0))")
            .cast("long")
            .alias("entropy_fp"),
        )
    )


def bigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram-LM surprisal →
    ``(id_col, n_bigrams, nats_fp)``: the average self-information
    ``−ln P(next | token)`` of each document's word bigrams under the
    corpus MLE bigram model, in exact BIGINT micro-nats — the
    conditional (order-sensitive) upgrade of :func:`~kg.ops.curate`'s
    unigram ``lm_score`` and the deterministic stand-in for the
    CCNet/KenLM perplexity filter: template/boilerplate documents score
    LOW (their bigrams are corpus-predictable), garbage scores high.

    Exactness contract (the bm25 discipline): ONE transcendental per
    distinct BIGRAM — ``w_fp = floor(10⁶ · ln(c(tok,·)/c(tok,next)))``
    on the exact integer-ratio double — then a plain BIGINT sum per
    document and ``sum div n`` (exact floor; w_fp ≥ 0), so the score
    carries a bit-exact DuckDB twin.  The model is fit on the SAME
    corpus being scored, so every document bigram exists in the model
    (no backoff path); documents with < 2 tokens report (0, 0).

    Plan shape (100 TB): bigrams zip IN-ARRAY per document (the
    :func:`bigram_next_tokens` slice+zip_with shape — no corpus
    self-join), ONE (tok, next) hash agg for the model, ONE per-token
    marginal agg (both map-side combined), and one equi-join of the
    exploded bigram stream against the vocab²-bounded weight dim
    (broadcast-gated) followed by ONE per-doc agg.
    """
    from kg.hints import maybe_broadcast

    toks = tokens_col(F.col(text_col))
    stream = (
        docs.select(F.col(id_col), toks.alias("_t"))
        .select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice(
                        F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))
                    ),
                    F.slice(
                        F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))
                    ),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("_p"),
        )
        .select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    pair_counts = stream.groupBy("w1", "w2").agg(F.count("*").alias("cp"))
    marginal = pair_counts.groupBy("w1").agg(
        F.sum("cp").cast("long").alias("ct")
    )
    weights = pair_counts.join(maybe_broadcast(marginal), "w1").select(
        "w1",
        "w2",
        F.floor(
            F.lit(1000000.0)
            * F.log(F.col("ct").cast("double") / F.col("cp").cast("double"))
        )
        .cast("long")
        .alias("w_fp"),
    )
    scored = (
        stream.join(maybe_broadcast(weights), ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("w_fp").alias("_tot"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.expr("_tot div n_bigrams").cast("long").alias("nats_fp"),
        )
    )
    return docs.select(id_col).join(maybe_broadcast(scored), id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("nats_fp", F.lit(0)).cast("long").alias("nats_fp"),
    )


def ngram_diversity(
    docs,
    n: int = 2,
    group_col: str = "lang",
    text_col: str = "text",
):
    """Distinct-n n-gram diversity per ``group_col`` →
    ``(group_col, ngrams_total, ngrams_distinct, distinct_ratio)``:
    the Li et al. 2016 distinct-n metric — unique word n-grams over
    total n-gram occurrences.  Low distinct-n flags mode-collapsed or
    template-heavy text, which is how synthetic / model-generated
    corpora are screened before they enter a training mix (the
    corpus-level counterpart of the per-doc Gopher repetition
    signals in this module).

    Plan shape: the token array is bound as its OWN projection before
    the gram lambda (the O(L²) HOF-inlining hazard documented on
    :func:`word_ngrams`), grams explode once, and both counts ride one
    hash agg per group.  ``count(DISTINCT gram)`` shuffles the
    distinct gram set per group — exact by contract here; at 100 TB
    swap the distinct side for :func:`kg.ops.sketch.mincount_distinct`
    (F0 sketch, O(k) state) and keep the total from this same agg.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    for c in (group_col, text_col):
        if c not in docs.columns:
            raise ValueError(f"column {c!r} not in frame")
    d = docs.select(
        F.col(group_col), tokens_col(F.col(text_col)).alias("_t")
    )
    count = F.size(F.col("_t")) - (n - 1)
    grams = F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: gram_at(F.col("_t"), i - 1, n),
        ),
    )  # otherwise NULL: explode drops docs shorter than n tokens
    g = d.select(group_col, F.explode(grams).alias("gram"))
    return g.groupBy(group_col).agg(
        F.count("*").cast("long").alias("ngrams_total"),
        F.countDistinct("gram").cast("long").alias("ngrams_distinct"),
        F.round(
            F.countDistinct("gram").cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("distinct_ratio"),
    )


def token_gini(docs, text_col: str = "text"):
    """Vocabulary concentration → ONE row
    ``(n_types, n_tokens, gini)``: the Gini coefficient of the token
    frequency distribution — 0 = perfectly uniform vocabulary use,
    →1 = a few boilerplate tokens dominate the corpus.  Natural text
    sits high (Zipf); a SPIKE vs a reference corpus flags template/
    spam flooding, a DROP flags shredded or synthetic-uniform text —
    the distribution-shape cousin of :func:`ngram_diversity`'s
    distinct-n ratio.

    Formula (exact rank form, frequencies ascending):
    ``G = 2·Σᵢ i·fᵢ / (n·Σf) − (n+1)/n`` over the n vocabulary types.

    Exactness: counts and the rank-weighted sum are exact integers
    (decimal(38,0)); the rank order ``(freq, token)`` is total so
    ``row_number`` is deterministic; the two final divisions are
    spelled identically in the twin and rounded to 6 dp.

    Plan shape (100 TB): one corpus-sized token hash agg down to the
    VOCABULARY, then the rank window and the final fold run over
    vocab-sized data only — the single-partition window is bounded by
    |vocab|, never by the corpus (same justification as
    ``tfidf_topk``'s df dim).
    """
    from pyspark.sql import Window as W

    if text_col not in docs.columns:
        raise ValueError(f"column {text_col!r} not in frame")
    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("_t"))
        .groupBy("_t")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    ranked = counts.withColumn(
        "_i", F.row_number().over(W.orderBy("_c", "_t"))
    )
    dec = "decimal(38,0)"
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("_c").cast(dec)).alias("_tot"),
        F.sum(
            F.col("_i").cast(dec) * F.col("_c").cast(dec)
        ).alias("_ws"),
    )
    n_d = F.col("n_types").cast("double")
    return agg.select(
        "n_types",
        F.col("_tot").cast("long").alias("n_tokens"),
        F.when(
            F.col("n_types") >= 1,
            F.round(
                F.lit(2.0) * F.col("_ws").cast("double")
                / (n_d * F.col("_tot").cast("double"))
                - (n_d + F.lit(1.0)) / n_d,
                6,
            ),
        ).alias("gini"),
    )


def vocab_overlap(docs, group_col: str = "lang", text_col: str = "text"):
    """Pairwise vocabulary overlap between groups →
    ``(group_a, group_b, n_a, n_b, n_common, jaccard)`` for each
    ordered pair (a < b): Jaccard similarity of the groups' distinct
    token sets — the corpus-comparison matrix that flags mislabeled
    languages (two "different" languages sharing 80 % vocabulary),
    contaminated domain splits, or which sources can share a
    tokenizer.

    Plan shape (100 TB): corpus collapses to the distinct
    (group, token) vocabulary in one hash agg; the pair intersection
    is a token-keyed equi-join of that vocab frame with itself
    (vocab-sized, ≤ |groups| rows per token); group sizes are a
    broadcast dim.  Exact integer counts; Jaccard is one division,
    6 dp.
    """
    from kg.hints import maybe_broadcast

    for c in (group_col, text_col):
        if c not in docs.columns:
            raise ValueError(f"column {c!r} not in frame")
    vocab = (
        docs.select(
            F.col(group_col).alias("_g"),
            F.explode(tokens_col(F.col(text_col))).alias("_t"),
        )
        .distinct()
    )
    sizes = maybe_broadcast(
        vocab.groupBy("_g").agg(F.count("*").cast("long").alias("_n"))
    )
    a = vocab.select(F.col("_g").alias("group_a"), "_t")
    b = vocab.select(F.col("_g").alias("group_b"), "_t")
    common = (
        a.join(b, "_t")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    out = (
        common.join(
            sizes.select(F.col("_g").alias("group_a"), F.col("_n").alias("n_a")),
            "group_a",
        )
        .join(
            sizes.select(F.col("_g").alias("group_b"), F.col("_n").alias("n_b")),
            "group_b",
        )
    )
    return out.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        "n_common",
        F.round(
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                "double"
            ),
            6,
        ).alias("jaccard"),
    )


def zipf_slope(docs, text_col: str = "text"):
    """Zipf exponent of the token frequency distribution → ONE row
    ``(n_types, slope, intercept)``: OLS fit of ln(freq) against
    ln(rank) over the vocabulary (rank 1 = most frequent).  Natural
    corpora sit near slope ≈ −1 (Zipf's law); a much flatter slope
    flags synthetic/uniform text, a much steeper one template
    flooding — the parametric cousin of :func:`token_gini`.

    Exactness: ln values fix-point to ⌊10⁶·ln(·)⌋ of exact integers
    (the bm25 idf precedent — both engines' libm ln agree inside the
    µ-unit floor), the OLS moments (Σx, Σy, Σxy, Σx², n) accumulate
    in decimal(38,0), and slope/intercept are the closed-form ratios
    with identically-spelled float finals, 6 dp.  Fewer than two
    types (or zero x-variance) yields NULLs.

    Plan shape: corpus → vocabulary in one hash agg; the rank window
    and moment fold run over vocab-sized data only.
    """
    from pyspark.sql import Window as W

    if text_col not in docs.columns:
        raise ValueError(f"column {text_col!r} not in frame")
    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("_t"))
        .groupBy("_t")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    ranked = counts.withColumn(
        "_r", F.row_number().over(W.orderBy(F.desc("_c"), F.asc("_t")))
    )
    x = F.floor(F.log(F.col("_r").cast("double")) * F.lit(1_000_000)).cast(
        "long"
    )
    y = F.floor(F.log(F.col("_c").cast("double")) * F.lit(1_000_000)).cast(
        "long"
    )
    dec = "decimal(38,0)"
    pts = ranked.select(x.alias("_x"), y.alias("_y"))
    m = pts.agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("_x").cast(dec)).alias("_sx"),
        F.sum(F.col("_y").cast(dec)).alias("_sy"),
        F.sum(F.col("_x").cast(dec) * F.col("_y").cast(dec)).alias("_sxy"),
        F.sum(F.col("_x").cast(dec) * F.col("_x").cast(dec)).alias("_sxx"),
    )
    n = F.col("n_types").cast(dec)
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    b = num.cast("double") / den.cast("double")
    a = (
        F.col("_sy").cast("double") - b * F.col("_sx").cast("double")
    ) / F.col("n_types").cast("double")
    ok = (F.col("n_types") >= 2) & (den != F.lit(0).cast(dec))
    return m.select(
        "n_types",
        F.when(ok, F.round(b, 6)).alias("slope"),
        F.when(ok, F.round(a / F.lit(1_000_000), 6)).alias("intercept"),
    )
