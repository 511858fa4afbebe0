"""Training-data curation operators: benchmark decontamination,
deterministic splits, stratified sampling, TF-IDF keyword extraction.

Design notes (100 TB shape):

- ``decontaminate`` — the benchmark side is tiny by nature (eval sets
  are thousands of docs, the corpus is billions), so its n-gram set is
  broadcast (evidence-gated via :func:`kg.hints.maybe_broadcast`; over
  budget it degrades to a shuffle join, never OOM).  The corpus side
  dedups n-grams *inside the array* before exploding, so the exploded
  row count is bounded by distinct-grams-per-doc, and the per-doc hit
  count aggregates with a map-side combine.  No corpus self-join
  anywhere.
- ``split_assign`` — pure map-side column expression (md5 bucket), zero
  shuffle; the canonical way to carve train/val/test at any scale.
- ``stratified_sample`` — EXACT per-stratum quotas need a per-stratum
  rank (one shuffle, per-stratum sort).  For corpus-scale strata prefer
  ``split_assign``-style hash thresholds (shuffle-free, binomial-exact
  in expectation); the exact variant is for bounded strata counts.
- ``tfidf_topk`` — two hash aggregations (term×doc, then term) and one
  broadcast-gated join of the document-frequency dim; ranking uses
  6dp-rounded scores so the order is reproducible across engines.
- ``pack_sequences`` — the global running token offset is a distributed
  scan (range shuffle + per-partition totals + broadcast prefix), never
  a single-partition ``Window.orderBy`` — the one-task funnel that
  kills an ordered scan at corpus scale.

All outputs are engine-portable (md5-based hashing, 6dp rounds) so each
op carries an exact DuckDB oracle twin in ``__spark_entry__``.

Reference parity: the reference (syedhassaanahmed/neo-to-cosmos) has no
curation surface — these extend the engine for LLM-training pipelines
per SURVEY.md §2.1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kg.hints import maybe_broadcast
from kg.ops.minhash import md5_60
from kg.ops.text import tokens_col


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word ``n``-grams of ``text`` as space-joined strings.

    DuckDB twin: ``list_distinct([array_to_string(toks[i:i+n-1], ' ')
    for i in range(1, len-n+2)])`` via ``list_transform(range(...))``.

    NOTE: ``text`` should be a plain column reference, and when the
    caller controls the plan it should bind the token array as its own
    projection first (see ``_gram_hashes``) — an expensive expression
    captured inside a higher-order-fn lambda is re-evaluated per
    element, turning the gram pass O(L²) in document length.
    """
    return _ngrams_of(tokens_col(text), n)


def _ngrams_of(toks: Column, n: int) -> Column:
    """Distinct space-joined ``n``-grams of a token-array column.
    Pass an ATTRIBUTE reference (a column bound by a previous
    projection) — re-evaluating an attribute per lambda element is a
    row-buffer read; re-evaluating a tokenizer expression is a full
    regex split per element."""
    count = F.size(toks) - (n - 1)
    # ANSI mode: sequence(1, 0) raises, so docs shorter than n tokens
    # take the empty branch (CaseWhen evaluates only the live branch)
    from kg.ops.text import gram_at

    grams = F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: gram_at(toks, i - 1, n),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def _gram_hashes(
    df: DataFrame, keep: list[str], text_col: str, n: int
) -> DataFrame:
    """(keep..., gh) rows: top-60-bit md5 of each distinct word n-gram.

    Three projections so the token array and the gram array are each
    BOUND AS ATTRIBUTES before a lambda touches them (Catalyst's
    CollapseProject keeps multi-referenced non-cheap aliases in their
    own projection — the same O(L) vs O(L²) discipline as
    ``kg.ops.text.winnow_fingerprints``)."""
    d = df.select(*keep, tokens_col(F.col(text_col)).alias("_t"))
    d = d.select(*keep, _ngrams_of(F.col("_t"), n).alias("_g"))
    return d.select(*keep, F.explode("_g").alias("gram")).select(
        *keep, md5_60(F.col("gram")).alias("gh")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Flag corpus docs sharing any word ``n``-gram with a benchmark set
    (GPT-3-style test-set decontamination, 13-gram default).

    Returns ``(id_col, n_hits)`` for contaminated docs only — the caller
    anti-joins to drop them.  ``n_hits`` = number of DISTINCT corpus-doc
    n-grams that appear anywhere in the benchmark (a severity signal:
    1 hit is often coincidence at small n, hundreds is verbatim leak).

    Grams travel as top-60-bit md5 longs, not strings — 8 bytes each
    through the join regardless of n.
    """
    bench_grams = _gram_hashes(benchmark, [], text_col, n).distinct()
    corpus_grams = _gram_hashes(docs, [id_col], text_col, n)
    hits = corpus_grams.join(maybe_broadcast(bench_grams), "gh")
    return hits.groupBy(id_col).agg(F.count("*").alias("n_hits"))


def contamination_score(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-document contamination FRACTION vs a benchmark set →
    ``(id_col, n_grams, n_hits, contamination_fp)`` for EVERY corpus
    doc: ``n_grams`` = distinct word ``n``-grams in the doc, ``n_hits``
    = how many of them appear anywhere in the benchmark,
    ``contamination_fp = n_hits·10⁶ div n_grams`` in exact BIGINT
    micro-units.  The TUNABLE-threshold tier above
    :func:`decontaminate`'s boolean flag: real pipelines drop at
    fraction ≥ x (verbatim leak) but KEEP low-fraction docs a binary
    13-gram rule would discard on one coincidental hit (the Brown et
    al. 2020 appendix-C dilemma), and the fraction is the quantity you
    sweep when calibrating that threshold.

    Plan shape: ``n_grams`` is computed MAP-SIDE from the in-array
    distinct gram list (no explode, no extra shuffle); only the hit
    side explodes, joins the broadcast-gated benchmark dim on 8-byte
    md5-60 longs and reduces in one hash agg, then one left join puts
    zeros on clean docs.  Pure integer division → bit-reproducible →
    full DuckDB twin (``contamination_score``).
    """
    d = docs.select(id_col, tokens_col(F.col(text_col)).alias("_t"))
    d = d.select(id_col, _ngrams_of(F.col("_t"), n).alias("_g"))
    ng = d.select(
        id_col, F.size("_g").cast("long").alias("n_grams")
    )
    bench_grams = _gram_hashes(benchmark, [], text_col, n).distinct()
    corpus_grams = d.select(id_col, F.explode("_g").alias("gram")).select(
        id_col, md5_60(F.col("gram")).alias("gh")
    )
    hits = (
        corpus_grams.join(maybe_broadcast(bench_grams), "gh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        ng.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.when(
                F.col("n_grams") > 0,
                F.expr("coalesce(n_hits, 0) * 1000000 div n_grams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("contamination_fp"),
        )
    )


def split_bucket(id_col: Column, seed: str) -> Column:
    """Deterministic bucket in [0, 1e6): top-60-bit md5 of ``seed:id``.

    Portable: DuckDB ``('0x' || substring(md5(seed || ':' || id), 1,
    15))::UBIGINT % 1000000``.
    """
    key = F.concat_ws(":", F.lit(seed), id_col.cast("string"))
    return F.pmod(md5_60(key), F.lit(1_000_000)).cast("int")


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "kg-split-v1",
) -> DataFrame:
    """Add a deterministic ``split`` column (train/val/test carve).

    Pure map-side — no shuffle, no RNG state: the same row lands in the
    same split on every run, every engine, any partitioning.  Weights
    are cumulative thresholds over the md5 bucket space, so adding rows
    never reshuffles existing assignments.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    # ``withColumn`` REPLACES a same-named column silently — and the
    # pipeline's own warehouse tables carry a ``bucket`` partition
    # column, so curating docs read back from a warehouse would clobber
    # it without a trace (ADVICE r4).  Fail loudly; the caller decides
    # what to drop or rename.
    clash = [c for c in ("bucket", "split") if c in df.columns]
    if clash:
        raise ValueError(
            f"split_assign writes columns {clash} that already exist in the "
            "input — drop or rename them first"
        )
    bucket = split_bucket(F.col(id_col), seed)
    expr: Column | None = None
    acc = 0.0
    # iterate in insertion order; last split is the unconditional tail
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < F.lit(int(round(acc * 1_000_000)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    tail = items[-1][0]
    expr = F.lit(tail) if expr is None else expr.otherwise(tail)
    return df.withColumn("bucket", bucket).withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    fraction: float = 0.1,
    seed: str = "kg-sample-v1",
) -> DataFrame:
    """EXACT per-stratum quota sample: ``ceil(n_s * fraction)`` rows per
    stratum, chosen by md5 order (deterministic, engine-portable).

    One shuffle (window over strata).  Each stratum is sorted within its
    partitions — fine for bounded strata cardinality with balanced
    sizes; for corpus-scale or heavily skewed strata use
    :func:`split_assign` thresholds instead (shuffle-free, exact in
    expectation).  That trade-off (exact quota ⇔ per-stratum sort) is
    fundamental, not an implementation shortcut.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    from pyspark.sql import Window

    order_key = md5_60(
        F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(order_key, F.col(id_col))
    n_s = Window.partitionBy(strata_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_quota", F.ceil(F.count("*").over(n_s) * F.lit(fraction)))
        .where(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` tokens per document by smoothed TF-IDF.

    ``score = tf * (ln((N + 1) / (df + 1)) + 1)`` (sklearn's smooth
    idf), rounded to 6dp; ranking on the rounded score with token-asc
    tie-break so the top-k set is reproducible across engines.

    Plan shape: explode → hash agg (doc, token) with map-side combine →
    token-level hash agg for df → broadcast-gated join of the df dim
    (|vocab| ≪ |corpus tokens|) → per-doc top-k window.
    """
    from pyspark.sql import Window

    tf = (
        docs.select(
            F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    # N as a lazy 1-row broadcast-joined scalar — no driver action, the
    # whole op stays one job
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    df_dim = (
        tf.groupBy("token")
        .agg(F.countDistinct(id_col).alias("df"))
        .crossJoin(F.broadcast(n_docs))
    )
    scored = tf.join(maybe_broadcast(df_dim), "token").withColumn(
        "score",
        F.round(
            F.col("tf")
            * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1)) + 1.0),
            6,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(id_col, "token", "tf", "score", F.col("_rn").alias("rank"))
    )


def lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model quality score: bits-per-token of each
    document under the corpus's own unigram distribution — the
    perplexity-filter stage of a pretraining data recipe (CCNet, Wenzek
    et al. 2020, uses a KenLM 5-gram; the unigram variant keeps the
    distributed shape identical while staying exactly SQL-twinnable).
    Low bits-per-token = repetitive/common-token text (boilerplate,
    navigation spam), high = rare-token soup (code dumps, lists,
    non-language bytes); a training recipe keeps the middle band.

    Output: ``(id_col, n_tokens, bits_per_token)`` for every input doc;
    zero-token docs get 0.0.  ``bits_per_token =
    avg(-log2(count(token)/N))`` over the doc's token occurrences,
    rounded to 6dp (the repo-wide float-portability contract; the mean
    of ~10-bit values carries ~1e-13 cross-engine association error,
    far inside the round).

    Plan shape (100 TB): one explode → token-level hash agg for the
    vocabulary counts (map-side combine; |vocab| ≪ corpus tokens), the
    corpus total as a lazy 1-row broadcast scalar (no driver action,
    same trick as ``tfidf_topk``), one broadcast-gated join of the
    vocabulary dim onto the token stream, one per-doc hash agg.  No
    self-join, no Python, no window.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("c"))
    n_total = vocab.select(F.sum("c").alias("n_total"))
    dim = vocab.crossJoin(F.broadcast(n_total))
    scored = (
        toks.join(maybe_broadcast(dim), "token")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.avg(-F.log2(F.col("c") / F.col("n_total"))), 6
            ).alias("bits_per_token"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("bits_per_token", F.lit(0.0)).alias("bits_per_token"),
        )
    )


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    min_quality: float | None = None,
    dedup: str | None = None,
    ngram: int = 13,
    weights: dict[str, float] | None = None,
    seed: str = "kg-split-v1",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_contamination: float | None = None,
) -> DataFrame:
    """Compose the curation stages a training-data prep job runs:

    quality filter → corpus dedup (``exact`` keeps the lowest-id copy of
    each normalized text; ``paragraph`` removes later occurrences of
    exact paragraphs corpus-wide) → benchmark decontamination (anti-join
    on :func:`decontaminate` hits) → deterministic ``split`` column.

    Entirely lazy — one DataFrame out, no actions; the CLI
    (``jobs/run_curate.py``) decides what to count.  Every stage is
    shuffle-bounded: quality is map-side, exact dedup is one
    groupBy-min + semi-join on the md5 fingerprint (map-side combine
    collapses duplicate hot keys), decontamination broadcasts the
    benchmark's gram set, and the split is map-side.
    """
    from kg.ops.text import doc_fingerprint, quality_score

    out = docs
    if min_quality is not None:
        out = out.where(quality_score(F.col(text_col)) >= F.lit(min_quality))
    if dedup == "exact":
        fp = doc_fingerprint(F.col(text_col)).alias("_fp")
        withfp = out.select("*", fp)
        keep = (
            withfp.groupBy("_fp")
            .agg(F.min(id_col).alias(id_col))
            .select("_fp", id_col)
        )
        out = withfp.join(keep, ["_fp", id_col], "left_semi").drop("_fp")
    elif dedup == "paragraph":
        from kg.ops.dedup import paragraph_dedup

        # paragraph_dedup returns (id, n_paras, n_kept, text_clean):
        # docs whose every paragraph was a later duplicate come back
        # empty — drop them, rewrite the rest with the cleaned text
        deduped = paragraph_dedup(out.select(id_col, text_col), id_col, text_col)
        kept = deduped.where(F.col("n_kept") > 0).select(
            id_col, F.col("text_clean").alias(text_col)
        )
        out = out.drop(text_col).join(kept, id_col)
    elif dedup is not None:
        raise ValueError(f"unknown dedup mode: {dedup!r}")
    if benchmark is not None and max_contamination is not None:
        # fraction-thresholded decontamination: drop only docs whose
        # contaminated-gram share EXCEEDS the threshold (keeps the
        # one-coincidental-13-gram docs the boolean rule discards)
        if not 0.0 <= max_contamination <= 1.0:
            raise ValueError(
                f"max_contamination must be in [0, 1], got {max_contamination}"
            )
        scores = contamination_score(
            out, benchmark, id_col=id_col, text_col=text_col, n=ngram
        )
        bad = scores.where(
            F.col("contamination_fp") > F.lit(int(max_contamination * 1_000_000))
        )
        out = out.join(bad.select(id_col), id_col, "left_anti")
    elif benchmark is not None:
        hits = decontaminate(
            out, benchmark, id_col=id_col, text_col=text_col, n=ngram
        )
        out = out.join(hits.select(id_col), id_col, "left_anti")
    return split_assign(out, id_col=id_col, weights=weights, seed=seed)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concatenation-model sequence packing (the standard pretraining
    dataloader shape): documents are laid out in ``id_col`` order as one
    token stream and chunked every ``max_tokens``.  Per document:

    * ``n_tokens``     — token count (same tokenizer as ``tokens_col``);
    * ``start_offset`` — position of its first token in the stream;
    * ``first_pack`` / ``last_pack`` — the chunk range it lands in
      (``offset div max_tokens``); a doc spans ``last - first + 1``
      context windows.  Zero-token docs get ``last_pack = first_pack``.

    The global running offset is a DISTRIBUTED SCAN, not a
    single-partition window (``Window.orderBy`` with no partitionBy
    funnels the corpus through one task — the exact anti-pattern the
    ordered-scan O3 note in SURVEY.md dissolves):

    1. range-repartition by id + sort within partitions (one shuffle —
       the total order);
    2. per-partition token totals (``spark_partition_id`` agg, one tiny
       collect of O(partitions) rows — same class as the lineage reads);
    3. exclusive prefix of those totals broadcast back, added to each
       partition-local running sum.

    The emitted offsets are invariant to where the range boundaries
    land, so the op stays value-deterministic while every heavy step is
    partition-parallel.  Exact DuckDB twin: ``SUM(n) OVER (ORDER BY id
    ROWS UNBOUNDED PRECEDING)`` minus n.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    from pyspark.sql import Window

    spark = docs.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    counted = docs.select(
        F.col(id_col), F.size(tokens_col(F.col(text_col))).alias("n_tokens")
    )
    # one range shuffle = the total order; checkpoint because the frame
    # feeds both the per-partition totals and the final window
    ordered = (
        counted.repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = {
        r["_pid"]: r["t"]
        for r in ordered.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    }
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    prefix_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(v)) for p, v in prefix.items()], "_pid int, _pre long"
        )
    )
    # explicit ROWS frame: the default with an orderBy is RANGE, under
    # which tied ``id_col`` values share one inclusive sum — duplicate
    # ids would silently produce overlapping start_offsets that diverge
    # from the oracle's ROWS UNBOUNDED PRECEDING frame (ADVICE r4).
    # With a ROWS frame duplicate ids still pack (tie ORDER within a
    # partition is unspecified, as it is in the SQL twin); unique ids —
    # this repo's contract — are bit-deterministic either way.
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_end = F.sum("n_tokens").over(w)  # inclusive running sum
    start = (F.col("_pre") + local_end - F.col("n_tokens")).alias("start_offset")
    out = ordered.join(prefix_df, "_pid").select(
        F.col(id_col), F.col("n_tokens").cast("long").alias("n_tokens"), start
    )
    return out.select(
        id_col,
        "n_tokens",
        F.col("start_offset").cast("long").alias("start_offset"),
        F.expr(f"start_offset div {max_tokens}")
        .cast("long")
        .alias("first_pack"),
        F.expr(f"(start_offset + greatest(n_tokens - 1, 0)) div {max_tokens}")
        .cast("long")
        .alias("last_pack"),
    )


def clean_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    terminal: tuple[str, ...] = (".", "!", "?", '"'),
    blocklist: tuple[str, ...] = ("javascript", "lorem ipsum", "cookie"),
    drop_braces: bool = True,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): per
    document, keep only lines that

    * contain at least ``min_words`` whitespace-separated words,
    * end in a terminal punctuation mark (``terminal``; pass ``()`` to
      disable),
    * contain no ``blocklist`` phrase (case-insensitive — the C4 rules
      drop "javascript" / "lorem ipsum" / cookie-notice boilerplate),
    * contain no curly brace (``drop_braces`` — code leaking into a
      natural-language corpus).

    Returns ``(id_col, n_lines, n_kept, text_clean)`` for every input
    document (documents whose every line fails come back with
    ``n_kept = 0`` and an empty ``text_clean``) — same shape as
    :func:`kg.ops.dedup.paragraph_dedup`, so the two compose.

    Scale shape: pure per-row JVM higher-order functions — zero shuffle,
    zero Python, no explode; the line array is BOUND AS AN ATTRIBUTE in
    its own projection before any lambda touches it (the O(L) vs O(L²)
    winnowing discipline).  The per-line word count splits the LINE
    (the lambda element, already materialized), not the document, so
    total work stays O(document length).  Exact DuckDB twin:
    ``list_filter`` with the identical predicate.
    """
    if min_words < 0:
        raise ValueError(f"min_words must be >= 0, got {min_words}")
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    d = docs.select(F.col(id_col), lines.alias("_ls"))

    def _keep(s: Column) -> Column:
        words = F.size(F.filter(F.split(s, " +"), lambda w: w != ""))
        cond = words >= F.lit(min_words)
        if terminal:
            cond = cond & F.right(s, F.lit(1)).isin(*terminal)
        low = F.lower(s)
        for phrase in blocklist:
            cond = cond & ~low.contains(phrase.lower())
        if drop_braces:
            cond = cond & ~s.contains("{") & ~s.contains("}")
        return cond

    d = d.select(id_col, "_ls", F.filter(F.col("_ls"), _keep).alias("_k"))
    return d.select(
        id_col,
        F.size("_ls").alias("n_lines"),
        F.size("_k").alias("n_kept"),
        F.array_join("_k", "\n").alias("text_clean"),
    )


def corpus_profile(
    docs: DataFrame,
    by: str = "lang",
    text_col: str = "text",
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Per-group corpus profile — the "know your data" pass a training
    run starts from: document count, exact-duplicate ratio (distinct
    normalized fingerprints vs rows), token-count quantiles and
    mean/max, mean char length.

    One hash aggregation, no joins.  The token-count quantiles use
    Spark's EXACT ``percentile`` as a single array call (ONE
    value→count map per group, not one per requested quantile), which
    keeps O(distinct values) state per group: token counts are a small
    bounded integer domain (a 2M-token ceiling bounds the map at 2M
    entries regardless of corpus size), so this holds at 100 TB.  For
    unbounded continuous columns swap in ``percentile_approx`` — the
    trade-off is the oracle twin (quantile_cont) stops matching
    bit-for-bit.

    Engine-portable: md5 fingerprints, 6dp rounding; DuckDB's
    ``quantile_cont`` uses the same ``(n-1)·p`` linear interpolation as
    Spark's exact ``percentile``, so the twin matches exactly.
    """
    from kg.ops.text import doc_fingerprint, token_count

    if not quantiles or any(not 0 <= q <= 1 for q in quantiles):
        raise ValueError(f"quantiles must be in [0,1]: {quantiles!r}")
    base = docs.select(
        F.col(by),
        token_count(F.col(text_col)).alias("_ntok"),
        F.length(F.col(text_col)).alias("_nchars"),
        doc_fingerprint(F.col(text_col)).alias("_fp"),
    )
    agg = base.groupBy(by).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_fp").alias("n_distinct"),
        F.round(F.avg("_ntok"), 6).alias("avg_tokens"),
        F.max("_ntok").alias("max_tokens"),
        F.round(F.avg("_nchars"), 6).alias("avg_chars"),
        F.percentile("_ntok", F.lit(list(quantiles))).alias("_q"),
    )
    qcols = [
        F.round(F.col("_q")[i], 6).alias(f"tokens_p{round(q * 100)}")
        for i, q in enumerate(quantiles)
    ]
    return agg.select(
        by,
        "n_docs",
        "n_distinct",
        F.round(
            F.lit(1.0) - F.col("n_distinct") / F.col("n_docs"), 6
        ).alias("dup_ratio"),
        "avg_tokens",
        "max_tokens",
        "avg_chars",
        *qcols,
    )


def weighted_sample(
    docs: DataFrame,
    rates: dict[str, float],
    by: str = "lang",
    id_col: str = "doc_id",
    seed: str = "kg-mix-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group Bernoulli sampling — the domain up/down
    mixing step of a pretraining data recipe ("keep 100% of group X,
    30% of group Y"): a doc survives iff its md5 bucket falls under its
    group's rate threshold.

    Pure map-side (zero shuffle, no RNG state): the same doc makes the
    same keep/drop decision on every run, every engine, and any corpus
    partitioning, and assignments are stable under corpus growth — the
    properties :func:`split_assign` guarantees, extended to per-group
    rates.  Rates are exact in expectation (binomial around ``rate``),
    which is what mixing recipes specify; for exact per-group QUOTAS use
    :func:`stratified_sample` (costs a per-stratum sort).

    Groups absent from ``rates`` get ``default_rate`` (default: dropped
    — a recipe enumerates what it wants).
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0,1]: {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1]: {default_rate}")
    bucket = split_bucket(F.col(id_col), seed)
    thresh: Column = F.lit(int(round(default_rate * 1_000_000)))
    for g, r in rates.items():
        thresh = F.when(
            F.col(by) == F.lit(g), F.lit(int(round(r * 1_000_000)))
        ).otherwise(thresh)
    return docs.where(bucket < thresh)


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """DSIR data-selection importance weights (Xie et al., NeurIPS
    2023): per document, the average log-likelihood ratio of its hashed
    unigram features under the TARGET-domain distribution vs the RAW
    corpus distribution — the signal "does this raw document look like
    the domain I want to train on".  A recipe keeps the top-weighted
    slice (or samples proportionally); pairing with
    :func:`split_assign`-style thresholds makes the selection
    deterministic.

    Output ``(id_col, n_tokens, log_ratio)`` for every input doc;
    positive = target-like, negative = raw-corpus-like, zero-token docs
    get 0.0.  Hashed features: token → ``md5_60 % buckets`` (the
    engine-portable hash family every twin here uses — the paper's
    hashed n-gram trick, n=1, exists exactly so the feature space stays
    fixed-size at any corpus scale).  Laplace-smoothed (add-one over
    ``buckets``) so unseen-in-target features score finitely; the
    per-token AVERAGE (not the paper's raw sum) keeps the score
    length-invariant — otherwise long documents dominate any threshold
    — and is 6dp-rounded like :func:`lm_score` (the repo float
    contract; both choices documented, the sum is one ``F.sum`` away).

    Plan shape (100 TB): one explode per corpus into bucket ids (pure
    map-side hash), TWO bucket-space hash aggs (≤ ``buckets`` rows
    each — map-side combine collapses everything), totals as lazy 1-row
    broadcast scalars, the ≤ ``buckets``-row ratio dim broadcast-gated
    onto the doc token stream, one per-doc hash agg.  The target corpus
    is read once; no self-join, no Python, no window."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    b = F.pmod(md5_60(F.col("token")), F.lit(buckets)).alias("b")
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    ).select(id_col, b)
    rawd = toks.groupBy("b").agg(F.count("*").alias("cr"))
    n_raw = rawd.agg(F.sum("cr").alias("nr"))
    tgt = (
        target.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .select(b)
        .groupBy("b")
        .agg(F.count("*").alias("ct"))
    )
    n_tgt = tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    dim = (
        rawd.join(maybe_broadcast(tgt), "b", "left")
        .crossJoin(F.broadcast(n_raw))
        .crossJoin(F.broadcast(n_tgt))
        .select(
            "b",
            (
                F.log((F.coalesce("ct", F.lit(0)) + 1) / (F.col("nt") + buckets))
                - F.log((F.col("cr") + 1) / (F.col("nr") + buckets))
            ).alias("lr"),
        )
    )
    scored = (
        toks.join(maybe_broadcast(dim), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("lr"), 6).alias("log_ratio"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("log_ratio", F.lit(0.0)).alias("log_ratio"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping fixed-size token chunking — the context-window carve
    every RAG / long-document training pipeline runs before embedding or
    packing: → ``(id, chunk_idx, start_tok, n_tok, chunk_text)``, one
    row per window of ``window`` tokens starting every ``stride`` tokens
    (``window − stride`` tokens of overlap preserve cross-boundary
    context).

    Chunk rule (deterministic, engine-portable): starts are the stride
    multiples 0, s, 2s, …; a start is emitted iff it is 0 or the
    PREVIOUS chunk did not already reach the end of the document
    (``start < n − (window − stride)``) — so the tail is always covered
    exactly once and no fully-contained redundant tail chunk is emitted
    (with ``stride == window`` this is plain disjoint blocking, partial
    tail kept).  ``chunk_idx = start div stride`` — exact integer
    arithmetic.  Empty/token-less documents emit no chunks.
    Tokenization is the repo-wide :func:`kg.ops.text.tokens_col`
    contract, so chunk text joins back to every other text op.

    Plan shape (100 TB): ONE map-side pass — tokens, stride sequence,
    one explode bounded by ceil(n/stride) rows per doc, array slice per
    row; no shuffle, no Python.  The token array is bound as an
    attribute before the explode (the repo's HOF/Generate discipline,
    ``kg/hints.py``)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if stride < 1 or stride > window:
        raise ValueError(
            f"stride must be in [1, window={window}], got {stride}"
        )
    overlap = window - stride
    d = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    ).select(
        id_col,
        "_toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("_toks") - 1, F.lit(0)),
                F.lit(stride),
            )
        ).alias("start_tok"),
    )
    kept = d.filter(
        (F.col("start_tok") < F.size("_toks"))
        & (
            (F.col("start_tok") == 0)
            | (F.col("start_tok") < F.size("_toks") - F.lit(overlap))
        )
    )
    chunk = F.slice("_toks", F.col("start_tok") + 1, window)
    return kept.select(
        id_col,
        F.expr(f"start_tok div {stride}").cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.size(chunk).alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def span_census(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_docs: int = 2,
    top: int = 100,
) -> DataFrame:
    """Cross-document duplicated-span census → ``(rank, gram, n_docs)``:
    the ``top`` word ``n``-grams appearing in at least ``min_docs``
    DISTINCT documents, most-shared first — the span-granularity
    duplication diagnostic of Lee et al. 2021 ("Deduplicating Training
    Data Makes Language Models Better"): it names the boilerplate,
    license headers and viral quotes that doc-level dedup keeps and a
    span-level pass would cut, and sizes the problem before you pay for
    one.

    Counting is per-document PRESENCE (grams dedup in-array before the
    explode, the :func:`decontaminate` discipline), and the count/top-k
    phase touches only 8-byte md5-60 longs — the gram STRINGS are
    column-pruned out of the aggregation and recovered afterwards for
    just the ``top`` winners via a broadcast semi-join + min(gram)
    representative (min also settles the astronomically-unlikely hash
    collision deterministically; the count then conflates the colliding
    spans, documented).  Ordering is (n_docs desc, gh asc) — the hash
    tie-break is portable because md5 is.

    Plan shape (100 TB): one explode + ONE long-keyed hash agg
    (map-side combined) + a distributed TakeOrdered of ``top`` rows +
    one broadcast-gated recovery join over a second gram pass — two
    corpus passes total, no string shuffle, no corpus-wide window.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    from pyspark.sql import Window

    d = docs.select(
        F.col(id_col).alias("_id"), tokens_col(F.col(text_col)).alias("_t")
    )
    d = d.select("_id", _ngrams_of(F.col("_t"), n).alias("_g"))
    gh_rows = d.select("_id", F.explode("_g").alias("gram")).select(
        "gram", md5_60(F.col("gram")).alias("gh")
    )
    counts = (
        gh_rows.groupBy("gh")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    topk = counts.orderBy(F.desc("n_docs"), F.asc("gh")).limit(top)
    rep = (
        gh_rows.join(maybe_broadcast(topk), "gh")
        .groupBy("gh", "n_docs")
        .agg(F.min("gram").alias("gram"))
    )
    w = Window.orderBy(F.desc("n_docs"), F.asc("gh"))
    return rep.select(
        F.row_number().over(w).alias("rank"), "gram", "n_docs"
    )


def temperature_mix_weights(
    docs: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based sampling weights per ``group_col`` →
    ``(group_col, n_docs, weight, boost)``: the multilingual
    rebalancing rule of mBERT / XLM-R — sample group g with
    probability ``p_g ∝ n_g^α`` instead of its natural share, so
    low-resource groups are up-sampled (α < 1 flattens the mix;
    α = 1 is the natural distribution).  ``weight`` is the normalized
    sampling probability; ``boost = weight / natural share`` is the
    expected per-doc duplication factor a sampler applies (the number
    the curate CLI's ``--mix g=r`` ratios come from).

    Exactness contract: α is restricted to {0.25, 0.5, 0.75, 1.0} so
    ``n^α`` is a chain of IEEE-754 ``sqrt`` calls (correctly rounded
    by the standard on every engine — the ``negative_samples``
    precedent), fix-pointed to ⌊10⁶·n^α⌋ BEFORE the normalizing sum
    (integer sums are association-order-free); the two divisions that
    produce ``weight`` and ``boost`` are single IEEE ops, rounded to
    6 dp.  Bit-exact cross-engine, any partitioning.

    Plan shape (100 TB): one group-count hash agg (vocabulary-sized
    output), the normalizer as a lazy 1-row broadcast-joined scalar —
    no window over the corpus, no Python.
    """
    if group_col not in docs.columns:
        raise ValueError(f"column {group_col!r} not in frame")
    if alpha not in (0.25, 0.5, 0.75, 1.0):
        raise ValueError(
            f"alpha must be one of 0.25/0.5/0.75/1.0 (exact sqrt chains), "
            f"got {alpha}"
        )
    n = F.col("n_docs").cast("double")
    if alpha == 1.0:
        damped = n
    elif alpha == 0.5:
        damped = F.sqrt(n)
    elif alpha == 0.25:
        damped = F.sqrt(F.sqrt(n))
    else:  # 0.75 = sqrt · sqrt∘sqrt, one product rounding
        damped = F.sqrt(n) * F.sqrt(F.sqrt(n))
    counts = docs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    d = counts.withColumn(
        "_dfp", F.floor(damped * F.lit(1_000_000)).cast("long")
    )
    totals = d.agg(
        F.sum("_dfp").alias("_tot"), F.sum("n_docs").alias("_n_total")
    )
    return (
        d.crossJoin(F.broadcast(totals))
        .select(
            group_col,
            "n_docs",
            F.round(
                F.col("_dfp").cast("double") / F.col("_tot").cast("double"),
                6,
            ).alias("weight"),
            F.round(
                (F.col("_dfp").cast("double") / F.col("_tot").cast("double"))
                / (
                    F.col("n_docs").cast("double")
                    / F.col("_n_total").cast("double")
                ),
                6,
            ).alias("boost"),
        )
    )


def split_leakage(
    docs: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
) -> DataFrame:
    """Cross-split duplicate-leakage audit →
    ``(split_a, split_b, n_groups, n_docs_a, n_docs_b)`` per ordered
    split pair: how many exact-duplicate text groups span both splits,
    and how many member docs sit on each side — the Lee et al. 2022
    train/test leakage check (a dup crossing train→test inflates eval
    scores; :func:`decontaminate` guards against an EXTERNAL benchmark,
    this audits the corpus's own carve).  ``n_docs_b`` for a
    ``(train, test)`` row is the actionable number: test docs whose
    text the model saw in training.

    Plan shape (100 TB): docs collapse to md5(text) keys in one hash
    agg (group-sized output); the pair expansion is an equi-join of
    that dup-group frame with itself — ≤ |splits| rows per key, so
    fan-out is bounded by |splits|² regardless of corpus size.  For
    NEAR-dup leakage run the same audit keyed on a MinHash band key
    (:mod:`kg.ops.minhash`) instead of md5(text).
    """
    for c in (split_col, text_col):
        if c not in docs.columns:
            raise ValueError(f"column {c!r} not in frame")
    per = (
        docs.select(F.md5(F.col(text_col)).alias("_k"), F.col(split_col))
        .groupBy("_k", split_col)
        .agg(F.count("*").cast("long").alias("_n"))
    )
    a = per.select(
        "_k", F.col(split_col).alias("split_a"), F.col("_n").alias("_na")
    )
    b = per.select(
        "_k", F.col(split_col).alias("split_b"), F.col("_n").alias("_nb")
    )
    return (
        a.join(b, "_k")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("_na").cast("long").alias("n_docs_a"),
            F.sum("_nb").cast("long").alias("n_docs_b"),
        )
    )
