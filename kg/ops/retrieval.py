"""Full-text retrieval over the document corpus.

The lexical counterpart to ``kg/ops/similarity.py``'s embedding ANN
surface: score documents against a set of keyword queries with BM25
(Robertson–Spärck Jones / Okapi, the default ranking function of every
production search engine) and return the top-k documents per query.

Determinism contract (same discipline as ``kg/ops/graph.py``'s
fixed-point centralities): exactly ONE transcendental per term — the
idf, fixed-pointed to BIGINT micro-units the moment it is computed —
after which every multiply/divide/sum is exact integer arithmetic
(decimal(38,0) for the overflow-safe multiply-divide, ``div`` for the
exact floor), so per-query scores are association-order-free and carry
a bit-exact DuckDB twin.

Reference parity note: the reference engine (syedhassaanahmed/
neo-to-cosmos) delegates querying of the migrated graph to its sink;
text retrieval over document properties is part of this repo's §2.1
new-engine surface (SURVEY.md), not a translation of any reference
file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg.hints import maybe_broadcast
from kg.ops.text import tokens_col

_DEC = "decimal(38,0)"


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 (k1 = 1.2, b = 0.75, the
    Robertson defaults) → ``(query_id, <id_col>, score_fp, rank)``.

    Scoring rule, made engine-portable:

    * ``idf_fp = floor(10^6 · ln((2N + 2) / (2·df + 1)))`` — the Lucene
      form ``ln(1 + (N − df + ½)/(df + ½))`` rewritten over integers so
      the only float input to ``ln`` is an exactly-representable ratio;
      fixed-pointed immediately (the ``adamic_adar`` discipline).
    * tf saturation with k1 = 6/5, b = 3/4 is exactly rational:
      ``tf / (tf + k1(1 − b + b·dl/avgdl))
      = 10·T·tf / (10·T·tf + 3·T + 9·dl·N)``
      with ``T`` = total corpus tokens, ``N`` = docs, ``dl`` = doc
      length — integers end to end.
    * per-term weight ``w_fp = (idf_fp · num) div den`` computed in
      decimal(38,0) with SQL ``div`` (exact floor, no rounded decimal
      division); per-(query, doc) score is a plain BIGINT sum of
      ``w_fp`` — association-order-free.
    * ranking on ``score_fp`` desc with doc-id-asc tie-break, so the
      top-k SET is reproducible across engines.

    Plan shape (100 TB): one map-side pass computes per-doc token
    arrays + lengths; corpus stats (N, T) are a 1-row lazy
    broadcast-joined scalar (no driver action); the QUERY VOCABULARY
    is broadcast-semi-joined into the exploded token stream BEFORE the
    tf aggregation, so the posting agg, the df dim and the score join
    all touch only query-relevant terms — the full-corpus work is one
    narrow explode + filter; top-k is a per-query window over candidate
    docs only.  Query terms are deduped in-array (a repeated query term
    scores once, the set-of-terms convention).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    body = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    ).select(id_col, "_toks", F.size("_toks").alias("dl"))
    stats = body.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_toks"),
    )

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(tokens_col(F.col(query_text_col)))
        ).alias("token"),
    )
    vocab = qterms.select("token").distinct()

    # postings restricted to the query vocabulary BEFORE aggregation —
    # the semi-join predicate rides the exploded stream map-side when
    # the vocab broadcasts (it is |query terms| ≪ |corpus|)
    # dl rides the exploded stream and joins the grouping key (it is
    # functionally dependent on the doc id, so it adds no groups) —
    # this saves a corpus-sized dl-dim join after the aggregation
    tf = (
        body.select(F.col(id_col), "dl", F.explode("_toks").alias("token"))
        .join(maybe_broadcast(vocab), "token", "left_semi")
        .groupBy(id_col, "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_dim = (
        tf.groupBy("token")
        .agg(F.count("*").alias("df"))  # one row per (doc, token) above
        .crossJoin(F.broadcast(stats))
        .select(
            "token",
            F.floor(
                F.lit(1000000.0)
                * F.log(
                    (2.0 * F.col("n_docs") + 2.0)
                    / (2 * F.col("df") + 1).cast("double")
                )
            )
            .cast("long")
            .alias("idf_fp"),
            "n_docs",
            "total_toks",
        )
    )

    num = (
        F.lit(10).cast(_DEC)
        * F.col("total_toks").cast(_DEC)
        * F.col("tf").cast(_DEC)
    )
    den = (
        num
        + F.lit(3).cast(_DEC) * F.col("total_toks").cast(_DEC)
        + F.lit(9).cast(_DEC)
        * F.col("dl").cast(_DEC)
        * F.col("n_docs").cast(_DEC)
    )
    weights = (
        tf.join(maybe_broadcast(df_dim), "token")
        .select(
            id_col,
            "token",
            (F.col("idf_fp").cast(_DEC) * num).cast(_DEC).alias("_prod"),
            den.cast(_DEC).alias("_den"),
        )
        .select(
            id_col,
            "token",
            F.expr("_prod div _den").cast("long").alias("w_fp"),
        )
    )

    scored = (
        qterms.join(weights, "token")
        .groupBy("query_id", id_col)
        .agg(F.sum("w_fp").alias("score_fp"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", id_col, "score_fp", F.col("_rn").alias("rank"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    of N per-query rankings → ``(query_col, id_col, legs, rrf_fp,
    rank)`` — the standard hybrid-retrieval combiner (lexical BM25 +
    embedding ANN, or any mix of rankers) that needs only RANKS, never
    commensurable scores.

    Exactness contract: each leg contributes
    ``1_000_000 div (rrf_k + rank)`` — integer floor division, no
    float anywhere — so the fused score is an association-order-free
    BIGINT sum and the op carries a bit-exact DuckDB twin
    (``1000000 // (rrf_k + rank)``).  ``legs`` counts how many input
    rankings surfaced the document (the agreement signal callers
    threshold on).  Final ranking: fused score desc, id asc — the
    reproducible-top-k tie-break used across this repo.

    Plan shape (100 TB): each input ranking is already top-k-per-query
    (O(queries·k) rows — tiny relative to the corpora that produced
    them), so the fusion is one union + ONE hash agg + a per-query
    window over ≤ N·k candidates.  No corpus-sized frame is touched.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rrf_k < 0:
        raise ValueError(f"rrf_k must be >= 0, got {rrf_k}")
    legs = []
    for r in rankings:
        missing = {query_col, id_col, rank_col} - set(r.columns)
        if missing:
            raise ValueError(f"ranking missing columns {sorted(missing)}")
        legs.append(
            r.select(
                query_col,
                id_col,
                F.expr(
                    f"1000000 div ({rrf_k} + cast(`{rank_col}` as bigint))"
                ).alias("_contrib"),
            )
        )
    u = legs[0]
    for extra in legs[1:]:
        u = u.unionByName(extra)
    fused = u.groupBy(query_col, id_col).agg(
        F.count("*").cast("int").alias("legs"),
        F.sum("_contrib").alias("rrf_fp"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_fp").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(query_col, id_col, "legs", "rrf_fp", F.col("_rn").alias("rank"))
    )


def rbo_weights_fp(p: float = 0.5, depth: int = 5) -> list[int]:
    """Per-match RBO weights, fix-pointed to nano-units: a doc whose
    worse rank is m contributes ``Σ_{d=m..depth} (1−p)·p^{d−1}/d`` to
    truncated RBO@depth (it sits in both depth-d prefixes for every
    d ≥ m).  Computed once driver-side and inlined as literals on BOTH
    engines, so the distributed sum is pure integers."""
    if not 0 < p < 1:
        raise ValueError(f"p must be in (0, 1), got {p}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    return [
        round(sum((1 - p) * p ** (d - 1) / d for d in range(m, depth + 1)) * 1_000_000_000)
        for m in range(1, depth + 1)
    ]


def rank_biased_overlap(
    run_a: DataFrame,
    run_b: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    p: float = 0.5,
    depth: int = 5,
) -> DataFrame:
    """Truncated rank-biased overlap (Webber et al. 2010) between two
    per-query rankings → ``(query_col, n_common, rbo)``: the
    top-weighted agreement measure used to compare retrieval systems
    (here: is the cheap ANN leg returning what the exact leg returns?).
    Identical depth-``depth`` lists score ``1 − p^depth``; disjoint
    lists produce no row (inner-join semantics — absent ⇒ zero
    agreement).

    Exactness: the per-depth intersection sum telescopes per MATCH —
    a shared doc with worse-rank m contributes the constant
    ``W(m) = Σ_{d≥m} (1−p)p^{d−1}/d`` — so RBO is ONE equi-join on
    (query, doc) + one hash agg of integer nano-unit weights
    (:func:`rbo_weights_fp`); only the final /1e9 is float (6 dp).
    No per-depth scans, no prefix explosion.
    """
    w_fp = rbo_weights_fp(p, depth)
    for c in (query_col, id_col, rank_col):
        if c not in run_a.columns or c not in run_b.columns:
            raise ValueError(f"column {c!r} missing from a run")
    a = run_a.filter(F.col(rank_col) <= depth).select(
        query_col, id_col, F.col(rank_col).alias("_ra")
    )
    b = run_b.filter(F.col(rank_col) <= depth).select(
        query_col, id_col, F.col(rank_col).alias("_rb")
    )
    m = F.greatest("_ra", "_rb").cast("int")
    weights = F.array(*[F.lit(w).cast("long") for w in w_fp])
    matched = a.join(b, [query_col, id_col]).select(
        query_col, F.element_at(weights, m).alias("_w")
    )
    return (
        matched.groupBy(query_col)
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum("_w").cast("long").alias("_fp"),
        )
        .select(
            query_col,
            "n_common",
            F.round(F.col("_fp").cast("double") / F.lit(1e9), 6).alias(
                "rbo"
            ),
        )
    )
