"""Similarity search over an embedding column (array<float|double>).

Two paths:

* ``brute_force_topk`` — exact cosine top-k, queries × corpus.  The dot
  product is pure JVM (``zip_with`` + ``aggregate``); the corpus side
  stays partitioned, the (small) query side is broadcast.  Baseline and
  oracle-checkable.
* ``lsh_ann_topk`` / ``banded_lsh_pairs`` — approximate path built on
  **banded random-hyperplane LSH (OR-of-ANDs)**, the same band structure
  ``kg.ops.minhash`` uses for Jaccard: ``planes`` sign bits are split
  into ``bands`` keys of ``planes/bands`` bits; two vectors are
  candidates when they agree on ANY band (OR across bands, AND within a
  band).  An AND-only signature's recall collapses as ``p_bit^planes``;
  banding keeps recall ≈ ``1-(1-p_bit^r)^bands`` while the per-band key
  still prunes the bucket join.  Candidates are then re-ranked with the
  EXACT cosine, so precision is exact and only recall is approximate.

Scale notes (100 TB):
* the bucket self-join is the only quadratic-risk spot; a ``max_bucket``
  cap drops degenerate buckets (e.g. all-zero vectors) exactly like the
  minhash path;
* hyperplanes are sha256-derived literals — deterministic across
  executors AND SQL-expressible, so the whole operator has a DuckDB twin;
* selectivity physics: with ``r = planes/bands`` bits per band, a random
  (orthogonal) pair collides per band with prob ``2^-r`` — near-dup
  detection (cos ≥ 0.9) wants r≈8; ANN over mid-cosine neighbors wants
  r≈4 and accepts more candidates.  There is NO multiprobe here; recall
  comes from the OR over bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# NOTE (measured, r3): unrolling the literal-plane dot into 64 explicit
# element_at multiply-adds per plane — hoping to escape interpreted
# higher-order-fn lambdas — made banded queries ~5× SLOWER (ann_lsh
# 4.6 s → 26.9 s at sf0.1): 2048-term expression trees per projection
# overwhelm codegen/analysis.  The aggregate(zip_with) form below is the
# fast shape; keep it.


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _cosine_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Exact cosine as an UNROLLED codegen expression for ``dim``-wide
    vectors, with the interpreted HOF fold as a guarded fallback for any
    row whose arrays are not exactly ``dim`` long — so the value is
    bit-identical to :func:`_cosine` on EVERY input (equivalence-tested).

    The three accumulations are left-associated chains seeded with 0.0 —
    the same IEEE operation sequence as ``aggregate(zip_with(...))`` —
    built from ``F.get`` element accesses, which whole-stage codegen
    compiles to plain array reads: ~3·dim fused ops per row instead of
    ~3·dim *interpreted lambda invocations*.  (Unrolling the banded LSH
    *projections* this way is a measured dead end — 64 planes × dim
    terms per row overwhelm codegen, see the module note — but one
    cosine is ~3·dim terms, well inside codegen's comfort zone; measured
    bit-identical and faster than both the HOF fold and the Arrow
    crossing on the sf1.0 candidate re-rank.)  Null elements propagate
    to a NULL dot exactly like ``zip_with``; the guard keeps
    short/long/null arrays on the HOF path, whose padding semantics the
    unrolled form cannot reproduce."""

    def dot(x: Column, y: Column) -> Column:
        acc = F.lit(0.0)
        for j in range(dim):
            acc = acc + F.get(x, j) * F.get(y, j)
        return acc

    fast = dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), fast
    ).otherwise(_cosine(a, b))


def _pair_cosine_arrow(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    va_col: str = "va",
    vb_col: str = "vb",
) -> DataFrame:
    """(a, b, va, vb) → (a, b, cosine double) via one vectorized numpy
    pass per Arrow batch — the re-rank engine for candidate-pair scoring.

    Bit-identical to the ``_cosine`` expression (equivalence-tested):
    the accumulations iterate dimensions LEFT-TO-RIGHT starting from a
    0.0 accumulator, the exact IEEE operation sequence of
    ``aggregate(zip_with(a, b, *), 0.0, acc + v)``, so every double —
    including the sign of a ±0.0 dot — matches the JVM fold and the
    DuckDB twin.  Null/length-mismatched vectors score NaN here where
    the JVM scores NULL; both are dropped by the caller's
    ``(cosine >= θ) & ~isnan(cosine)`` filter (NULL fails the
    comparison, NaN fails the isnan guard), so no observable row
    differs.  NaN/null *elements* propagate to a NaN cosine on both
    engines (Arrow surfaces a null element as NaN in the row array).

    Why Python at all: the interpreted higher-order-fn cosine costs
    ~3×dim lambda evaluations per pair — at the sf1.0 bench's 7.2M
    LSH candidates that was the whole query's dominant term (guide
    §4.2: hand whole batches to vectorized native code).  Only the four
    needed columns cross the boundary."""
    a_type = pairs.schema[a_col].dataType.simpleString()
    b_type = pairs.schema[b_col].dataType.simpleString()
    out_schema = f"{a_col} {a_type}, {b_col} {b_type}, cosine double"

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            va, vb = pdf[va_col].tolist(), pdf[vb_col].tolist()
            la = np.fromiter(
                (len(v) if v is not None else -1 for v in va),
                dtype=np.int64, count=n,
            )
            lb = np.fromiter(
                (len(v) if v is not None else -1 for v in vb),
                dtype=np.int64, count=n,
            )
            cos = np.full(n, np.nan, dtype=np.float64)
            valid = (la >= 0) & (la == lb)
            with np.errstate(invalid="ignore", divide="ignore"):
                for length in np.unique(la[valid]):
                    idx = np.flatnonzero(valid & (la == length))
                    if length == 0:
                        continue  # 0.0 / (0·0) → NaN, the prefilled value
                    A = np.stack(
                        [np.asarray(va[i], dtype=np.float64) for i in idx]
                    )
                    B = np.stack(
                        [np.asarray(vb[i], dtype=np.float64) for i in idx]
                    )
                    dot = np.zeros(len(idx), dtype=np.float64)
                    na = np.zeros(len(idx), dtype=np.float64)
                    nb = np.zeros(len(idx), dtype=np.float64)
                    for j in range(int(length)):
                        dot = dot + A[:, j] * B[:, j]
                        na = na + A[:, j] * A[:, j]
                        nb = nb + B[:, j] * B[:, j]
                    cos[idx] = dot / (np.sqrt(na) * np.sqrt(nb))
            yield pd.DataFrame(
                {a_col: pdf[a_col], b_col: pdf[b_col], "cosine": cos}
            )

    return pairs.select(a_col, b_col, va_col, vb_col).mapInPandas(
        run, schema=out_schema
    )


def cap_buckets(df: DataFrame, key_cols: list[str], max_bucket: int) -> DataFrame:
    """Web-scale guard shared by every band/bucket join in the library:
    drop rows whose bucket holds more than ``max_bucket`` members before
    any self- or probe-join.  A degenerate bucket (empty docs, all-zero
    vectors, boilerplate) carries no selectivity — joining through it is
    quadratic in corpus size; members are better served by exact dedup.
    One definition keeps the four call sites AND their SQL-oracle
    replicas in lockstep."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("_bucket_n"))
    return df.join(
        counts.filter(F.col("_bucket_n") <= max_bucket).drop("_bucket_n"),
        key_cols,
        "inner",
    )


def plane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (hash-derived, no RNG state).

    Public so the DuckDB oracle can embed the identical literals."""
    import struct
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.sha256(f"plane:{seed}:{j}".encode()).digest()
        (u,) = struct.unpack(">q", h[:8])
        # 6-decimal components: both engines parse the same short literal
        # to the identical double, and the SQL twin stays compact
        out.append(round(u / float(1 << 63), 6))
    return out


def banded_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int = 64,
    bands: int = 8,
    engine: str = "arrow",
) -> DataFrame:
    """Long-format band keys: one row per (id, band) with the band's
    sign-bit key.  ``dim`` is a parameter (NOT probed from the data —
    a ``.first()`` here would be a hidden eager action at plan time).

    Two engines, bit-identical (equivalence-tested):

    * ``arrow`` (default) — one Arrow-batched numpy pass: all
      ``planes`` projections of a batch in ``dim`` vectorized
      fused-multiply-adds.  The accumulation iterates dims
      LEFT-TO-RIGHT, the exact IEEE operation sequence of the SQL
      fold, so signs — and the DuckDB oracle — are unchanged.
    * ``expr`` — pure-JVM ``aggregate(zip_with)`` per plane.  Kept as
      the independent cross-check and for python-worker-less clusters.
      Higher-order-function lambdas are interpreted per element (not
      codegen), which is why the vectorized path wins despite the
      Arrow crossing; unrolling the dots to scalar expression trees is
      a measured dead end (see module note above).
    """
    if planes % bands or planes // bands < 1:
        raise ValueError(f"planes ({planes}) must be a multiple of bands ({bands})")
    # the signature projection is compute-bound (planes × dim fused
    # multiply-adds per row): spread a coarse input across task slots or
    # a compact parquet corpus (ONE split) serializes it on one core —
    # measured: the entire r2 ann_lsh/dedup_embedding "regression" was
    # this, not the band join.
    from kg.hints import spread_to_slots

    if engine not in ("arrow", "expr"):
        raise ValueError(f"engine must be 'arrow' or 'expr', got {engine!r}")
    df = spread_to_slots(df)
    r = planes // bands
    if engine == "arrow":
        return _banded_signatures_arrow(df, id_col, vec_col, dim, planes, bands)
    v = F.col(vec_col).cast("array<double>")

    def bit(p: int) -> Column:
        w = F.array(*[F.lit(x) for x in plane(dim, p)])
        return F.when(_dot(v, w) >= 0, F.lit("1")).otherwise(F.lit("0"))

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*[bit(b * r + j) for j in range(r)]).alias("key"),
        )
        for b in range(bands)
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _banded_signatures_arrow(
    df: DataFrame, id_col: str, vec_col: str, dim: int, planes: int, bands: int
) -> DataFrame:
    """Arrow engine for ``banded_signatures``: per batch, acc[row, p] is
    built with one vectorized fused-multiply-add per DIMENSION, in dim
    order — the same left-to-right IEEE addition sequence as
    ``aggregate(zip_with(...), 0.0, acc + v)`` and DuckDB's
    ``list_dot_product``, so every sign bit matches both bit-for-bit."""
    import numpy as np

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, band int, key string"
    r = planes // bands
    # one plane() call per plane, then transpose — the naive per-(dim,
    # plane) comprehension recomputes the full sha256-derived plane per
    # element, O(dim² × planes) digests at plan-build time
    w_mat = np.array([plane(dim, p) for p in range(planes)], dtype=np.float64)
    w_rows = list(w_mat.T)  # w_rows[j][p] = plane p's j-th component

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf[vec_col]
            # rows with a NULL vector or a length ≠ dim must match the
            # expr engine, where zip_with pads with nulls → the dot is
            # NULL → every sign test is false → all-'0' keys.  NaN
            # components also match: Spark orders NaN above every
            # double, so a NaN dot yields '1' bits.
            good = np.fromiter(
                (v is not None and len(v) == dim for v in vals),
                dtype=bool,
                count=len(vals),
            )
            bits = np.full((len(vals), planes), "0", dtype="<U1")
            if good.any():
                vecs = np.array(
                    [list(v) for v in vals[good]], dtype=np.float64
                )
                acc = np.zeros((len(vecs), planes), dtype=np.float64)
                for j in range(dim):
                    acc += vecs[:, j : j + 1] * w_rows[j]
                bits[good] = np.where(
                    np.isnan(acc) | (acc >= 0), "1", "0"
                )
            ids = pdf[id_col].to_numpy()
            frames = []
            for b in range(bands):
                sl = bits[:, b * r : (b + 1) * r]
                key = sl[:, 0]
                for j in range(1, r):
                    key = np.char.add(key, sl[:, j])
                frames.append(
                    pd.DataFrame({id_col: ids, "band": b, "key": key})
                )
            yield pd.concat(frames, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(fn, schema=out_schema)


def banded_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int = 64,
    bands: int = 8,
    max_bucket: int = 1024,
    distinct_pairs: bool = True,
) -> DataFrame:
    """→ (a, b) candidate pairs (a < b) sharing ≥1 band key.

    ``max_bucket`` drops degenerate buckets before the self-join (web-
    scale guard, same rationale as kg.ops.minhash.minhash_candidate_pairs).

    ``distinct_pairs=False`` skips the pair-level dedup shuffle and may
    emit one row per SHARED BAND for the same pair: for a caller whose
    downstream filter is highly selective and whose per-pair score is a
    deterministic function of the pair (so duplicates collapse to
    identical rows), deduping after that filter is orders of magnitude
    cheaper — at the sf1.0 bench the distinct removed only 2% of rows
    (7.41M → 7.25M: near-orthogonal pairs rarely agree on two 8-bit
    bands) yet cost a full 7M-row shuffle.  Callers that rank or count
    candidates (knn_graph, top-k windows) MUST keep the default."""
    sigs = banded_signatures(df, id_col, vec_col, dim, planes, bands)
    # consumed by the cap count AND both sides of the self-join
    sigs = sigs.localCheckpoint()
    sigs = cap_buckets(sigs, ["band", "key"], max_bucket)
    x, y = sigs.alias("x"), sigs.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
    )
    return pairs.distinct() if distinct_pairs else pairs


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query. Broadcast the query side; corpus scan
    stays partitioned (spread to the task slots first — the |Q|·|C|
    cosine pass is compute-bound and a compact parquet corpus arrives as
    1-2 splits) → one shuffle (the window top-k).  Scoring runs through
    the vectorized numpy cosine (``_pair_cosine_arrow``, bit-identical
    IEEE sequence to the HOF fold); rank/tie/NaN semantics stay in the
    JVM window."""
    from pyspark.sql import Window as W

    from kg.hints import maybe_broadcast, spread_to_slots

    q = maybe_broadcast(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = spread_to_slots(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
    )
    paired = c.crossJoin(q).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.col("qv").cast("array<double>").alias("_qv"),
        F.col("cv").cast("array<double>").alias("_cv"),
    )
    scored = _pair_cosine_arrow(
        paired, a_col="query_id", b_col="neighbor_id",
        va_col="_qv", vb_col="_cv",
    ).withColumn("cosine", F.round("cosine", 6))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        # a zero-norm vector has no direction: its cosine is NaN, which
        # Spark orders ABOVE every double — unguarded it would be the
        # rank-1 "neighbor" of every query.  Mirrored in each SQL twin.
        scored.filter(~F.isnan("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    nprobe: int = 1,
    engine: str = "arrow",
) -> DataFrame:
    """→ (id, cid): each vector's ``nprobe`` nearest centroids.

    ``centroids`` columns: (cid, cv).  K is small → broadcast
    nested-loop join (K cosines per row), then a top-nprobe window keyed
    on (cosine desc, cid asc) — the tie-break is total, so the
    assignment is deterministic and SQL-twinnable.

    The corpus side is ``spread_to_slots`` first: the K-cosines pass is
    compute-bound and a compact parquet corpus arrives as one or two
    splits, serializing the whole assignment onto as many cores (the
    repo's documented coarse-input trap; measured — this WAS most of
    ann_ivf's bench time).  ``engine="arrow"`` (default) scores the
    crossed pairs with the vectorized numpy cosine
    (:func:`_pair_cosine_arrow` — the JVM fold's exact IEEE accumulation
    sequence, bit-identical and equivalence-tested); ``"expr"`` keeps
    the interpreted higher-order-fn fold as the cross-check.  The
    rank/tie/NaN semantics live in the unchanged JVM window either
    way."""
    from pyspark.sql import Window as W

    from kg.hints import maybe_broadcast, spread_to_slots

    if engine not in ("arrow", "expr"):
        raise ValueError(f"engine must be 'arrow' or 'expr', got {engine!r}")
    crossed = spread_to_slots(
        df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        )
    ).crossJoin(maybe_broadcast(centroids))
    if engine == "arrow":
        scored = _pair_cosine_arrow(
            crossed, a_col=id_col, b_col="cid", va_col="_v", vb_col="cv"
        ).withColumnRenamed("cosine", "_c")
    else:
        scored = crossed.select(
            id_col,
            "cid",
            _cosine(F.col("_v"), F.col("cv")).alias("_c"),
        )
    w = W.partitionBy(id_col).orderBy(F.desc("_c"), F.asc("cid"))
    return (
        # zero-norm vectors (NaN cosine to every centroid) get NO cell —
        # they are unindexable, not members of an arbitrary NaN-tie cell
        scored.filter(~F.isnan("_c"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= nprobe)
        .select(id_col, "cid")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the cell-probe counterpart
    of ``lsh_ann_topk``.

    ``centroids`` (cid, cv) partition the space; every corpus vector is
    assigned to its single nearest cell, queries probe their ``nprobe``
    nearest cells, and candidates are re-ranked with the EXACT cosine —
    so precision is exact and recall is the probability the true
    neighbor's cell is among the query's probed cells.

    Scale shape (100 TB): the corpus-side assignment is one broadcast-NL
    pass (K cosines/row in codegen) + one window shuffle; the candidate
    join is an equi-join on cid, so the work is Σ|probed cells| — never
    all-pairs.  Unlike an LSH band key, centroids PARTITION the space
    (cells are ~|corpus|/K), so there is no degenerate-key quadratic
    mode; k_cells scales cell size down as the corpus grows.  The
    centroid set is caller-supplied: swap the deterministic selection
    used in the driver entry for k-means output without touching the
    plan."""
    from pyspark.sql import Window as W

    from kg.hints import DEFAULT_MAX_BYTES, plan_size_bytes

    qv = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv"))
    cv = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv_raw"))
    qcells = ivf_assign(qv, "query_id", "qv", centroids, nprobe=nprobe)
    ccells = ivf_assign(cv, "neighbor_id", "cv_raw", centroids, nprobe=1)
    # the query-cell side is |queries| × nprobe rows of (id, cid) — small
    # in the top-k use, but "queries" is caller-supplied (an all-pairs
    # use passes the corpus), so the hint is GATED on evidence (kg.hints
    # rule: an asserted hint on a big side OOMs instead of degrading).
    # qcells itself sits behind a window, which reports no size estimate;
    # its size is bounded by nprobe × |qv|, so the gate reads the
    # PRE-window query frame's Catalyst stats instead.  Unprovable →
    # no hint, AQE decides; the corpus cell table always stays
    # partitioned.
    q_bytes = plan_size_bytes(qv)
    q_small = q_bytes is not None and q_bytes * max(nprobe, 1) <= DEFAULT_MAX_BYTES
    hint = F.broadcast if q_small else (lambda d: d)
    cand = (
        hint(qcells).join(ccells, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(hint(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine(
                    F.col("qv").cast("array<double>"),
                    F.col("cv_raw").cast("array<double>"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.filter(~F.isnan("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    planes: int = 32,
    bands: int = 8,
    max_bucket: int = 1024,
) -> DataFrame:
    """Approximate top-k: banded hyperplane buckets (OR-of-ANDs), exact
    cosine re-rank inside the candidate set.

    Recall per true neighbor at bit-agreement prob p is
    ``1-(1-p^r)^bands`` (r = planes/bands): high for angularly-close
    neighbors, degrading toward orthogonality — the inherent LSH
    trade; ``bands``/``planes`` tune recall vs candidate volume.

    ``max_bucket`` caps the CORPUS side of the band join: with r = 4
    bits per band a mildly clustered corpus puts a large fraction of
    rows into one 16-value band key and the candidate set becomes
    |queries| × |bucket| — quadratic in corpus size.  Degenerate
    buckets are dropped before the join, same guard as
    ``banded_lsh_pairs`` (a neighbor lost this way was sharing its
    band with >max_bucket rows, i.e. the band carried no selectivity).
    """
    from pyspark.sql import Window as W

    qv = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv"))
    cv = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    qs = banded_signatures(qv, "query_id", "qv", dim, planes, bands)
    cs = banded_signatures(cv, "neighbor_id", "cv", dim, planes, bands)
    # consumed twice (bucket-count cap + the band join)
    cs = cs.localCheckpoint()
    cs = cap_buckets(cs, ["band", "key"], max_bucket)
    cand = (
        qs.join(cs, ["band", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    from kg.hints import maybe_broadcast

    scored = (
        cand.join(maybe_broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.filter(~F.isnan("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance, left-to-right fold (the same IEEE operation
    sequence as the zip_with cosine above)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def subvectors(vec: Column, m: int, dim: int) -> Column:
    """``vec`` split into ``m`` contiguous subvectors of ``dim/m`` dims
    (the PQ decomposition).  Pure array slicing — shared by the encode
    and query paths so both sides of every distance see identical
    subspace boundaries."""
    d = dim // m
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.slice(vec, j * d + 1, d),
    )


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebook: DataFrame,
    m: int,
    dim: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Product-quantization encoding (Jégou et al., TPAMI 2011): each
    vector is compressed to ``m`` small integers — per subspace, the id
    of the nearest codebook entry.  → ``(id, sub, code)`` rows.

    ``codebook`` columns: ``(sub, code, cv)`` with ``cv`` an
    ``array<double>`` of ``dim/m`` dims — caller-supplied, so a trained
    (k-means-per-subspace) codebook drops in without touching the plan,
    exactly the :func:`ivf_topk` centroid contract.

    This is THE memory lever for corpus-scale ANN: at ``m=8`` one byte
    per code stores a 64-dim float vector in 8 bytes instead of 256 —
    the difference between an in-memory index and a disk-bound one at
    10^11 vectors.

    Plan shape: one m-wise explode of the corpus (rows × m — the
    encode's inherent cost), one broadcast-gated join of the m·k-row
    codebook dim, one hash aggregation for the argmin (``min(struct(
    dist, code))`` — lexicographic min = nearest distance with lowest
    code on ties, deterministic and SQL-twinnable; no window shuffle).
    Distances are 6dp-rounded before comparison (the repo-wide
    cross-engine float contract).  Zero-norm or otherwise degenerate
    subvectors still encode (squared L2 is total, unlike cosine).

    ``carry`` names extra columns to thread through the explode and
    argmin unchanged (each must be functionally dependent on ``id_col``
    — e.g. the IVF cell id in :func:`ivf_pq_topk`); carrying them
    through costs nothing, where re-attaching them afterwards would be
    an extra corpus × m shuffle.
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    from kg.hints import maybe_broadcast

    d = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).select(
        id_col,
        *carry,
        F.posexplode(subvectors(F.col("_v"), m, dim)).alias("sub", "_sv"),
    )
    scored = d.join(maybe_broadcast(codebook), "sub").select(
        id_col,
        *carry,
        "sub",
        "code",
        F.round(_sqdist(F.col("_sv"), F.col("cv")), 6).alias("_d"),
    )
    best = scored.groupBy(id_col, *carry, "sub").agg(
        F.min(F.struct(F.col("_d"), F.col("code"))).alias("_b")
    )
    return best.select(id_col, *carry, "sub", F.col("_b.code").alias("code"))


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebook: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    m: int,
    dim: int,
    k: int = 5,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) approximate top-k: corpus vectors are
    scored in the COMPRESSED domain — each query precomputes a lookup
    table of distances to every codebook entry, and a corpus vector's
    approximate distance is the sum of ``m`` table lookups over its
    codes; no corpus float vector is touched at query time.

    → ``(query_id, neighbor_id, adc_fp, rk)``: ``adc_fp`` is the ADC
    distance in integer micro-units (per-subspace distances are
    converted via ``round(d·10^6)`` BEFORE summing, so the sum is exact
    BIGINT arithmetic — association-order-free, bit-reproducible, and
    SQL-twinnable; a float sum of per-subspace distances would be
    order-sensitive across partitionings).  Rank ascending by
    ``(adc_fp, neighbor_id)``.  Self-pairs excluded.

    Plan shape (100 TB): the LUT is |queries|·m·k rows → broadcast-gated
    join onto the corpus code table (an equi-join on (sub, code) — never
    all-pairs in the FLOAT domain; the scan is |corpus|·m compact rows),
    one hash aggregation summing the m lookups, one top-k window.
    Composition: feed ``pq_topk``'s candidates into an exact re-rank
    (``brute_force_topk`` over the candidate set) when final-stage
    precision matters, or restrict the corpus side to an IVF cell list —
    IVF-PQ — for sublinear scan; both compose as DataFrame ops.
    """
    from kg.hints import maybe_broadcast

    codes = pq_encode(corpus, corpus_id, vec_col, codebook, m, dim)
    codes = codes.select(
        F.col(corpus_id).alias("neighbor_id"), "sub", "code"
    )
    qsub = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).select(
        "query_id",
        F.posexplode(subvectors(F.col("_v"), m, dim)).alias("sub", "_sv"),
    )
    lut = qsub.join(maybe_broadcast(codebook), "sub").select(
        "query_id",
        "sub",
        "code",
        F.round(_sqdist(F.col("_sv"), F.col("cv")) * 1_000_000, 0)
        .cast("long")
        .alias("_qd"),
    )
    scored = (
        codes.join(maybe_broadcast(lut), ["sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("_qd").alias("adc_fp"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.asc("adc_fp"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc_fp", "rk")
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    m: int,
    dim: int,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al., TPAMI 2011 §V — the
    FAISS ``IVFPQ`` design): the coarse inverted file restricts WHICH
    corpus vectors a query scores (sublinear probe, :func:`ivf_topk`),
    and product quantization of the RESIDUAL ``v − centroid(cell)``
    compresses HOW they are scored (compressed-domain ADC,
    :func:`pq_topk`).  Together they are the standard shape for 10^9+
    vector indexes: cells bound the scan, residual codes bound the
    memory.  Residuals — not raw vectors — are what PQ quantizes here:
    within a cell they are centered near zero, so a shared codebook
    spends its codes on local structure instead of re-encoding the cell
    offset (the paper's stated reason residual IVFPQ beats plain PQ).

    → ``(query_id, neighbor_id, adc_fp, rk)``; ``adc_fp`` is the exact
    BIGINT micro-unit ADC sum of ``||(q − c) − decode(codes)||²`` within
    the probed cell (per-subspace distances rounded to micro-units
    BEFORE summing — association-order-free, bit-reproducible, and
    SQL-twinnable like :func:`pq_topk`).  Rank ascending by
    ``(adc_fp, neighbor_id)``; self-pairs excluded.

    Plan shape (100 TB): corpus assignment is one broadcast-NL pass over
    the K centroids + a per-vector window (``ivf_assign``), residuals a
    map-side ``zip_with``, the encode one m-wise explode + broadcast
    codebook join + argmin hash agg with the cell id CARRIED through
    (``pq_encode(carry=("cid",))`` — no re-attach shuffle).  The query
    LUT is |queries|·nprobe·m·k_codes rows, broadcast-gated into ONE
    equi-join on (cid, sub, code) — the cid key is what makes the scan
    sublinear: a corpus code row only meets queries that probed its
    cell.  One hash agg sums the m lookups, one top-k window.  No
    all-pairs float path exists.  Zero-norm vectors are unindexable
    (NaN cosine to every centroid, the :func:`ivf_assign` contract) and
    drop out of both sides.

    ``centroids`` (cid, cv) and ``codebook`` (sub, code, cv over
    ``dim/m`` dims) are caller-supplied: :func:`kg.ops.kmeans.kmeans_fit`
    output drops in for the former, a per-subspace k-means over
    residuals for the latter, without touching the plan."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    from pyspark.sql import Window as W

    from kg.hints import maybe_broadcast

    cvdf = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    ccells = ivf_assign(cvdf, "neighbor_id", "_cv", centroids, nprobe=1)
    resid = (
        cvdf.join(ccells, "neighbor_id")
        .join(maybe_broadcast(centroids), "cid")
        .select(
            "neighbor_id",
            "cid",
            F.zip_with("_cv", "cv", lambda x, y: x - y).alias("_rv"),
        )
    )
    codes = pq_encode(
        resid, "neighbor_id", "_rv", codebook, m, dim, carry=("cid",)
    )

    qvdf = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    qcells = ivf_assign(qvdf, "query_id", "_qv", centroids, nprobe=nprobe)
    qres = (
        qvdf.join(qcells, "query_id")
        .join(maybe_broadcast(centroids), "cid")
        .select(
            "query_id",
            "cid",
            F.zip_with("_qv", "cv", lambda x, y: x - y).alias("_rv"),
        )
    )
    qsub = qres.select(
        "query_id",
        "cid",
        F.posexplode(subvectors(F.col("_rv"), m, dim)).alias("sub", "_sv"),
    )
    lut = qsub.join(maybe_broadcast(codebook), "sub").select(
        "query_id",
        "cid",
        "sub",
        "code",
        F.round(_sqdist(F.col("_sv"), F.col("cv")) * 1_000_000, 0)
        .cast("long")
        .alias("_qd"),
    )
    scored = (
        codes.join(maybe_broadcast(lut), ["cid", "sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("_qd").alias("adc_fp"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_fp"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc_fp", "rk")
    )

def sq_train(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-dimension quantization bounds for :func:`sq_encode`: ONE
    1-row frame ``(mins array<double>, maxs array<double>)`` from a
    single hash-aggregation pass (2·dim agg expressions over the raw
    column — no explode, no dim-wise shuffle; min/max are exact, so the
    bounds are bit-identical on any engine or partitioning).

    Returned as a DataFrame, not collected: the encode broadcast-joins
    the 1-row bounds, keeping the whole index build one lazy plan with
    zero driver actions (the lazy-1-row-scalar discipline of
    ``tfidf_topk``'s N)."""
    v = F.col(vec_col).cast("array<double>")
    aggs = [
        F.min(F.element_at(v, d + 1)).alias(f"_mn{d}") for d in range(dim)
    ] + [F.max(F.element_at(v, d + 1)).alias(f"_mx{d}") for d in range(dim)]
    return df.agg(*aggs).select(
        F.array(*[F.col(f"_mn{d}") for d in range(dim)]).alias("mins"),
        F.array(*[F.col(f"_mx{d}") for d in range(dim)]).alias("maxs"),
    )


def sq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bounds: DataFrame,
    levels: int = 255,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Scalar quantization (the FAISS ``SQ8`` family): each dimension is
    affinely mapped to an integer code in [0, ``levels``] against the
    per-dim ``bounds`` (1-row ``(mins, maxs)``, :func:`sq_train` or
    caller-supplied) → ``(id, *carry, codes array<int>)``.

    ``code_d = clamp(floor((v_d − min_d) / (max_d − min_d) ·
    (levels+1)), 0, levels)`` — floor of one IEEE double expression
    evaluated in a fixed order, so codes are bit-identical across
    engines (the repo's float portability rule); a degenerate dimension
    (max == min) codes to 0; out-of-range values (queries quantized
    against corpus bounds) clamp to the edge codes.

    Where PQ (:func:`pq_encode`) trains a codebook over subspaces, SQ
    needs only 2·dim floats of training state and keeps per-dimension
    resolution — the cheap, train-light point of the quantization
    family (4× smaller than float32 at ``levels=255``).  Plan shape:
    one broadcast join of the 1-row bounds + two map-side ``zip_with``
    passes; no explode, no shuffle."""
    if levels < 1 or levels > 65535:
        raise ValueError(f"levels must be in [1, 65535], got {levels}")
    from kg.hints import maybe_broadcast

    v = F.col(vec_col).cast("array<double>")
    shifted = F.zip_with(v, F.col("mins"), lambda x, mn: x - mn)
    rng = F.zip_with(F.col("maxs"), F.col("mins"), lambda mx, mn: mx - mn)
    codes = F.zip_with(
        shifted,
        rng,
        # clamp on longs BEFORE the int cast: ANSI mode errors on an
        # overflowing cast, and a query value far outside the corpus
        # bounds must edge-clamp, not kill the job
        lambda x, r: F.when(r <= 0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    F.lit(levels).cast("long"),
                    F.floor(x / r * (levels + 1)),
                ),
            )
        )
        .cast("int"),
    )
    return df.crossJoin(maybe_broadcast(bounds)).select(
        F.col(id_col), *carry, codes.alias("codes")
    )


def ivf_sq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    dim: int,
    levels: int = 255,
    k: int = 5,
    nprobe: int = 2,
    bounds: DataFrame | None = None,
) -> DataFrame:
    """IVF-SQ approximate top-k: coarse cells bound WHICH corpus vectors
    a query scores (:func:`ivf_topk`'s probe), scalar-quantized codes
    bound HOW — the symmetric compressed-domain distance
    ``sq_fp = Σ_d (qcode_d − ccode_d)²`` (SDC in Jégou et al.'s
    terminology: BOTH sides quantized, so the distance is a pure BIGINT
    sum of integer squares — exact, association-order-free, and
    SQL-twinnable with no float anywhere past the encode).

    → ``(query_id, neighbor_id, sq_fp, rk)``, rank ascending by
    ``(sq_fp, neighbor_id)``; self-pairs excluded.  Bounds default to
    :func:`sq_train` over the corpus; queries quantize against the SAME
    bounds (edge-clamped), the standard SQ contract.

    Plan shape (100 TB): one bounds agg (2·dim expressions, one pass) +
    two map-side encodes; cells via the shared :func:`ivf_assign`
    broadcast-NL pass; candidates via ONE equi-join on cid (a corpus
    row meets only queries that probed its cell — never all-pairs; the
    corpus side is nprobe=1, so each (query, neighbor) pair arises at
    most once and needs no dedup); one ``zip_with`` + fold per
    candidate pair, one top-k window.  Against IVF-PQ: 1 byte/dim vs
    m codes/vector — SQ keeps per-dimension resolution and needs no
    codebook training, PQ compresses harder; both compose with the same
    cell machinery."""
    from pyspark.sql import Window as W

    from kg.hints import maybe_broadcast

    cvdf = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    if bounds is None:
        bounds = sq_train(cvdf, "_cv", dim)
    ccells = ivf_assign(cvdf, "neighbor_id", "_cv", centroids, nprobe=1)
    ccodes = sq_encode(
        cvdf.join(ccells, "neighbor_id"),
        "neighbor_id", "_cv", bounds, levels=levels, carry=("cid",),
    )
    qvdf = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    qcells = ivf_assign(qvdf, "query_id", "_qv", centroids, nprobe=nprobe)
    qcodes = sq_encode(
        qvdf.join(qcells, "query_id"),
        "query_id", "_qv", bounds, levels=levels, carry=("cid",),
    ).withColumnsRenamed({"codes": "_qc"})
    scored = (
        ccodes.join(maybe_broadcast(qcodes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("_qc"), F.col("codes"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("sq_fp"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.asc("sq_fp"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sq_fp", "rk")
    )


def knn_graph(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    planes: int = 64,
    bands: int = 8,
    max_bucket: int = 1024,
) -> DataFrame:
    """Corpus self k-NN graph → ``(<id_col>, neighbor_id, cosine,
    rank)``: for every vector, its ``k`` most-cosine-similar corpus
    neighbors — the construction step of graph-based ANN indexes,
    embedding-space clustering and semantic-dedup pipelines.

    Candidates come from the SAME banded hyperplane LSH blocking as
    :func:`banded_lsh_pairs` (OR-of-ANDs, per-bucket ``max_bucket``
    cap — never an all-pairs join), symmetrized to directed edges and
    re-ranked with the EXACT cosine, so within the candidate set the
    result is exact; recall per true neighbor is the banding curve
    ``1-(1-p^r)^bands``.  Ranking on the 6dp-rounded cosine with
    neighbor-id-asc tie-break (the repo's cross-engine ranking
    contract).  Zero-norm vectors (NaN cosine) are excluded on both
    sides.

    Plan shape (100 TB): signatures are computed once and
    localCheckpointed, the bucket self-join is capped, the candidate
    frame is checkpointed before symmetrization (the union's two
    branches must not re-run the self-join), and the per-source top-k
    is a window over candidate edges only — O(|candidates|), never
    O(n²)."""
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cand = banded_lsh_pairs(
        emb, id_col, vec_col, dim, planes=planes, bands=bands,
        max_bucket=max_bucket,
    ).localCheckpoint()
    directed = cand.unionAll(
        cand.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("src"), F.col("b").alias("nbr"))
    va = emb.select(
        F.col(id_col).alias("src"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    vb = emb.select(
        F.col(id_col).alias("nbr"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    scored = (
        directed.join(va, "src")
        .join(vb, "nbr")
        .select(
            "src",
            "nbr",
            F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("src").orderBy(F.desc("cosine"), F.asc("nbr"))
    return (
        scored.filter(~F.isnan("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("src").alias(id_col),
            F.col("nbr").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training → per anchor the
    top-``k`` highest-cosine corpus vectors with a DIFFERENT label:
    ``(query_id, query_label, neighbor_id, neighbor_label, cosine,
    rk)``.  The pairs an InfoNCE / triplet objective learns most from
    are near-misses across the label boundary — random negatives are
    too easy, same-label neighbors are positives, this returns exactly
    the boundary set (Robinson et al. 2021's "hard negative" regime).

    Plan shape: same contract as :func:`brute_force_topk` — broadcast
    anchors over the partitioned corpus scan (a labeled broadcast-NL
    baseline, the library's oracle-checkable exact form), label
    inequality applied BEFORE scoring so same-label rows never pay the
    dot product, one window top-k shuffle on ``query_id``.  At 100 TB
    mine from the IVF/LSH candidate set instead (:func:`ivf_topk` /
    :func:`lsh_topk` with the same label predicate on the candidate
    join) — identical semantics on the probed cells.

    Zero-norm vectors (NaN cosine) are excluded on both sides of the
    contract, mirroring every ANN twin here.
    """
    from pyspark.sql import Window as W

    from kg.hints import maybe_broadcast

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = maybe_broadcast(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col(label_col).alias("query_label"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col(label_col).alias("neighbor_label"),
    )
    qv = F.col("qv").cast("array<double>")
    cv = F.col("cv").cast("array<double>")
    # ANSI mode raises DIVIDE_BY_ZERO even for doubles: route zero-norm
    # pairs to an explicit NaN (CaseWhen evaluates only the live
    # branch), then drop them — the twin's NOT isnan(cosine) mirror
    prod = _norm(qv) * _norm(cv)
    cos = F.when(prod == 0, F.lit(float("nan"))).otherwise(
        F.round(_dot(qv, cv) / prod, 6)
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_label") != F.col("neighbor_label"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            cos.alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.filter(~F.isnan("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "cosine",
            F.col("rk").cast("int").alias("rk"),
        )
    )
