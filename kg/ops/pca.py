"""Exact fixed-point PCA: top principal component of an embedding
column by power iteration over an INTEGER scatter matrix.

Everything after the one corpus pass happens on a d×d frame (d =
embedding dim, tens), so the heavy lifting is exactly one map-side
projection + one hash agg with d² uniform keys — the same "constant
cardinality reduce" shape as `graph_summary`/`assortativity`.  All
arithmetic is exact integer (BIGINT components, decimal(38,0) /
HUGEINT sums), so a fixed-round run is bit-reproducible across engines
and the iterative op carries a FULL unrolled-CTE DuckDB twin — the
`pagerank` determinism-buys-an-oracle design, applied to linear
algebra.

Why PCA in a curation engine: the top principal axis of an embedding
table is the first thing an embedding-quality audit computes —
anisotropy diagnosis (Ethayarajh 2019: contextual embeddings collapse
toward a dominant direction; the all-but-the-top fix of Mu & Viswanath
2018 subtracts exactly this component), outlier axes, and whitening
pre-passes before cosine dedup/ANN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def _fixed_components(emb: Column) -> Column:
    """array<double> → array<long> micro-unit components:
    ``round(x·10⁶)`` on the double value — the ADC/PQ twins' idiom,
    identical IEEE result in DuckDB's ``round(x::DOUBLE * 1000000)``."""
    return F.transform(
        emb.cast("array<double>"),
        lambda e: F.round(e * _SCALE).cast("long"),
    )


def _scatter_matrix(x: DataFrame) -> DataFrame:
    """(i, j, mm) scatter matrix M = n·G − s·sᵀ (= n² · covariance —
    same eigenvectors, ZERO divisions, exact decimal(38,0)) from the
    micro-unit component frame ``x(id, x: array<long>)``.

    G is built IN-ROW: the index array is bound as its own attribute,
    then one nested transform emits the d² (i, j, xᵢ·xⱼ) structs per
    row — O(d²) per row with O(1) element reads, never a corpus
    self-join (the DuckDB twin USES the self-join formulation: an
    independent derivation of the same matrix).  The d²-key hash agg
    collapses map-side.  Magnitudes: components ≤ ~10⁶·|x|, products
    ~10¹², decimal(38,0) sums carry ~10²⁶ headroom over that — n up to
    ~10⁹ rows before the n·G term nears the cap (documented bound)."""
    d1 = x.select(
        "x", F.sequence(F.lit(0), F.size("x") - 1).alias("ii")
    )
    pairs = d1.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ii"),
                    lambda i: F.transform(
                        F.col("ii"),
                        lambda j: F.struct(
                            i.cast("int").alias("i"),
                            j.cast("int").alias("j"),
                            (
                                F.element_at(F.col("x"), i.cast("int") + 1)
                                * F.element_at(F.col("x"), j.cast("int") + 1)
                            ).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.p")
    g = pairs.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("g")
    )
    el = x.select(F.posexplode("x").alias("i", "xi"))
    s = el.groupBy("i").agg(
        F.sum(F.col("xi").cast("decimal(38,0)")).alias("s")
    )
    n = x.agg(F.count("*").cast("decimal(38,0)").alias("n"))
    from kg.hints import maybe_broadcast

    return (
        g.join(maybe_broadcast(s.select(F.col("i").alias("_i"), F.col("s").alias("si"))),
               F.col("i") == F.col("_i"))
        .join(maybe_broadcast(s.select(F.col("i").alias("_j"), F.col("s").alias("sj"))),
              F.col("j") == F.col("_j"))
        .crossJoin(maybe_broadcast(n))
        .select(
            "i", "j",
            (F.col("n") * F.col("g") - F.col("si") * F.col("sj")).alias("mm"),
        )
    )


def _renorm(u: DataFrame) -> DataFrame:
    """(i, u) → (j, v): max-abs normalization back to ~±10⁶ with
    POSITIVE-ONLY integral division (sign split out), so Spark's
    truncating ``div`` and DuckDB's ``//`` agree by construction.  The
    two-branch divisor (pre-shrunk ``m div 10⁶`` when large) keeps
    ``abs(u)·10⁶`` inside decimal(38,0) at any corpus size; both
    branches are mirrored verbatim in the twin.  Zero matrix (m = 0)
    degrades to the zero vector, not a division error."""
    m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
    from kg.hints import maybe_broadcast

    return (
        u.crossJoin(maybe_broadcast(m))
        .select(
            F.col("i").alias("j"),
            (
                F.when(F.col("m") <= 0, F.lit(0).cast("long"))
                .when(
                    F.expr("m div 1000000") > 0,
                    F.expr("abs(u) div (m div 1000000)"),
                )
                .otherwise(F.expr("(abs(u) * 1000000) div m"))
                * F.when(F.col("u") < 0, F.lit(-1)).otherwise(F.lit(1))
            ).cast("long").alias("v"),
        )
    )


def top_principal_component(
    embs: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    rounds: int = 8,
) -> DataFrame:
    """Top principal component of the embedding column → ``(dim,
    weight_fp)``, one row per dimension, ``weight_fp`` the max-abs-
    normalized eigenvector coordinate in micro-units (the largest
    coordinate is ±10⁶ by construction).

    Fixed-round power iteration ``v ← M·v / max|M·v|`` on the integer
    scatter matrix ``M = n·G − s·sᵀ`` starting from the all-ones
    vector, entirely in exact integer arithmetic: matrix-vector
    products are decimal(38,0) sums over d terms (association-order-
    free), normalization is positive-only integral division.  Rounds
    are FIXED, so the loop unrolls into a full CTE twin; the error of
    a budget-bounded run is the textbook (λ₂/λ₁)^rounds power-method
    rate — a less-converged vector, never an engine-divergent one.
    The d²-row matrix/vector frames ride broadcast joins; only the one
    corpus pass in :func:`_scatter_matrix` touches data volume.

    The all-ones start is deterministic and (like any fixed start)
    fails only on inputs whose top eigenspace is exactly orthogonal to
    it — measure-zero, and identical on both engines if it happens."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    x = embs.select(
        F.col(id_col).alias("id"), _fixed_components(F.col(emb_col)).alias("x")
    ).localCheckpoint()
    mat = _scatter_matrix(x).localCheckpoint()
    from kg.hints import maybe_broadcast

    v = (
        mat.select(F.col("j")).distinct()
        .select("j", F.lit(_SCALE).cast("long").alias("v"))
    )
    for _ in range(rounds):
        u = (
            mat.join(maybe_broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("mm") * F.col("v")).alias("u"))
        )
        v = _renorm(u).localCheckpoint()
    return v.select(F.col("j").cast("int").alias("dim"), F.col("v").alias("weight_fp"))


def pca_projection(
    embs: DataFrame,
    component: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Project every embedding onto a component from
    :func:`top_principal_component` → ``(id_col, proj_fp)``:
    ``proj_fp = Σ_d round(x_d·10⁶)·weight_fp_d`` — exact BIGINT
    (components ~10⁶ × weights ≤ 10⁶ × d ⇒ ≤ ~10¹⁴), the anisotropy /
    outlier-axis score per document (rank by |proj_fp| to find the
    dominant-direction outliers; subtract the rank-1 term for
    Mu–Viswanath all-but-the-top whitening).  One posexplode + one
    broadcast dim join + one per-id hash agg."""
    from kg.hints import maybe_broadcast

    el = embs.select(
        F.col(id_col), _fixed_components(F.col(emb_col)).alias("x")
    ).select(id_col, F.posexplode("x").alias("dim", "xi"))
    return (
        el.join(maybe_broadcast(component), "dim")
        .groupBy(id_col)
        .agg(F.sum(F.col("xi") * F.col("weight_fp")).cast("long").alias("proj_fp"))
    )


def jl_projection(
    vecs: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: str = "kg-jl-v1",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection →
    ``(id_col, projected: array<long>)``: each input vector maps to
    ``out_dim`` fixed-point coordinates ``p_j = Σ_i ⌊10⁶·e_i⌋ ·
    s(i,j)`` with a ±1 sign matrix — Achlioptas 2003's
    database-friendly JL variant (signs instead of Gaussians), the
    cheap distance-preserving dim-reduction run BEFORE ANN indexing at
    100 TB (project 768→64 once, then every downstream band join and
    centroid assignment pays 1/12 the arithmetic; distortion bound
    (1±ε) at out_dim = O(ln n / ε²)).

    Determinism/exactness: ``s(i,j) = +1 iff md5_60(seed:i:j) is even``
    — the library's portable hash, so the SAME matrix is derivable in
    SQL; inputs fix-point BEFORE the sum (⌊10⁶·e⌋ — float sums are
    association-order-sensitive, integer sums are not), making the
    output bit-exact on any engine and any partitioning.  Consumers
    divide by 10⁶·√out_dim when they need calibrated distances; the
    raw integer form composes exactly with this library's fixed-point
    cosine ops.

    Plan shape: the sign matrix is built DRIVER-side (out_dim×dim
    hashes, microseconds) and inlined as literal arrays, so the whole
    projection is one narrow ``transform``/``aggregate`` expression —
    zero joins, zero shuffles, zero Python at execution time; the twin
    re-derives the same signs from md5 in SQL.
    """
    import hashlib

    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    for c in (id_col, emb_col):
        if c not in vecs.columns:
            raise ValueError(f"column {c!r} not in frame")
    dim_row = vecs.select(F.size(F.col(emb_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("empty vectors frame")
    dim = int(dim_row["d"])

    def sign(i: int, j: int) -> int:
        h = int(
            hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:15], 16
        )
        return 1 if h % 2 == 0 else -1

    fp = F.transform(
        F.col(emb_col),
        lambda x: F.floor(x.cast("double") * F.lit(1_000_000)).cast("long"),
    )
    cols = []
    for j in range(out_dim):
        signs = F.array(
            *[F.lit(sign(i, j)).cast("long") for i in range(dim)]
        )
        cols.append(
            F.aggregate(
                F.zip_with(fp, signs, lambda e, s: e * s),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
    return vecs.select(F.col(id_col), F.array(*cols).alias("projected"))


def isotropy_score(
    vecs: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Corpus isotropy diagnostic → ONE row
    ``(n_vectors, mean_pairwise_cosine)``: the average cosine between
    all pairs of (unit-normalized) embeddings — Ethayarajh 2019's
    anisotropy measure.  Near 0 ⇒ directions are spread (healthy
    geometry for cosine retrieval); large ⇒ the rogue-dimension
    pathology that :func:`top_principal_component` / all-but-the-top
    removes.  Run it before and after PCA correction.

    Closed form, never all-pairs: Σ_{i≠j} uᵢ·uⱼ = ‖Σᵢuᵢ‖² − Σᵢ‖uᵢ‖²,
    so the whole statistic is per-dimension sums of the unit vectors —
    one posexplode + one ``dim``-sized hash agg (map-side combinable;
    s_d and the self-energy q_d = Σ u² ride the SAME agg) + an O(dim)
    final fold.  An O(n²) pairwise pass at 100 TB is impossible; this
    is O(n·dim).

    Exactness (every step bit-identical cross-engine): raw coordinates
    fix-point to f = ⌊10⁶x⌋ (one multiply + floor); the norm is
    sqrt(Σf²) where Σf² is an EXACT integer (< 2⁵³, so its double
    image is exact and sqrt is the correctly-rounded IEEE result on
    any engine — a float-summed norm would be association-order-
    sensitive); unit coordinates are ⌊10⁶·f/‖f‖⌋; the dimension sums
    run in decimal(38,0).  Zero vectors are excluded; the final
    division is one IEEE op rounded to 6 dp; n < 2 yields NULL (no
    pairs) instead of an ANSI divide-by-zero.
    """
    for c in (id_col, emb_col):
        if c not in vecs.columns:
            raise ValueError(f"column {c!r} not in frame")
    v = F.col(emb_col).cast("array<double>")
    f = F.transform(
        v, lambda x: F.floor(x * F.lit(1_000_000)).cast("long")
    )
    s2 = F.aggregate(
        F.col("_f"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x * x,
    )
    nrm = F.sqrt(F.col("_s2").cast("double"))
    unit = (
        vecs.select(f.alias("_f"))
        .select("_f", s2.alias("_s2"))
        .filter(F.col("_s2") > 0)
        .select(
            F.transform(
                F.col("_f"),
                lambda x: F.floor(
                    x.cast("double") * F.lit(1_000_000) / nrm
                ).cast("long"),
            ).alias("_u")
        )
    )
    dec = "decimal(38,0)"
    per_dim = (
        unit.select(F.posexplode(F.col("_u")).alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.sum(F.col("val").cast(dec)).alias("_s"),
            F.sum(
                F.col("val").cast(dec) * F.col("val").cast(dec)
            ).alias("_q"),
        )
    )
    agg = per_dim.agg(
        F.max("_n").alias("n_vectors"),
        F.sum(F.col("_s") * F.col("_s")).alias("_ss"),
        F.sum("_q").alias("_qq"),
    )
    n = F.col("n_vectors").cast("double")
    return agg.select(
        "n_vectors",
        F.when(
            F.col("n_vectors") >= 2,
            F.round(
                (F.col("_ss") - F.col("_qq")).cast("double")
                / (n * (n - F.lit(1.0)) * F.lit(1e12)),
                6,
            ),
        ).alias("mean_pairwise_cosine"),
    )
