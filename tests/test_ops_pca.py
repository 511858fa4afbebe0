"""Exact fixed-point PCA (kg/ops/pca.py): python integer replica of the
power-iteration rule, numpy eigenvector agreement, projection math."""

from __future__ import annotations

import math
import random

import pytest


def _replica(vectors, rounds):
    """Python-int replica of top_principal_component's exact rule."""
    xs = [[round(c * 1_000_000) for c in v] for v in vectors]
    d = len(xs[0])
    n = len(xs)
    s = [sum(x[i] for x in xs) for i in range(d)]
    g = [[sum(x[i] * x[j] for x in xs) for j in range(d)] for i in range(d)]
    mm = [[n * g[i][j] - s[i] * s[j] for j in range(d)] for i in range(d)]
    v = [1_000_000] * d
    for _ in range(rounds):
        u = [sum(mm[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in u)
        if m == 0:
            v = [0] * d
            continue
        q = m // 1_000_000
        v = [
            (1 if x >= 0 else -1)
            * ((abs(x) // q) if q > 0 else (abs(x) * 1_000_000) // m)
            for x in u
        ]
    return v


def _mk(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(c) for c in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<double>",
    )


def test_pca_matches_integer_replica(spark):
    from kg.ops import top_principal_component

    rng = random.Random(3)
    vectors = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(40)]
    got = {
        r["dim"]: r["weight_fp"]
        for r in top_principal_component(_mk(spark, vectors), rounds=4).collect()
    }
    want = _replica(vectors, 4)
    assert got == {i: w for i, w in enumerate(want)}


def test_pca_finds_planted_dominant_axis(spark):
    from kg.ops import top_principal_component

    rng = random.Random(7)
    # variance 100x larger along axis 2 than anywhere else
    vectors = [
        [rng.gauss(0, 0.01) for _ in range(5)] for _ in range(60)
    ]
    for v in vectors:
        v[2] += rng.gauss(0, 1.0)
    got = {
        r["dim"]: r["weight_fp"]
        for r in top_principal_component(_mk(spark, vectors), rounds=8).collect()
    }
    assert abs(got[2]) == 1_000_000  # dominant axis carries the max coord
    for i in (0, 1, 3, 4):
        assert abs(got[i]) < 200_000


def test_pca_agrees_with_numpy_eigenvector(spark):
    np = pytest.importorskip("numpy")
    from kg.ops import top_principal_component

    rng = random.Random(11)
    # decaying per-axis variances + a random rotation-ish mixing: a real
    # spectral gap (iid-isotropic data has lambda1 ~ lambda2 and NO
    # power method converges there)
    base = [
        [rng.gauss(0, 1.0 / (1.5 ** k)) for k in range(8)] for _ in range(80)
    ]
    mix = [[rng.uniform(-0.2, 0.2) for _ in range(8)] for _ in range(8)]
    for k in range(8):
        mix[k][k] += 1.0
    vectors = [
        [sum(row[k] * mix[k][d] for k in range(8)) for d in range(8)]
        for row in base
    ]
    got = top_principal_component(_mk(spark, vectors), rounds=12).collect()
    v = np.array([r["weight_fp"] for r in sorted(got, key=lambda r: r["dim"])],
                 dtype=float)
    x = np.array(vectors)
    c = np.cov(x, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(c)
    top = vecs[:, int(np.argmax(w))]
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos > 0.999


def test_pca_projection_exact_dot(spark):
    from kg.ops import pca_projection, top_principal_component

    vectors = [[1.0, 0.0], [0.5, 0.25], [-1.0, 0.125]]
    df = _mk(spark, vectors)
    comp = top_principal_component(df, rounds=4)
    cw = {r["dim"]: r["weight_fp"] for r in comp.collect()}
    got = {r["vec_id"]: r["proj_fp"] for r in pca_projection(df, comp).collect()}
    for i, v in enumerate(vectors):
        want = sum(round(c * 1_000_000) * cw[d] for d, c in enumerate(v))
        assert got[i] == want


def test_pca_zero_matrix_degrades_to_zero_vector(spark):
    from kg.ops import top_principal_component

    df = _mk(spark, [[0.5, 0.5]] * 3)  # zero variance -> M = 0
    got = {r["dim"]: r["weight_fp"]
           for r in top_principal_component(df, rounds=2).collect()}
    assert got == {0: 0, 1: 0}


def test_pca_validates_rounds(spark):
    from kg.ops import top_principal_component

    df = _mk(spark, [[1.0, 2.0]])
    with pytest.raises(ValueError, match="rounds"):
        top_principal_component(df, rounds=0)


def test_jl_projection_hand_values_and_determinism(spark):
    """p_j = sum_i floor(1e6*e_i) * s(i,j) with s from the portable
    md5 rule — recomputed independently here."""
    import hashlib

    from kg.ops.pca import jl_projection

    def sign(i, j):
        h = int(hashlib.md5(f"kg-jl-v1:{i}:{j}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    rows = [(1, [1.5, -2.0]), (2, [0.25, 0.75])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["projected"]
           for r in jl_projection(df, out_dim=3).collect()}
    for vid, emb in rows:
        fp = [int(x * 1_000_000) for x in emb]  # exact for these values
        expect = [sum(fp[i] * sign(i, j) for i in range(2)) for j in range(3)]
        assert got[vid] == expect, (vid, got[vid], expect)
    again = {r["vec_id"]: r["projected"]
             for r in jl_projection(df, out_dim=3).collect()}
    assert got == again


def test_jl_projection_validation(spark):
    from kg.ops.pca import jl_projection

    df = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="out_dim"):
        jl_projection(df, out_dim=0)
    with pytest.raises(ValueError, match="not in frame"):
        jl_projection(df, emb_col="nope")


def test_isotropy_hand_values(spark):
    """Identical pair -> 1.0, antipodal pair -> -1.0, orthogonal
    pair -> 0.0 (all exact under the integer fix-point rule)."""
    from kg.ops.pca import isotropy_score

    def score(rows):
        df = spark.createDataFrame(
            [(i, r) for i, r in enumerate(rows)],
            "vec_id long, embedding array<double>",
        )
        row = isotropy_score(df).collect()[0]
        return row["n_vectors"], row["mean_pairwise_cosine"]

    assert score([[3.0, 4.0], [3.0, 4.0]]) == (2, 1.0)
    assert score([[3.0, 4.0], [-3.0, -4.0]]) == (2, -1.0)
    assert score([[1.0, 0.0], [0.0, 1.0]]) == (2, 0.0)


def test_isotropy_excludes_zero_and_guards_singleton(spark):
    from kg.ops.pca import isotropy_score

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    row = isotropy_score(df).collect()[0]
    assert row["n_vectors"] == 1  # zero vector excluded
    assert row["mean_pairwise_cosine"] is None  # no pairs, no ANSI error
    with pytest.raises(ValueError, match="not in frame"):
        isotropy_score(df, emb_col="nope")
