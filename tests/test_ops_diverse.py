"""Farthest-point diverse selection (kg/ops/diverse.py): hand traversal,
python-replica battery, exhaustion/zero-vector edges, validation."""

from __future__ import annotations

import math
import random

import pytest

from kg.ops.diverse import select_diverse


def _replica(vecs, k):
    """Python replica of the exact selection rule."""
    usable = {i: v for i, v in vecs.items() if sum(x * x for x in v) > 0}

    def cos_fp(a, b):
        d = sum(x * y for x, y in zip(a, b))
        n = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        return math.floor(round(d / n, 6) * 1_000_000 + 0.5)

    if not usable:
        return []
    sel = [(min(usable), 1, 0)]
    while len(sel) < min(k, len(usable)):
        chosen = {i for i, _, _ in sel}
        best = None
        for i in sorted(set(usable) - chosen):
            ms = max(cos_fp(usable[i], usable[j]) for j in chosen)
            if best is None or (ms, i) < best:
                best = (ms, i)
        sel.append((best[1], len(sel) + 1, best[0]))
    return sel


def test_diverse_hand_traversal(spark):
    rows = {1: [1.0, 0.0], 2: [0.99, 0.1], 3: [-1.0, 0.0],
            4: [0.0, 1.0], 5: [0.0, 0.0]}
    df = spark.createDataFrame(
        [(i, v) for i, v in rows.items()], "vid long, v array<double>"
    )
    got = sorted(
        (r["vid"], r["sel_round"], r["max_sim_fp"])
        for r in select_diverse(df, "vid", "v", k=3).collect()
    )
    # seed 1, then the antipode 3 (cos -1), then orthogonal 4
    assert got == [(1, 1, 0), (3, 2, -1_000_000), (4, 3, 0)]


def test_diverse_matches_python_replica(spark):
    rng = random.Random(7)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(4)] for i in range(30)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vid long, v array<double>"
    )
    got = sorted(
        (r["vid"], r["sel_round"], r["max_sim_fp"])
        for r in select_diverse(df, "vid", "v", k=6).collect()
    )
    exp = sorted(_replica(vecs, 6))
    assert got == exp


def test_diverse_exhaustion_and_validation(spark):
    df = spark.createDataFrame(
        [(1, [1.0]), (2, [-1.0]), (3, [0.0])], "vid long, v array<double>"
    )
    out = select_diverse(df, "vid", "v", k=10).collect()
    assert {r["vid"] for r in out} == {1, 2}  # zero vector excluded
    assert {r["sel_round"] for r in out} == {1, 2}
    with pytest.raises(ValueError, match="k must"):
        select_diverse(df, "vid", "v", k=0)
