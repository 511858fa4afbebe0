"""Portable Bloom semi-join (kg/ops/bloom.py): word-construction replica,
the no-false-negative guarantee, duplicate passthrough, validation."""

from __future__ import annotations

import hashlib

import pytest

from kg.ops.bloom import _WORD, bloom_bits, bloom_semi_join


def _md560(x: str) -> int:
    return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)


def _replica_words(keys, m_bits, k):
    words = {}
    for key in keys:
        for i in range(k):
            p = _md560(f"{i}:{key}") % m_bits
            w, b = p // _WORD, p % _WORD
            words[w] = words.get(w, 0) | (1 << b)
    return words


def test_bloom_bits_match_python_replica(spark):
    keys = [f"k{i}" for i in range(50)]
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    got = {
        r["word_idx"]: r["word"]
        for r in bloom_bits(df, "key", m_bits=1024, k=3).collect()
    }
    assert got == _replica_words(keys, 1024, 3)


def test_bloom_semi_join_has_no_false_negatives(spark):
    """Every true member survives, at any (m, k) — the Bloom guarantee."""
    keys = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "k long")
    probe = spark.createDataFrame(
        [(i, f"p{i}") for i in range(100)], "k long, tag string"
    )
    for m_bits, k in ((64, 2), (1 << 14, 3)):
        kept = {
            r["k"]
            for r in bloom_semi_join(
                probe, keys, "k", m_bits=m_bits, k=k
            ).collect()
        }
        assert set(range(0, 100, 7)) <= kept  # no member ever dropped


def test_bloom_semi_join_prunes_and_keeps_duplicates(spark):
    keys = spark.createDataFrame([("a",)], "k string")
    probe = spark.createDataFrame(
        [("a", 1), ("a", 2), ("zzz-not-member", 3)], "k string, n long"
    )
    got = sorted(
        (r["k"], r["n"])
        for r in bloom_semi_join(probe, keys, "k", m_bits=1 << 14).collect()
    )
    assert got == [("a", 1), ("a", 2)]  # dup rows preserved, non-member gone


def test_bloom_validates(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="m_bits"):
        bloom_bits(df, "k", m_bits=33)
    with pytest.raises(ValueError, match="k must"):
        bloom_bits(df, "k", k=0)
    with pytest.raises(ValueError, match="key_col"):
        bloom_semi_join(df, df.withColumnRenamed("k", "x"), "k")
