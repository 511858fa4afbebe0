"""Portable Bloom-filter semi-join reduction.

The 100 TB shuffle-reduction pattern: before joining a huge fact stream
against a filtered key set, ship a Bloom filter of the keys instead of
the keys themselves and drop non-members MAP-SIDE — rows that can never
match never enter the shuffle.  Spark's AQE injects runtime bloom
filters on its own (spark.sql.optimizer.runtimeFilter.bloomFilter), but
that sketch is engine-internal; this operator builds the filter from
the library's portable md5-60 hash, so the DuckDB twin reproduces the
exact bit array and the reduction is oracle-checkable bit-for-bit.

Construction: k positions per key, ``pos_i = md5_60(i || ':' || key)
mod m``; the filter is the OR of ``1 << (pos mod 32)`` grouped by
``pos div 32`` — 32-bit words in BIGINT columns (both engines shift
small-positive only; no signed-overflow edge), at most ``m/32`` rows,
built by ONE hash agg with perfect map-side combine.  Membership
requires ALL k probed bits set: no false negatives ever (the Bloom
guarantee), false positives at the textbook ``(1−e^{−kn/m})^k`` rate.

Reference parity note: §2.1 new-engine surface (SURVEY.md); the
reference joins nothing at scale (Neo4j pulls pages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kg.hints import maybe_broadcast
from kg.ops.minhash import md5_60

_WORD = 32  # bits per word; 1 << 31 fits BIGINT on every engine


def _positions(key, m_bits: int, k: int):
    """k probe positions for a key column (cast to string first)."""
    return [
        F.pmod(
            md5_60(F.concat(F.lit(f"{i}:"), key.cast("string"))),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_bits(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Build the filter → ``(word_idx, word)``: one row per non-zero
    32-bit word of the m-bit array.  ONE explode(k)+hash agg; the
    result is at most ``m/32`` rows — a broadcastable dim no matter how
    many keys flowed in."""
    if m_bits < _WORD or m_bits % _WORD:
        raise ValueError(f"m_bits must be a positive multiple of {_WORD}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias(
        "_pos"
    )
    return (
        df.select(pos)
        .select(
            (F.col("_pos") / _WORD).cast("long").alias("word_idx"),
            F.pmod(F.col("_pos"), F.lit(_WORD)).cast("int").alias("_bit"),
        )
        # shift amount is a COLUMN: the python shiftleft helper only
        # takes a literal, the SQL function takes any expression
        .groupBy("word_idx")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), _bit)")
            ).alias("word")
        )
    )


def bloom_semi_join(
    probe: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Keep the ``probe`` rows whose ``key_col`` is (probably) in
    ``keys[key_col]`` — every true member survives (no false
    negatives), plus the Bloom false positives; chase with the exact
    join when exactness matters (the filter's job is to shrink what
    reaches it).

    Plan shape: the filter dim (≤ m/32 rows) broadcasts; each of the k
    probes is one broadcast left-join on its word index followed
    immediately by the bit test — progressive pruning, most
    non-members die on the first probe.  No shuffle of ``keys``
    reaches the probe side, no row-identity bookkeeping (duplicate
    probe rows pass through unchanged), no shuffle of non-members.
    """
    if key_col not in probe.columns or key_col not in keys.columns:
        raise ValueError(f"key_col {key_col!r} must exist on both frames")
    # the probe loop injects _wi<i>/_b<i>/_w<i> working columns; a probe
    # frame already carrying such a name would be silently clobbered
    # (ADVICE r5) — refuse loudly, mirroring asof_join's clash check
    reserved = {
        f"_{p}{i}" for p in ("wi", "b", "w") for i in range(k)
    }
    clash = reserved.intersection(probe.columns)
    if clash:
        raise ValueError(
            f"probe columns {sorted(clash)} collide with bloom_semi_join's "
            "reserved working names (_wi<i>/_b<i>/_w<i>); rename them first"
        )
    bits = bloom_bits(keys, key_col, m_bits=m_bits, k=k).localCheckpoint()
    out = probe
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k)):
        wi = bits.select(
            F.col("word_idx").alias(f"_wi{i}"), F.col("word").alias(f"_w{i}")
        )
        out = (
            out.withColumn(f"_wi{i}", (p / _WORD).cast("long"))
            .withColumn(f"_b{i}", F.pmod(p, F.lit(_WORD)).cast("int"))
            .join(maybe_broadcast(wi), f"_wi{i}", "left")
            .filter(
                F.col(f"_w{i}").isNotNull()
                & (F.expr(f"shiftright(_w{i}, _b{i}) & 1") == 1)
            )
            .drop(f"_wi{i}", f"_b{i}", f"_w{i}")
        )
    return out
