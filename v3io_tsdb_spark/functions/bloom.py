"""Bloom-prefiltered semi-join: the shuffle-volume reducer for the
regime where the join's build side is too large to broadcast as rows
but its BITMAP fits in every executor.

At 100 TB the expensive part of `big ⋉ small` is shuffling `big`. When
`small` has, say, 100M keys, Spark won't broadcast the rows — but a
Bloom filter of those keys is m/8 bytes regardless of key width
(16 MB at m=2^27 with ~1% false positives at k=4, n=100M), and a
scan-side membership test against it drops most of `big` BEFORE the
join exchange. False positives only cost wasted shuffle rows, never
correctness: the real join still runs on the survivors, so the result
is EXACTLY the semi-join (which is what makes the operator
hash-oracle-checkable — the oracle is the plain semi-join).

This is the same driver-side-bounded-metadata pattern as the IVF
centroids (similarity.py) and the ≤1M-edge union-find (dedup.py): the
only thing collected is the fixed-size bitmap, never data-sized rows.
Spark 3.3+ applies a runtime bloom automatically in some shapes
(spark.sql.optimizer.runtime.bloomFilter.enabled); this operator is
the explicit, plan-pinned form for when the optimizer doesn't fire
(non-equi pre-aggregated sides, persisted key sets, repeated reuse of
one build across many probe jobs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from v3io_tsdb_spark.functions.dedup import md5_int60


def build_bloom_bitmap(
    df: DataFrame, key_col: str, m_bits: int = 65536, k: int = 4
) -> list:
    """Build the bitmap (a list of ``m_bits/64`` longs) from the build
    side's keys: k md5-derived bit positions per key, OR-folded
    distributedly — the driver receives only the DISTINCT BIT
    POSITIONS (≤ m_bits rows, bounded metadata), never the keys.
    """
    assert m_bits % 64 == 0
    key = F.col(key_col).cast("string")
    pos = F.explode(
        F.array(
            *[
                F.pmod(
                    md5_int60(F.concat(F.lit("b%d_" % i), key)), F.lit(m_bits)
                )
                for i in range(k)
            ]
        )
    ).alias("p")
    bits = [r["p"] for r in df.select(pos).distinct().collect()]
    words = [0] * (m_bits // 64)
    for p in bits:
        words[p // 64] |= 1 << (p % 64)
    # keep words in signed-64 range for the ArrayType(Long) literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column, bitmap: list, m_bits: int = 65536, k: int = 4
) -> Column:
    """Scan-side membership test: all k bits set → maybe-member (the
    bitmap rides into the plan as ONE array literal — a constant, not
    a per-row CreateArray of m/64 elements; executor-local, no join,
    no shuffle).

    The literal is emitted as a single SQL ``array(..L)`` expression
    string: ``F.lit(<list>)`` expands Python-side to ``array(*[lit(w)
    for w in words])`` — m/64 py4j round-trips (~0.5 s of driver time
    per build at m=2^16) for what is one constant. One ``F.expr``
    call hands the whole array to the JVM parser instead; the element
    type (``L`` suffix = bigint) and values are identical.
    """
    # .cast keeps the empty-list edge analyzable (array() alone types
    # ARRAY<VOID>, which element_at rejects — ADVICE r16 #5); for the
    # normal non-empty ..L literal the cast is a no-op
    words = F.expr(
        "array(" + ",".join("%dL" % w for w in bitmap) + ")"
    ).cast("array<bigint>")
    ks = key.cast("string")
    checks = []
    for i in range(k):
        p = F.pmod(md5_int60(F.concat(F.lit("b%d_" % i), ks)), F.lit(m_bits))
        word = F.element_at(words, (p / 64).cast("int") + F.lit(1))
        checks.append(F.getbit(word, F.pmod(p, F.lit(64))) == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    m_bits: int = 65536,
    k: int = 4,
) -> DataFrame:
    """``big ⋉ small`` with the probe side bloom-pruned BEFORE the join
    exchange. The result is exactly the semi-join (bloom false
    positives are eliminated by the real join); the bloom only reduces
    how much of ``big`` reaches the shuffle.

    Plan shape: Filter(bloom) directly above big's scan → the join's
    Exchange carries only survivors. The join itself is left to the
    planner: at test scale it may still broadcast; the operator's
    value is pinned by the plan audit asserting the bloom filter sits
    BELOW the join on the probe side.
    """
    bitmap = build_bloom_bitmap(small, key_col, m_bits, k)
    pruned = big.where(
        bloom_might_contain(F.col(key_col), bitmap, m_bits, k)
    )
    keys = small.select(key_col).distinct()
    return pruned.join(keys, key_col, "left_semi")
