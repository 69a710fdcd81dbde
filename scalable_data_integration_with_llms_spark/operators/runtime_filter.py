"""Bloom runtime filter: prune a fact scan before its shuffle join.

The scale problem: joining a huge fact table to a *filtered* dimension
shuffles every fact row, even though most will never match.  Engines solve
it with runtime filters — build a Bloom filter over the dimension's join
keys after its filter, push the membership test into the fact scan, and let
the exact join clean up the false positives.  Spark has an internal version
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) that only fires under
cost heuristics; this operator is the explicit, always-on form, and doubles
as the engine's demonstration that the pattern is expressible as a plain
column predicate (JVM-codegen, no UDF).

Mechanics: the build side's distinct keys hash to ``k`` positions in an
``m``-bit space; the set bits are collected to the driver (bounded by m/8
bytes — 4 KiB at m=2¹⁵ — REGARDLESS of corpus size, the entire point) and
embedded as a hex-string literal.  The probe predicate tests all k
positions with substr+conv+bitwise ops inside whole-stage codegen, below
the join's Exchange.  Correctness never depends on the filter: it can only
pass extra rows, and the exact join drops them — so any query using this
keeps its plain-join oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom_hex(
    build: DataFrame, key_col: str, m: int = 1 << 15, k: int = 3
) -> str:
    """Collect the build side's Bloom bitmap as a hex string of m/4 nibbles.

    Runs one Spark job (distinct keys → k positions → distinct positions →
    collect).  The collected row count is bounded by m — the driver never
    holds the key set itself.
    """
    positions = (
        build.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"), "key"
        )
        .select(
            F.pmod(F.xxhash64(F.col("j"), F.col("key")), F.lit(m)).alias("pos")
        )
        .distinct()
        .collect()
    )
    nibbles = [0] * (m // 4)
    for row in positions:
        p = int(row.pos)
        nibbles[p // 4] |= 1 << (p % 4)
    return "".join(f"{n:x}" for n in nibbles)


def bloom_probe_predicate(
    hex_mask: str, key: Column | str, m: int = 1 << 15, k: int = 3
) -> Column:
    """Membership predicate testing all k positions against the hex bitmap.

    Pure column expression (substr + conv + bitwise AND) — stays inside
    whole-stage codegen and sits below any downstream Exchange, so the scan
    stage itself drops non-matching rows.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    pred = None
    for j in range(k):
        pos = F.pmod(F.xxhash64(F.lit(j), key_col), F.lit(m))
        nibble = F.conv(
            F.lit(hex_mask).substr((pos / 4).cast("int") + 1, F.lit(1)), 16, 10
        ).cast("int")
        pm = F.pmod(pos, F.lit(4)).cast("int")
        bit_val = (
            F.when(pm == 0, 1).when(pm == 1, 2).when(pm == 2, 4).otherwise(8)
        )
        bit_set = nibble.bitwiseAND(bit_val) != 0
        pred = bit_set if pred is None else (pred & bit_set)
    return pred
