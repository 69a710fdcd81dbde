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
``m``-bit space; the set bits are collected to the driver as ``m/64``
bigint words (16 KiB at m=2¹⁷ — bounded by m REGARDLESS of corpus size,
the entire point) and embedded as a constant-folded array literal.  The
probe predicate is two ``element_at`` lookups + a bitwise AND per hash —
O(1) per row inside whole-stage codegen, below the join's Exchange.  (A
first cut indexed a hex-string literal with variable-start ``substr``;
UTF8String substring is O(string length) per row — 8 KiB scanned per
probe — which benchmarked 20× slower than the word-array form.)

Correctness never depends on the filter: it can only pass extra rows, and
the exact join drops them — so any query using this keeps its plain-join
oracle.

Keys are canonicalized with ``CAST(key AS STRING)`` before hashing on BOTH
the build and probe side.  ``xxhash64`` hashes by *input type*, so without
the cast a bigint probe key against an int build key (a pairing the
equi-join itself tolerates via implicit widening) would hash differently
and silently drop matching rows — violating the pass-extra-rows-only
guarantee.  The string cast makes the integral/string families agree
(``5`` and ``5L`` both hash as ``"5"``); fractional build/probe type
mismatches (int vs double) are outside the contract, as they are for the
equi-join's own key semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M = 1 << 17  # 131072 bits = 2048 words = 16 KiB broadcast


def build_bloom_words(
    build: DataFrame, key_col: str, m: int = DEFAULT_M, k: int = 3
) -> list[int]:
    """Collect the build side's Bloom bitmap as m/64 bigint words.

    Runs one Spark job: keys → k positions → per-word BIT_OR aggregation —
    so the driver collects at most m/64 rows (2048 at the default m), never
    the positions and never the key set.  Duplicate build keys need no
    pre-``distinct``: BIT_OR is idempotent and the partial (map-side)
    aggregation collapses every partition to ≤ m/64 rows before the
    exchange, so skipping the distinct removes a whole key-sized shuffle
    (guide §2.4 — a ``distinct`` whose consumer is duplicate-insensitive)
    while the one remaining shuffle stays bounded by m at any scale.
    """
    pow2 = F.lit(
        [b - (1 << 64) if (b := 1 << i) >= (1 << 63) else b for i in range(64)]
    )
    pos = F.pmod(
        F.xxhash64(F.col("j"), F.col("key").cast("string")), F.lit(m)
    )
    word_rows = (
        build.select(F.col(key_col).alias("key"))
        .select(F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"), "key")
        .select(
            (pos / 64).cast("int").alias("w"),
            F.element_at(pow2, F.pmod(pos, F.lit(64)).cast("int") + 1).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * (m // 64)
    for row in word_rows:
        words[int(row.w)] = int(row.bits)
    return words


def bloom_probe_predicate(
    words: list[int], key: Column | str, k: int = 3
) -> Column:
    """Membership predicate testing all k positions against the word array.

    Both arrays are true literals (single objects, no per-row
    construction) — each probe is O(1) ``element_at`` + bitwise AND inside
    whole-stage codegen, sitting below any downstream Exchange.
    """
    m = len(words) * 64
    key_col = F.col(key) if isinstance(key, str) else key
    # F.lit(list) builds a true array LITERAL — one object, not a per-row
    # CreateArray of 2048 children (measured ~10x slower when evaluated
    # per row)
    word_arr = F.lit(words)
    pow2 = F.lit(
        [b - (1 << 64) if (b := 1 << i) >= (1 << 63) else b for i in range(64)]
    )
    pred = None
    for j in range(k):
        pos = F.pmod(F.xxhash64(F.lit(j), key_col.cast("string")), F.lit(m))
        word = F.element_at(word_arr, (pos / 64).cast("int") + 1)
        bit = F.element_at(pow2, F.pmod(pos, F.lit(64)).cast("int") + 1)
        bit_set = word.bitwiseAND(bit) != 0
        pred = bit_set if pred is None else (pred & bit_set)
    return pred
