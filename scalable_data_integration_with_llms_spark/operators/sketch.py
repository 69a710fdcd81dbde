"""Count-min sketch — fixed-size frequency summary for heavy-hitter queries
over unbounded key domains (the sketch a 100 TB pipeline keeps when the
exact groupBy's distinct-key state would not fit).

Hashes derive from md5(j ':' key) (functions/determinism.py discipline), so
every cell — and therefore every estimate — is bit-identical in any engine:
the sketch itself is DuckDB-oracle-checkable, no tolerance needed.

Scale shape: keys are pre-aggregated FIRST (one shuffle of distinct keys,
map-side combine does the heavy lifting), then the tiny distinct-key frame
explodes ×depth into cells.  The sketch is depth × width rows regardless of
input size; estimation is a broadcast join against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_col(j, key, width: int):
    """Column index of `key` in sketch row `j`: md5-derived 60-bit hash mod
    width (non-negative)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", j.cast("string"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return h % width


def count_min_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: (j, col, cell) counter matrix, depth × width cells."""
    keyc = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    rows = keyc.select(
        "key", "cnt", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    )
    return (
        rows.select("j", _cms_col(F.col("j"), F.col("key"), width).alias("col"), "cnt")
        .groupBy("j", "col")
        .agg(F.sum("cnt").alias("cell"))
    )


def bloom_membership(
    build: DataFrame,
    probe: DataFrame,
    key_col: str,
    n_hashes: int = 3,
    m: int = 4096,
) -> DataFrame:
    """Bloom-filter membership: ``probe`` keys tested against the filter
    built from ``build`` keys.  Returns (key, in_filter).

    Formulated as joins, not a driver-side bitset: the set-bit table is the
    DISTINCT (pos) frame of the build side — at most min(m, k·|build|) rows
    regardless of corpus size — broadcast into a semi-join against the probe
    side's positions; a probe key is "in" iff all ``n_hashes`` of its
    positions are set.  This is the sketch to keep when the exact distinct
    key set is too large to broadcast but m bits are not: the membership
    table is bounded by m, and the one corpus-sized pass is the probe scan.
    """
    bits = (
        build.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            "key", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("j")
        )
        .select(_cms_col(F.col("j"), F.col("key"), m).alias("pos"))
        .distinct()
    )
    probes = (
        probe.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            "key", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("j")
        )
        .select("key", _cms_col(F.col("j"), F.col("key"), m).alias("pos"))
    )
    hit_counts = (
        probes.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_set"))
    )
    return (
        probe.select(F.col(key_col).alias("key"))
        .distinct()
        .join(hit_counts, "key", "left")
        .select(
            "key",
            (F.coalesce(F.col("n_set"), F.lit(0)) == n_hashes).alias("in_filter"),
        )
    )


def cms_estimates(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Per-key (exact_cnt, est_cnt): est = min over rows of the key's cell.
    The CMS guarantee est >= exact always holds (collisions only inflate);
    tested as a property and via the exact oracle."""
    cells = count_min_cells(df, key_col, depth, width)
    keyc = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    probes = keyc.select(
        "key",
        "exact_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    ).select("key", "exact_cnt", "j", _cms_col(F.col("j"), F.col("key"), width).alias("col"))
    return (
        probes.join(F.broadcast(cells), ["j", "col"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cell").alias("est_cnt"))
    )
