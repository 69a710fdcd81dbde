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
