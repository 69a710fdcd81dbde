"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the scan you avoid beats the scan you optimize: sorting files by
a space-filling curve over the columns queries filter on tightens per-file
min/max ranges on ALL of those columns at once, so parquet row-group
statistics (and partition-level min/max indexes) prune multi-dimensional
predicates — the effect Delta/Iceberg call Z-ORDER clustering.  The key
itself is plain bit arithmetic, JVM-side and codegen-friendly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative ints:
    x occupies even bit positions, y odd.  Equal-range prefixes of the key
    are quadrants of the (x, y) plane — sorting by it co-locates rows close
    in BOTH dimensions."""
    cx = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    cy = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    parts = []
    for i in range(bits):
        bit = F.lit(1).cast("bigint")
        parts.append(F.shiftleft(F.shiftright(cx, i).bitwiseAND(bit), 2 * i))
        parts.append(F.shiftleft(F.shiftright(cy, i).bitwiseAND(bit), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("z_key")


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical computation as engine-portable SQL (oracle twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, bits: int = 16, files: int = 32
) -> None:
    """Write parquet clustered by the Z-curve: range-partition by key into
    ``files`` output files, sort within each — every file then covers one
    compact curve segment, i.e. one tight (x, y) rectangle union."""
    (
        df.withColumn("z_key", zorder_key(x, y, bits))
        .repartitionByRange(files, "z_key")
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.mode("overwrite")
        .parquet(path)
    )
