"""Skew-mitigation joins (build mandate: "skewed keys hurt … salting for
skew, AQE for runtime re-plan").

``salted_join`` is the classic explicit remedy when AQE's skew-join split
isn't available or the skew is in the *build* of an aggregation rather than
a join: the hot side's key is widened with a deterministic salt in
[0, factor), and the other side is replicated across every salt value, so
one hot key fans out over ``factor`` shuffle partitions instead of one.

Determinism: the salt derives from ``xxhash64`` of the row key — a pure,
fixed-seed row function, so retries and recomputations salt identically.
(Unlike the sampling operators, the salt never crosses the oracle boundary
— the plain join is the oracle — so it doesn't need the md5 cross-engine
discipline, and the JVM-native hash keeps the hot side's scan cheap.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    salt_key_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on column ``on`` with the skewed side
    salted ``salt_factor`` ways and the small side replicated per salt.

    ``salt_key_cols``: columns identifying a skewed-side row (defaults to
    all of its columns) — the salt must be a pure row function to stay
    stable across recomputation.
    """
    key_cols = salt_key_cols or skewed.columns
    salt = F.pmod(F.xxhash64(F.lit("salt"), *key_cols), F.lit(salt_factor)).cast("int")
    left = skewed.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias("__salt")
    right = small.select("*", salts)
    joined = left.join(right, [on, "__salt"], how)
    return joined.drop("__salt")


def key_histogram(df: DataFrame, key: str | Column, top_n: int = 20) -> DataFrame:
    """Skew diagnosis: the heaviest keys with their share of rows — run this
    before deciding between AQE skew-join and explicit salting."""
    k = F.col(key) if isinstance(key, str) else key
    total = df.count()
    return (
        df.groupBy(k.alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.col("cnt") / F.lit(float(total)))
        .orderBy(F.desc("cnt"))
        .limit(top_n)
    )
