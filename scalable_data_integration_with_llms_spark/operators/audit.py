"""Constraint audit (SURVEY §2.4 A11; reference
``Schema Mapping/DatabaseUtils/DatabaseManager.py:149-200``).

Spark enforces no constraints, so the engine audits them: per-table violation
counts for NOT NULL, INTEGER-parsability, TEXT length bounds, and UNIQUE/PK
duplicates, driven by the SchemaCatalog's declared constraints.

Each table audit is one scan + one grouped-duplicate pass; at 100 TB the
per-column checks are a single map-side aggregate (no shuffle) and the PK
check shuffles once on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.schema_catalog import Relation
from ..functions.localframe import local_df

_INT_RE = "^[0-9]+$"  # DatabaseManager.py:188-189 integer-parsability test


def audit_relation(spark: SparkSession, df: DataFrame, rel: Relation) -> DataFrame:
    """Violation counts for one relation: rows
    ``(table_name, check_name, col_name, violations)``."""
    per_col_aggs = []
    labels: list[tuple[str, str]] = []
    present = set(df.columns)
    for a in rel.attributes:
        if a.name not in present:
            continue
        c = F.col(a.name)
        if not a.nullable:
            per_col_aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)))
            labels.append(("not_null", a.name))
        if a.supertype == "INTEGER":
            per_col_aggs.append(
                F.sum(F.when(c.isNotNull() & ~c.cast("string").rlike(_INT_RE), 1).otherwise(0))
            )
            labels.append(("integer_parse", a.name))
        if a.supertype == "TEXT" and a.size:
            per_col_aggs.append(F.sum(F.when(F.length(c) > a.size, 1).otherwise(0)))
            labels.append(("text_size", a.name))
    rows = []
    if per_col_aggs:
        vals = df.agg(*[agg.alias(f"v{i}") for i, agg in enumerate(per_col_aggs)]).collect()[0]
        rows = [
            (rel.name, check, col, int(vals[i] or 0))
            for i, (check, col) in enumerate(labels)
        ]
    scalar = local_df(spark, 
        rows or [], "table_name string, check_name string, col_name string, violations bigint"
    )
    pk = [c for c in rel.pk if c in present]
    if pk:
        dups = (
            df.groupBy(*pk)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 1)
            .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("violations"))
            .select(
                F.lit(rel.name).alias("table_name"),
                F.lit("unique_pk").alias("check_name"),
                F.lit(",".join(pk)).alias("col_name"),
                F.col("violations").cast("bigint"),
            )
        )
        scalar = scalar.unionByName(dups)
    return scalar


def audit_foreign_keys(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    fk_name: str,
) -> DataFrame:
    """Referential-integrity audit: count child rows whose FK value has no
    parent (orphans) — the FK side of the reference's constraint model
    (Schema Mapping/DatabaseUtils/Schema.py:43-59 declares FKs; SQLite
    enforces them, Spark audits them).  One anti join: the child side is
    pre-projected to the key column, the parent key set is deduped before
    the join (small → broadcast)."""
    parent_keys = parent.select(F.col(pk_col).alias(fk_col)).distinct()
    orphans = (
        child.select(fk_col)
        .filter(F.col(fk_col).isNotNull())
        .join(parent_keys, fk_col, "left_anti")
    )
    return orphans.agg(
        F.lit(fk_name).alias("fk_name"),
        F.count(F.lit(1)).alias("orphan_rows"),
        F.countDistinct(fk_col).alias("orphan_keys"),
    )
