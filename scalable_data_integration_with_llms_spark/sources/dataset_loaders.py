"""Per-dataset instance-CSV loaders (S3 full parity).

The reference carries dataset-specific loading quirks for its five schema-
matching corpora (``Stable Schema Matching/prompt/InstanceDataHandler.py``):
dataset dispatch from the example id's shape (:16-26), per-dataset id
parsing (:28-51), drift-column renames for the OMOP CSVs (:138-151,277-289),
mimic-iii's surrogate ``row_id`` drop (:141), synthea's lowercased headers
(:306-309), ehr's case-insensitive table filenames (:165-181), and two
missing-column policies — valentine keeps the schema∩csv intersection
(:122-134) while ehr/bird/synthea/gdc add missing schema columns as NULL
then realign (:195-219).

This module re-expresses those decision rules over Spark CSV scans via
``read_instance_csv``; the data itself isn't shipped in this container, so
tests pin each dataset's realignment behavior on synthesized drift fixtures
(tests/test_dataset_loaders.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .readers import read_instance_csv

# OMOP CSVs predate the schema file's OMOP version: two visit-table columns
# drifted (InstanceDataHandler.py:145-149, 285-289)
OMOP_VISIT_RENAMES = {
    "admitting_source_value": "admitted_from_source_value",
    "admitting_source_concept_id": "admitted_from_concept_id",
}
_OMOP_VISIT_TABLES = {"VISIT_DETAIL", "VISIT_OCCURRENCE"}


def dataset_name_from_id(example_id: str) -> str | None:
    """Dataset dispatch from the id's shape (InstanceDataHandler.py:16-26)."""
    if "/" in example_id:
        return "valentine"
    if example_id.count("|") == 2:
        return "bird"
    if example_id.count("|") == 1 and "synthea" in example_id:
        return "synthea"
    if example_id.count("|") == 1 and "gdc" in example_id:
        return "gdc"
    if example_id.count("|") == 1:
        return "ehr"
    return None


@dataclass
class PairRef:
    """Parsed (db, table) pair, plus bird's domain prefix when present."""

    source_db: str
    source_table: str
    target_db: str
    target_table: str
    domain: str | None = None


def parse_id_parts(example_id: str) -> PairRef:
    """``[domain|]src_db:src_table|tgt_db:tgt_table``
    (InstanceDataHandler.py:28-51; valentine ids are paths, not pairs)."""
    parts = example_id.split("|")
    domain = None
    if len(parts) == 3:
        domain, parts = parts[0], parts[1:]
    (sdb, stbl), (tdb, ttbl) = (p.split(":") for p in parts)
    return PairRef(sdb, stbl, tdb, ttbl, domain)


def standardize_columns(columns: list[str]) -> list[str]:
    """Prompt-side column-name standardization (InstanceDataHandler.py:97-103):
    strip, then remove spaces, parens, dashes, underscores."""
    return [
        col.strip()
        .replace(" ", "")
        .replace("(", "")
        .replace(")", "")
        .replace("-", "")
        .replace("_", "")
        for col in columns
    ]


def _dataset_read_opts(db: str, table: str) -> dict:
    """The drift rules shared by the ehr and synthea OMOP sources."""
    renames = OMOP_VISIT_RENAMES if (db == "omop" and table in _OMOP_VISIT_TABLES) else None
    drop = ("row_id",) if db == "mimic-iii" else ()
    return {"renames": renames, "drop_cols": drop}


def _resolve_case_file(base: str, db: str, table: str) -> str:
    """ehr CSVs are named in either case (InstanceDataHandler.py:165-181):
    try TABLE.csv then table.csv."""
    upper = os.path.join(base, db, "data", f"{table.upper()}.csv")
    lower = os.path.join(base, db, "data", f"{table.lower()}.csv")
    return upper if os.path.exists(upper) else lower


def load_valentine_pair(
    spark: SparkSession,
    base_dir: str,
    example_id: str,
    source_schema_cols: list[str],
    target_schema_cols: list[str],
    swapped: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """valentine layout: ``{base}/{id}/{basename(id)}_{source,target}.csv``;
    ``swapped`` exchanges the two files; columns are the schema∩csv
    INTERSECTION in schema order (no NULL back-fill — valentine's policy,
    InstanceDataHandler.py:105-134)."""
    stem = os.path.join(base_dir, example_id, os.path.basename(example_id))
    src_file, tgt_file = f"{stem}_source.csv", f"{stem}_target.csv"
    if swapped:
        src_file, tgt_file = tgt_file, src_file
    return (
        read_instance_csv(spark, src_file, source_schema_cols, add_missing=False, drop_cols=()),
        read_instance_csv(spark, tgt_file, target_schema_cols, add_missing=False, drop_cols=()),
    )


def load_ehr_pair(
    spark: SparkSession,
    base_dir: str,
    example_id: str,
    source_schema_cols: list[str],
    target_schema_cols: list[str],
    swapped: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """ehr layout: ``{base}/{db}/data/{TABLE|table}.csv`` (case-insensitive
    filename), mimic-iii drops surrogate ``row_id``, omop visit tables take
    the drift renames, missing schema columns back-fill as NULL
    (InstanceDataHandler.py:154-221)."""
    ref = parse_id_parts(example_id)
    if swapped:
        ref = PairRef(ref.target_db, ref.target_table, ref.source_db, ref.source_table)
    src = read_instance_csv(
        spark,
        _resolve_case_file(base_dir, ref.source_db, ref.source_table),
        source_schema_cols,
        **_dataset_read_opts(ref.source_db, ref.source_table),
    )
    tgt = read_instance_csv(
        spark,
        _resolve_case_file(base_dir, ref.target_db, ref.target_table),
        target_schema_cols,
        **_dataset_read_opts(ref.target_db, ref.target_table),
    )
    return src, tgt


def load_bird_pair(
    spark: SparkSession,
    base_dir: str,
    example_id: str,
    source_schema_cols: list[str],
    target_schema_cols: list[str],
    swapped: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """bird layout: ``{base}/{domain}/{db}/data/{table}.csv``; missing schema
    columns back-fill as NULL (InstanceDataHandler.py:224-276)."""
    ref = parse_id_parts(example_id)
    if swapped:
        ref = PairRef(
            ref.target_db, ref.target_table, ref.source_db, ref.source_table, ref.domain
        )
    root = os.path.join(base_dir, ref.domain or "")
    src = read_instance_csv(
        spark,
        os.path.join(root, ref.source_db, "data", f"{ref.source_table}.csv"),
        source_schema_cols,
        drop_cols=(),
    )
    tgt = read_instance_csv(
        spark,
        os.path.join(root, ref.target_db, "data", f"{ref.target_table}.csv"),
        target_schema_cols,
        drop_cols=(),
    )
    return src, tgt


def load_synthea_pair(
    spark: SparkSession,
    base_dir: str,
    example_id: str,
    source_schema_cols: list[str],
    target_schema_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """synthea layout: ``{base}/{db}/data/{table}.csv`` (lowercase
    filenames), ALL headers lowercased after read, omop visit-table drift
    renames, NULL back-fill (InstanceDataHandler.py:292-345)."""
    ref = parse_id_parts(example_id)

    def one(db: str, table: str, cols: list[str]) -> DataFrame:
        return read_instance_csv(
            spark,
            os.path.join(base_dir, db, "data", f"{table.lower()}.csv"),
            cols,
            lowercase_cols=True,
            **{**_dataset_read_opts(db, table), "drop_cols": ()},
        )

    return (
        one(ref.source_db, ref.source_table, source_schema_cols),
        one(ref.target_db, ref.target_table, target_schema_cols),
    )


def load_gdc_pair(
    spark: SparkSession,
    base_dir: str,
    example_id: str,
    source_schema_cols: list[str],
    target_schema_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """gdc layout: ``{base}/{db}/{table}.csv``; NULL back-fill
    (InstanceDataHandler.py:348-410)."""
    ref = parse_id_parts(example_id)
    src = read_instance_csv(
        spark,
        os.path.join(base_dir, ref.source_db, f"{ref.source_table}.csv"),
        source_schema_cols,
        drop_cols=(),
    )
    tgt = read_instance_csv(
        spark,
        os.path.join(base_dir, ref.target_db, f"{ref.target_table}.csv"),
        target_schema_cols,
        drop_cols=(),
    )
    return src, tgt


LOADERS = {
    "valentine": load_valentine_pair,
    "ehr": load_ehr_pair,
    "bird": load_bird_pair,
    "synthea": load_synthea_pair,
    "gdc": load_gdc_pair,
}
