"""Python DataSource (Spark 4 `pyspark.sql.datasource` API) for the
matching-dataset JSON format — the pluggable-connector form of
``dataset_json.load_dataset_json``.

Why both exist: ``spark.read.json`` with the declared schema is the right
default (JVM-side parse, predicate/column pruning); this connector is the
engine's demonstration of the public custom-datasource extension point —
the shape you implement when the format ISN'T one Spark ships (proprietary
layouts, APIs, seekable archives).  One ``InputPartition`` per file gives
file-grained parallelism; each partition parses with the stdlib and yields
rows matching the SAME declared ``CASE_SCHEMA`` (never inferred), so the
two paths are interchangeable — and the parity test holds them to that.

Usage::

    spark.dataSource.register(DatasetJSONDataSource)
    spark.read.format("sdi_dataset_json").load(path)   # file or directory
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .dataset_json import CASE_SCHEMA

FORMAT_NAME = "sdi_dataset_json"


def _case_row(case: dict) -> tuple:
    def side(s: dict | None):
        if s is None:
            return None
        cols = [
            (c.get("name"), c.get("type"), c.get("column_description"), c.get("is_pk"))
            for c in (s.get("columns") or [])
        ]
        return (s.get("name"), s.get("description"), cols)

    return (
        case.get("id"),
        case.get("gold_mapping"),
        side(case.get("source_schema")),
        side(case.get("target_schema")),
        case.get("source_rows"),
        case.get("target_rows"),
    )


class DatasetJSONReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError(f"{FORMAT_NAME}: .load(path) is required")
        if os.path.isdir(path):
            self._files = sorted(
                os.path.join(path, f) for f in os.listdir(path) if f.endswith(".json")
            )
        else:
            self._files = [path]

    def partitions(self):
        # one partition per file: file-grained parallelism, no driver parse
        return [InputPartition(f) for f in self._files]

    def read(self, partition: InputPartition):
        with open(partition.value) as f:
            for case in json.load(f):
                yield _case_row(case)


class DatasetJSONDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return CASE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return DatasetJSONReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(DatasetJSONDataSource)
