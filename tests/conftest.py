"""Shared test fixtures: one SparkSession per test session, a DuckDB
connection with the driver's view registration, and the oracle-compare
helper mirroring the driver's correctness gate (row-count + schema-width +
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalable_data_integration_with_llms_spark.session import get_spark
from scalable_data_integration_with_llms_spark.sources.readers import TABLES

SF_DIR = os.environ.get("SDI_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("sdi-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for order-insensitive comparison."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # bit-identical doubles -> identical repr
    return str(v)


def rows_key(rows, colnames):
    """Sort columns by name (driver semantics), then rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(row[i]) for i in order) for row in rows)


def assert_oracle_match(spark, duck, name, sf_dir=SF_DIR):
    """Run query `name` on Spark and its oracle on DuckDB; require identical
    order-insensitive values — the driver's t2 gate, locally."""
    from scalable_data_integration_with_llms_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    ores = duck.execute(ORACLES[name])
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(scols) == sorted(ocols), f"{name}: columns {sorted(scols)} != {sorted(ocols)}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} != {len(orows)}"
    skey, okey = rows_key(srows, scols), rows_key(orows, ocols)
    mismatches = [(a, b) for a, b in zip(skey, okey) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
