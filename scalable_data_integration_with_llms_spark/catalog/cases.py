"""Deterministic schema-matching test cases over the driver tables
(FIXTURES.md §B7; mirrors the dataset-JSON records of
``Stable Schema Matching/utils/data_builder.py:16-43``).

Each case pairs a source schema with a target schema and a gold mapping
derivable by construction.  The case definitions are plain Python constants so
the exact same rows can be rendered as a DuckDB ``VALUES`` clause for oracle
SQL (``cases_values_sql``) — the correctness gate then exercises the full
candidate-generation → scoring → validation path against an independent
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from ..functions.localframe import local_df

# case_id -> (source_cols [(name, type)], target_cols [(name, type)],
#             gold pairs [(src, tgt)])
MATCHING_CASES: dict[str, tuple[list[tuple[str, str]], list[tuple[str, str]], list[tuple[str, str]]]] = {
    # 1. shared-concept columns; distractor c_mktsegment has no counterpart
    "tpch:CUSTOMER|tpch:SUPPLIER": (
        [("c_custkey", "bigint"), ("c_name", "varchar(25)"), ("c_nationkey", "integer"),
         ("c_acctbal", "double"), ("c_mktsegment", "varchar(10)")],
        [("s_suppkey", "bigint"), ("s_name", "varchar(25)"), ("s_nationkey", "integer"),
         ("s_acctbal", "double")],
        [("c_custkey", "s_suppkey"), ("c_name", "s_name"),
         ("c_nationkey", "s_nationkey"), ("c_acctbal", "s_acctbal")],
    ),
    # 2. renamed/noised clone (valentine-style schema noise,
    #    eval/eval_dataset.py:31-58): c_name->cust_nm etc., types re-rendered
    "tpch:CUSTOMER|noisy:CUST": (
        [("c_custkey", "bigint"), ("c_name", "varchar(25)"), ("c_nationkey", "integer"),
         ("c_acctbal", "double"), ("c_mktsegment", "varchar(10)")],
        [("cust_id", "integer"), ("cust_nm", "string"), ("nation_code", "numeric"),
         ("acct_balance", "numeric"), ("segment", "string")],
        [("c_custkey", "cust_id"), ("c_name", "cust_nm"), ("c_nationkey", "nation_code"),
         ("c_acctbal", "acct_balance"), ("c_mktsegment", "segment")],
    ),
    # 3. low-overlap pair: only orderkey aligns -> exercises
    #    "none of the options" semantics (stable_match.py:40-43)
    "tpch:ORDERS|tpch:LINEITEM": (
        [("o_orderkey", "bigint"), ("o_custkey", "bigint"), ("o_orderstatus", "varchar(1)"),
         ("o_totalprice", "double"), ("o_orderdate", "timestamp"), ("o_orderpriority", "varchar(15)")],
        [("l_orderkey", "bigint"), ("l_partkey", "bigint"), ("l_suppkey", "bigint"),
         ("l_quantity", "double"), ("l_extendedprice", "double"), ("l_shipdate", "timestamp")],
        [("o_orderkey", "l_orderkey")],
    ),
    # 4. timestamp-heavy pair for type-aware matching; streaming smoke input
    "tpch:EVENTS|noisy:EVENT_LOG": (
        [("event_id", "bigint"), ("ts", "timestamp"), ("user_id", "bigint"),
         ("event_type", "varchar(20)"), ("value", "double"), ("props", "text")],
        [("evt_id", "integer"), ("event_time", "datetime"), ("uid", "integer"),
         ("kind", "string"), ("amount", "float"), ("payload_json", "text")],
        [("event_id", "evt_id"), ("ts", "event_time"), ("user_id", "uid"),
         ("event_type", "kind"), ("value", "amount"), ("props", "payload_json")],
    ),
}

_CATALOG_SCHEMA = (
    "case_id string, side string, col_name string, col_type string, col_idx int"
)
_GOLD_SCHEMA = "case_id string, src string, tgt string"


def _catalog_rows() -> list[tuple[str, str, str, str, int]]:
    # col_idx = position within (case, side) — the reference renders schema
    # descriptions in declared column order (get_schema_json_desc iterates
    # schema["columns"]), so prompt assembly needs the ordinal explicitly:
    # a DataFrame carries no row order through a shuffle.
    rows = []
    for case_id, (src_cols, tgt_cols, _gold) in MATCHING_CASES.items():
        rows += [(case_id, "source", n.lower(), t, i) for i, (n, t) in enumerate(src_cols)]
        rows += [(case_id, "target", n.lower(), t, i) for i, (n, t) in enumerate(tgt_cols)]
    return rows


def _gold_rows() -> list[tuple[str, str, str]]:
    return [
        (case_id, s.lower(), t.lower())
        for case_id, (_s, _t, gold) in MATCHING_CASES.items()
        for s, t in gold
    ]


def case_catalog_df(spark: SparkSession) -> DataFrame:
    """Long-form column catalog of all matching cases (FIXTURES B2-lite):
    ``(case_id, side, col_name, col_type)``."""
    return local_df(spark, _catalog_rows(), _CATALOG_SCHEMA)


def gold_alignments_df(spark: SparkSession) -> DataFrame:
    """Gold alignment pairs ``(case_id, src, tgt)`` (FIXTURES B4)."""
    return local_df(spark, _gold_rows(), _GOLD_SCHEMA)


def _values_sql(rows: list[tuple], cols: list[str]) -> str:
    from ..functions.sql_text import sql_lit as lit

    values = ",\n    ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    return f"(VALUES\n    {values}) AS t({', '.join(cols)})"


def cases_values_sql() -> str:
    """The case catalog as a DuckDB VALUES relation — byte-identical rows to
    ``case_catalog_df`` so oracle SQL can reproduce candidate generation."""
    return _values_sql(
        _catalog_rows(), ["case_id", "side", "col_name", "col_type", "col_idx"]
    )


def gold_values_sql() -> str:
    return _values_sql(_gold_rows(), ["case_id", "src", "tgt"])
