"""Schema-Mapping execution surface (SURVEY §3.3): a full differential
evaluation — simulated LLM SQL script (code fences, inadmissible statements,
bare table names) → admission → namespace qualification → Spark SQL execution
into twin namespaces → EXCEPT/INTERSECT overlap → P/R/F1.

The oracle reproduces the final row-set algebra directly over the base
tables, so this checks the whole execution path end-to-end, not just the
counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.mapping_engine import MappingEngine, MappingScenario
from ..sources.readers import load_table
from .registry import query

_GOLD_SQL = """
INSERT INTO cust_orders
SELECT c_name, o_orderkey, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey;
INSERT INTO big_orders
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 200000;
"""

# Simulated LLM response: prose + fenced SQL + statements the admission rules
# must drop (CREATE of a target table) + systematic errors (extra filter on
# cust_orders -> FN; looser filter on big_orders -> FP).
_PREDICTED_RESPONSE = """
Here is the mapping you asked for:

```sql
CREATE TABLE cust_orders (c_name TEXT);
INSERT INTO cust_orders
SELECT c_name, o_orderkey, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 50000;
INSERT INTO big_orders
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 150000;
```

Hope this helps!
"""

_JOIN_SQL = "SELECT c_name, o_orderkey FROM cust_orders JOIN big_orders USING (o_orderkey)"


def _prf1_sql(tp: str, fp: str, fn: str) -> str:
    p = f"CASE WHEN {tp} + {fp} = 0 THEN 0.0 ELSE {tp} / ({tp} + {fp}) END"
    r = f"CASE WHEN {tp} + {fn} = 0 THEN 0.0 ELSE {tp} / ({tp} + {fn}) END"
    return f"""
  CASE WHEN {tp} + {fp} + {fn} = 0 THEN 1.0 ELSE {p} END AS precision,
  CASE WHEN {tp} + {fp} + {fn} = 0 THEN 1.0 ELSE {r} END AS recall,
  CASE WHEN {tp} + {fp} + {fn} = 0 THEN 1.0
       WHEN ({p}) + ({r}) = 0 THEN 0.0
       ELSE (2.0 * ({r}) * ({p})) / (({r}) + ({p})) END AS f1
"""


_MAPPING_ORACLE = f"""
WITH gold_cust AS (
  SELECT c_name, o_orderkey, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
),
pred_cust AS (
  SELECT c_name, o_orderkey, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_totalprice > 50000
),
gold_big AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 200000),
pred_big AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 150000),
gold_join AS (SELECT c_name, o_orderkey FROM gold_cust JOIN gold_big USING (o_orderkey)),
pred_join AS (SELECT c_name, o_orderkey FROM pred_cust JOIN pred_big USING (o_orderkey)),
counts AS (
  SELECT 'cust_orders' AS table_name,
         (SELECT COUNT(*) FROM (SELECT * FROM pred_cust INTERSECT SELECT * FROM gold_cust)) AS tp,
         CAST((SELECT COUNT(*) FROM (SELECT * FROM pred_cust EXCEPT SELECT * FROM gold_cust)) AS DOUBLE) AS fp,
         (SELECT COUNT(*) FROM (SELECT * FROM gold_cust EXCEPT SELECT * FROM pred_cust)) AS fn
  UNION ALL
  SELECT 'big_orders',
         (SELECT COUNT(*) FROM (SELECT * FROM pred_big INTERSECT SELECT * FROM gold_big)),
         CAST((SELECT COUNT(*) FROM (SELECT * FROM pred_big EXCEPT SELECT * FROM gold_big)) AS DOUBLE),
         (SELECT COUNT(*) FROM (SELECT * FROM gold_big EXCEPT SELECT * FROM pred_big))
  UNION ALL
  SELECT '__join__',
         (SELECT COUNT(*) FROM (SELECT * FROM pred_join INTERSECT SELECT * FROM gold_join)),
         CAST((SELECT COUNT(*) FROM (SELECT * FROM pred_join EXCEPT SELECT * FROM gold_join)) AS DOUBLE),
         (SELECT COUNT(*) FROM (SELECT * FROM gold_join EXCEPT SELECT * FROM pred_join))
)
SELECT table_name, tp, fp, fn, {_prf1_sql("tp", "fp", "fn")}
FROM counts
"""


@query("q_mapping_overlap", _MAPPING_ORACLE)
def q_mapping_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    scenario = MappingScenario(
        source_tables={
            "orders": load_table(spark, sf_dir, "orders"),
            "customer": load_table(spark, sf_dir, "customer"),
        },
        target_tables={
            "cust_orders": "c_name string, o_orderkey bigint, o_totalprice double",
            "big_orders": "o_orderkey bigint, o_totalprice double",
        },
        gold_sql=_GOLD_SQL,
        meaningful_cols={
            "cust_orders": ["c_name", "o_orderkey", "o_totalprice"],
            "big_orders": ["o_orderkey", "o_totalprice"],
        },
        join_overlap_sql=_JOIN_SQL,
    )
    engine = MappingEngine(spark, scenario)
    result = engine.evaluate(_PREDICTED_RESPONSE)
    from ..operators.overlap import overlap_counts_df

    return overlap_counts_df(spark, result.counts)


# -- P7: subsumed-mapping-rule removal ----------------------------------------

_RULES = [
    ("r1", ["orders"], ["t_orders"]),
    ("r2", ["orders", "customer"], ["t_orders"]),          # subsumes r1
    ("r3", ["orders", "customer"], ["t_orders", "t_cust"]),  # subsumes r1, r2
    ("r4", ["lineitem"], ["t_lines"]),                      # independent
    ("r5", ["lineitem"], ["t_lines"]),                      # duplicate of r4 -> kept (equal sets)
]

_RULES_SQL = ",\n  ".join(
    "('" + r + "', [" + ", ".join(f"'{s}'" for s in srcs) + "], ["
    + ", ".join(f"'{t}'" for t in tgts) + "])"
    for r, srcs, tgts in _RULES
)

_SUBSUMED_ORACLE = f"""
WITH rules AS (SELECT * FROM (VALUES
  {_RULES_SQL}) AS t(rule_id, src_rels, tgt_rels))
SELECT rule_id FROM rules
WHERE rule_id NOT IN (
  SELECT DISTINCT a.rule_id
  FROM rules a JOIN rules b
    ON b.rule_id <> a.rule_id
   AND list_has_all(b.src_rels, a.src_rels)
   AND list_has_all(b.tgt_rels, a.tgt_rels)
   AND (NOT (list_has_all(a.src_rels, b.src_rels) AND list_has_all(a.tgt_rels, b.tgt_rels))
        OR b.rule_id > a.rule_id)
)
"""


@query("q_subsumed_rules", _SUBSUMED_ORACLE)
def q_subsumed_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 (MappingLoader.py:76-88): drop rules whose source+target relation
    sets are subsets of another rule's.  The reference removes sequentially,
    so equal-set duplicates keep only the later rule; the engine's
    deterministic contract is rule-id order: a is removed when subsumed by a
    strict superset, or by an equal-set rule with a greater id."""
    from pyspark.sql import functions as F

    rules = spark.createDataFrame(
        _RULES, "rule_id string, src_rels array<string>, tgt_rels array<string>"
    )
    a = rules.alias("a")
    b = rules.select(
        F.col("rule_id").alias("b_id"),
        F.col("src_rels").alias("b_src"),
        F.col("tgt_rels").alias("b_tgt"),
    )

    def subset(x: str, y: str):
        return F.size(F.array_except(F.col(x), F.col(y))) == 0

    subsumed = a.join(
        b,
        (F.col("a.rule_id") != F.col("b_id"))
        & subset("a.src_rels", "b_src")
        & subset("a.tgt_rels", "b_tgt")
        & (
            ~(subset("b_src", "a.src_rels") & subset("b_tgt", "a.tgt_rels"))
            | (F.col("b_id") > F.col("a.rule_id"))
        ),
        "left_semi",
    )
    return rules.join(subsumed, "rule_id", "left_anti").select("rule_id")


# -- U3 in the mapping path: gold SQL calling map_pk --------------------------

_MAPPK_GOLD_SQL = """
INSERT INTO cust_dim
SELECT map_pk('customer', 'c_name', c_name), c_name, c_mktsegment FROM customer;
"""

# predicted script re-keys only one segment: every other segment's rows are
# FNs, so the overlap actually exercises the surrogate ids end to end
_MAPPK_PREDICTED = """
```sql
INSERT INTO cust_dim
SELECT map_pk('customer', 'c_name', c_name), c_name, c_mktsegment
FROM customer WHERE c_mktsegment = 'BUILDING';
```
"""

_MAPPK_ORACLE = f"""
WITH dim AS (
  SELECT pk_val, ROW_NUMBER() OVER (ORDER BY pk_val) - 1 AS pk_id
  FROM (SELECT DISTINCT c_name AS pk_val FROM customer)
),
gold AS (
  SELECT pk_id, c_name, c_mktsegment
  FROM customer JOIN dim ON c_name = pk_val
),
pred AS (
  SELECT pk_id, c_name, c_mktsegment
  FROM customer JOIN dim ON c_name = pk_val
  WHERE c_mktsegment = 'BUILDING'
),
counts AS (
  SELECT 'cust_dim' AS table_name,
         (SELECT COUNT(*) FROM (SELECT * FROM pred INTERSECT SELECT * FROM gold)) AS tp,
         CAST((SELECT COUNT(*) FROM (SELECT * FROM pred EXCEPT SELECT * FROM gold)) AS DOUBLE) AS fp,
         (SELECT COUNT(*) FROM (SELECT * FROM gold EXCEPT SELECT * FROM pred)) AS fn
)
SELECT table_name, tp, fp, fn, {_prf1_sql("tp", "fp", "fn")}
FROM counts
"""


@query("q_mapping_map_pk", _MAPPK_ORACLE)
def q_mapping_map_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 inside the mapping path: gold AND predicted SQL call
    ``map_pk(tbl, attr, val)``; the rewrite layer turns each call into a
    scalar subquery against the rank-by-value ``__mappk_*`` dimension the
    engine registers on demand (the engine's declared contract for the
    reference's stateful first-seen UDF, DatabaseManager.py:84-95).  The
    oracle derives the same dense ids with a window, so the surrogate keys
    themselves are value-checked through the whole execution path."""
    scenario = MappingScenario(
        source_tables={"customer": load_table(spark, sf_dir, "customer")},
        target_tables={"cust_dim": "pk_id bigint, c_name string, c_mktsegment string"},
        gold_sql=_MAPPK_GOLD_SQL,
        meaningful_cols={"cust_dim": ["pk_id", "c_name", "c_mktsegment"]},
    )
    engine = MappingEngine(spark, scenario)
    result = engine.evaluate(_MAPPK_PREDICTED)
    from ..operators.overlap import overlap_counts_df

    return overlap_counts_df(spark, result.counts)


# -- S6: BibTeX import (sources/bibtex.py) ------------------------------------
# The Amalgam data blob isn't shipped (reference .MISSING_LARGE_BLOBS), so
# the loader is pinned on a synthesized fixture exercising the public
# format's corners: brace-nested values, quoted values, bare numbers,
# @comment skipping, "Last, First" / "von Last, Jr, First" re-ordering,
# co-author splitting, unknown-entry-type skipping, and both surrogate
# regimes (occurrence AuthIDs + shared pk counter).  The oracle is the
# hand-computed golden link table.

_BIB_FIXTURE = """
@article{k1, author = {Doe, John and Alice B. Smith}, title = {A Title},
         year = 1999, journal = {J. Data}}
@comment{ignore me}
@book{k2, author = {von Neumann, Jr, John}, title = {The {Big} Book},
      publisher = "Pub House", year = {2001}}
@phdthesis{k3, author = {Eve Adams}, title = {Thesis}}
@inproceedings{k4, author = {Smith, Alice B. and Doe, John},
               title = {Proc Paper}, booktitle = {Conf}}
"""

_BIBTEX_ORACLE = """
SELECT * FROM (VALUES
  (0, 'Article', 'k1', 0, 'John Doe'),
  (0, 'Article', 'k1', 1, 'Alice B. Smith'),
  (1, 'Book', 'k2', 2, 'John von Neumann Jr'),
  (2, 'InProceedings', 'k4', 4, 'Alice B. Smith'),
  (2, 'InProceedings', 'k4', 5, 'John Doe')
) AS t(pk_id, relation, key, auth_id, name)
"""


@query("q_bibtex_import", _BIBTEX_ORACLE)
def q_bibtex_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bibtex import author_occurrences, bib_entries_df, route_entries

    entries = bib_entries_df(spark, _BIB_FIXTURE)
    routed = route_entries(entries).select("entry_idx", "pk_id", "relation", "key")
    occ = author_occurrences(entries)
    return routed.join(occ, "entry_idx").select(
        "pk_id", "relation", "key", "auth_id", "name"
    )
