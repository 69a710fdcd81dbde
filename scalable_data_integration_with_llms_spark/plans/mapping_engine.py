"""Schema-Mapping execution engine (SURVEY §3.3 stages 2, 6–8).

Reproduces the reference's twin-namespace evaluation on Spark SQL:

* source tables live as ``source_{t}`` temp views (S8 ATTACH analogue);
* gold SQL populates ``gold_{t}`` views, predicted SQL ``pred_{t}``;
* ``INSERT INTO t SELECT ...`` (illegal on Spark views) is rewritten to an
  accumulated ``CREATE OR REPLACE TEMP VIEW ns_t AS prior UNION ALL SELECT``
  (SURVEY §4 "dialect translation");
* every predicted statement runs under the 30 s job-group timeout with the
  reference's sentinel semantics on the overlap side.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators.overlap import OverlapCounts, table_overlap
from ..plans.sql_rewrite import Statement, prepare_response, rewrite_map_pk
from ..plans.timeout import DEFAULT_TIMEOUT_S, OK, run_with_timeout


@dataclass
class MappingScenario:
    """One mapping task: source tables (DataFrames), target table schemas
    (DDL column lists), gold SQL script, and the meaningful columns used by
    the overlap evaluation."""

    source_tables: dict[str, DataFrame]
    target_tables: dict[str, str]  # table -> "col type, col type" DDL body
    gold_sql: str
    meaningful_cols: dict[str, list[str]]
    join_overlap_sql: str | None = None  # multi-table rules (J6)
    # Temp-view namespace prefix.  Spark temp views are session-global, so
    # CONCURRENT engine runs (an experiment run matrix driven from a thread
    # pool — Spark schedules jobs from pinned Python threads independently)
    # must not share view names: give each run a distinct prefix and every
    # source_/gold_/pred_ view is isolated.  The ``__mappk_*`` dimensions
    # stay unprefixed: they are derived deterministically from the
    # scenario's own source DataFrames, so concurrent re-registration is
    # idempotent — unless two concurrent scenarios bind the SAME source
    # table name to DIFFERENT data and both call map_pk on it (don't).
    view_ns: str = ""


def join_referenced_tables(join_sql: str, tables: dict[str, str] | list[str]) -> list[str]:
    """Target tables the join-overlap SQL actually references, in dict
    order — decided by ``sql_rewrite.referenced_tables``, the same
    literal-aware word-boundary matcher ``_sub_namespace`` substitutes
    with, so the persist selection and the namespace rewrite can never
    diverge (ADVICE r8; previously an independent ``\\b``-regex that also
    scanned string literals)."""
    from ..plans.sql_rewrite import referenced_tables

    return referenced_tables(join_sql, list(tables))


@dataclass
class MappingResult:
    counts: list[OverlapCounts]
    statement_log: list[Statement] = field(default_factory=list)


class MappingEngine:
    def __init__(self, spark: SparkSession, scenario: MappingScenario):
        self.spark = spark
        self.sc = scenario

    def _register_sources(self) -> None:
        vp = self.sc.view_ns
        for name, df in self.sc.source_tables.items():
            df.createOrReplaceTempView(f"{vp}source_{name}")

    def _reset_targets(self, ns: str) -> None:
        """Empty every target table (the reference's reset+reimport,
        DatabaseManager.py:133-143 — free here because plans are lazy).
        Accumulation goes through DataFrame lineage, not view
        self-reference (Spark rejects recursive temp views)."""
        self._acc = getattr(self, "_acc", {})
        for t, ddl in self.sc.target_tables.items():
            cols = ", ".join(
                f"CAST(NULL AS {c.strip().rsplit(' ', 1)[1]}) AS {c.strip().rsplit(' ', 1)[0]}"
                for c in ddl.split(",")
            )
            empty = self.spark.sql(f"SELECT {cols} WHERE 1=0")
            self._acc[(ns, t)] = empty
            empty.createOrReplaceTempView(f"{self.sc.view_ns}{ns}_{t}")

    def _apply_insert(self, ns: str, table: str, select_sql: str) -> None:
        """Accumulate an INSERT into the namespace table: positional INSERT
        semantics — rename the SELECT's columns to the target's and union by
        position (DataFrame lineage captures the prior state by value)."""
        prior = self._acc[(ns, table)]
        new = self.spark.sql(select_sql)
        if len(new.columns) != len(prior.columns):
            raise ValueError(
                f"INSERT arity mismatch for {table}: {len(new.columns)} vs {len(prior.columns)}"
            )
        aligned = new.toDF(*prior.columns)
        for c, dt in prior.dtypes:
            aligned = aligned.withColumn(c, aligned[c].cast(dt))
        updated = prior.unionByName(aligned)
        self._acc[(ns, table)] = updated
        updated.createOrReplaceTempView(f"{self.sc.view_ns}{ns}_{table}")

    def _run_script(self, sql_script: str, ns: str, timeout_s: float) -> list[Statement]:
        """Admission → qualification → execution of one script into ``ns``."""
        src_names = set(self.sc.source_tables)
        tgt_names = set(self.sc.target_tables)
        vp = self.sc.view_ns
        stmts = prepare_response(
            sql_script, src_names, tgt_names,
            source_ns=f"{vp}source", target_ns=f"{vp}{ns}",
        )
        for s in stmts:
            if not s.admitted:
                continue
            # U3: map_pk(tbl, attr, val) -> scalar subquery against a
            # rank-by-value dimension registered on demand
            s.sql, pk_refs = rewrite_map_pk(s.sql)
            for tbl, attr in pk_refs:
                self._register_map_pk_dim(tbl, attr)
            if s.kind == "INSERT" and s.target_table:
                bare = s.target_table.split(".")[-1].removeprefix(f"{vp}{ns}_")
                select_sql = _strip_insert_prefix(s.sql)
                res = run_with_timeout(
                    self.spark,
                    lambda sel=select_sql, b=bare: self._apply_insert(ns, b, sel),
                    timeout_s,
                )
            else:
                res = run_with_timeout(
                    self.spark, lambda q=s.sql: self.spark.sql(q).collect(), timeout_s
                )
            if res.status != OK:
                s.ignore_reason = f"{res.status}: {res.error or ''}".strip()[:200]
        return stmts

    def _register_map_pk_dim(self, tbl: str, attr: str) -> None:
        """Register ``__mappk_{tbl}_{attr}`` = (pk_val, pk_id): dense
        rank-by-value over the source table's distinct attr values — the
        engine's declared map_pk contract (operators/surrogate.py)."""
        from pyspark.sql import functions as F

        from ..operators.surrogate import map_pk_dim

        if tbl not in self.sc.source_tables:
            raise ValueError(f"map_pk references unknown source table {tbl!r}")
        dim = map_pk_dim(self.sc.source_tables[tbl], attr).select(
            F.col(attr).alias("pk_val"), "pk_id"
        )
        dim.createOrReplaceTempView(f"__mappk_{tbl}_{attr}")

    def evaluate(
        self,
        predicted_sql: str,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        overlap_timeout_s: dict[str, float] | float | None = None,
        reference_skips: bool = False,
    ) -> MappingResult:
        """Run gold and predicted scripts into twin namespaces, then the
        EXCEPT/INTERSECT overlap per target table (J5).

        ``overlap_timeout_s``: apply the reference's overlap-level timeout
        sentinel (``Evaluator.py:141-151``: FN = |gold|, FP = ∞) — a float
        for every table (the reference's single 30 s knob) or a per-table
        dict so a test scenario's runaway table doesn't tax the healthy
        tables' wall time.  ``reference_skips`` additionally mirrors
        ``Evaluator.py:199-216``: tables with no meaningful columns are
        never evaluated, and tables where gold and predicted are both
        empty (tp+fp+fn == 0) drop out of the report."""
        self._register_sources()
        self._reset_targets("gold")
        self._reset_targets("pred")
        log = []
        log += self._run_script(self.sc.gold_sql, "gold", timeout_s)
        log += self._run_script(predicted_sql, "pred", timeout_s)
        # tables the join overlap reads are evaluated TWICE (their own
        # table overlap + the join) — persist exactly those, both
        # namespaces, so the insert lineage runs once per namespace (the
        # reference materializes targets eagerly into the DB; this is the
        # lazy engine's equivalent for the re-read case only)
        persisted = []
        if self.sc.join_overlap_sql:
            for t in join_referenced_tables(self.sc.join_overlap_sql, self.sc.target_tables):
                for ns in ("gold", "pred"):
                    df = self._acc[(ns, t)].persist()
                    self._acc[(ns, t)] = df
                    df.createOrReplaceTempView(f"{self.sc.view_ns}{ns}_{t}")
                    persisted.append(df)
        counts = []
        for t in sorted(self.sc.target_tables):
            cols = self.sc.meaningful_cols[t]
            if reference_skips and not cols:
                continue
            gold_df = self.spark.table(f"{self.sc.view_ns}gold_{t}")
            pred_df = self.spark.table(f"{self.sc.view_ns}pred_{t}")
            if isinstance(overlap_timeout_s, dict):
                t_timeout = overlap_timeout_s.get(t)
            else:
                t_timeout = overlap_timeout_s
            if t_timeout is not None:
                from ..operators.overlap import timed_table_overlap

                c = timed_table_overlap(
                    self.spark, gold_df, pred_df, cols, t, timeout_s=t_timeout
                )
            else:
                c = table_overlap(gold_df, pred_df, cols, t)
            if reference_skips and c.tp + c.fp + c.fn == 0:
                continue
            counts.append(c)
        if self.sc.join_overlap_sql:
            gold_join = self.spark.sql(
                _sub_namespace(
                    self.sc.join_overlap_sql, self.sc.target_tables,
                    f"{self.sc.view_ns}gold",
                )
            )
            pred_join = self.spark.sql(
                _sub_namespace(
                    self.sc.join_overlap_sql, self.sc.target_tables,
                    f"{self.sc.view_ns}pred",
                )
            )
            # the join overlap honors the same timeout contract as the
            # per-table overlaps (keyed "__join__" in a dict) — the
            # reference's single knob covers every overlap query
            if isinstance(overlap_timeout_s, dict):
                j_timeout = overlap_timeout_s.get("__join__")
            else:
                j_timeout = overlap_timeout_s
            if j_timeout is not None:
                from ..operators.overlap import timed_table_overlap

                counts.append(
                    timed_table_overlap(
                        self.spark, gold_join, pred_join, gold_join.columns,
                        "__join__", timeout_s=j_timeout,
                    )
                )
            else:
                counts.append(
                    table_overlap(gold_join, pred_join, gold_join.columns, "__join__")
                )
        for df in persisted:
            df.unpersist()
        return MappingResult(counts=counts, statement_log=log)


def _strip_insert_prefix(sql: str) -> str:
    """``INSERT INTO t [(cols)] SELECT ...`` -> the SELECT part."""
    import re

    m = re.search(r"INSERT\s+INTO\s+[\w.]+\s*(?:\([^)]*\))?\s*(SELECT|WITH|VALUES)", sql, re.IGNORECASE)
    if not m:
        raise ValueError(f"unsupported INSERT shape: {sql[:80]}")
    return sql[m.start(1):]


def _sub_namespace(sql: str, target_tables: dict[str, str], ns: str) -> str:
    from ..plans.sql_rewrite import _replace_table_refs

    return _replace_table_refs(sql, {t: f"{ns}_{t}" for t in target_tables})
