"""Sources (SURVEY §2.1 S1–S8).

The driver's synthetic tables are parquet; the reference's instance data is
CSV read with every cell a string and columns realigned to the declared schema
(``Stable Schema Matching/prompt/InstanceDataHandler.py:122-123,188-217``).
Both paths are provided:

* ``load_table``/``load_tables`` — parquet scans of the test tables.  Filters
  and projections applied downstream push into these scans (Catalyst handles
  PushedFilters/ReadSchema; verified in tests/test_plans.py).
* ``read_instance_csv`` — the reference's untyped-CSV semantics: all-string
  read, rename drift columns, drop surrogate ``row_id``, add missing schema
  columns as NULL, realign to schema order (S3).
* ``register_views`` — one temp view per table, the Spark analogue of the
  reference's ATTACHed SQLite namespaces
  (``Schema Mapping/DatabaseUtils/DatabaseManager.py:97-116``, S8).
"""

from __future__ import annotations

import os
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _flaky_retry_wrap(df: DataFrame) -> DataFrame:
    """Recomputation-under-retry adversary (SURVEY §4's determinism trap;
    VERDICT r9 task #4), active only under ``SDI_FLAKY_SOURCES=1``: a
    pass-through ``mapInPandas`` that FAILS the first attempt of every even
    source partition, so Spark recomputes those tasks from the scan.  Needs
    a retry-permitting master (``SDI_TASK_MAX_FAILURES`` → ``local[N,F]``,
    session.py).  Every query result must be byte-identical with and
    without the injection: the engine's randomness is all seeded md5 over
    row keys (functions/determinism.py) and row order is never load-bearing,
    so a recomputed partition reproduces exactly — the property that keeps
    results stable on a real cluster where task retries and speculative
    execution are routine, not adversarial.  The wrapper deliberately sits
    ON the scan (costing pushdown/pruning): an ugly plan that must still be
    correct, like the codegen-off sweep."""

    def gen(it):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None and tc.attemptNumber() == 0 and tc.partitionId() % 2 == 0:
            raise RuntimeError("SDI_FLAKY_SOURCES: injected first-attempt failure")
        yield from it

    return df.mapInPandas(gen, schema=df.schema)


def spread_scan(df: DataFrame) -> DataFrame:
    """Repartition a narrow scan across the cluster's task slots when it
    arrives in fewer partitions than HALF the default parallelism — the
    single-file-scan fix (one local parquet file = ONE input partition, so
    any explode/md5-heavy map side otherwise runs on one core; profiled on
    q_duplicate_spans, q_tfidf_top_terms, q_bloom_contamination at sf0.1).

    The guard keeps this a no-op at cluster scale, where a real input
    already has enough splits — the shuffle is only paid when the scan is
    provably under-parallel, and it moves each doc row once, which the
    map-side work it unlocks more than repays.  Same auto-detect contract
    as ``operators.dedup.word_shingles(spread=None)``."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, par // 2):
        return df.repartition(par)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one test table. Column pruning + predicate pushdown
    happen at this scan when the caller selects/filters downstream.

    ``events.ts`` has shipped in two physical layouts across testdata
    generations: parquet TIMESTAMP(NANOS) (unreadable natively — read nanos
    as long and truncate to micros, matching DuckDB/Arrow readers) and plain
    TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ — cast to the session-zone
    timestamp type so downstream window/filter exprs see one type either
    way; session tz is pinned UTC so values are identical).
    """
    flaky = os.environ.get("SDI_FLAKY_SOURCES") == "1"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer div — double division would lose precision above 2^53 ns
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return _flaky_retry_wrap(df) if flaky else df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _flaky_retry_wrap(df) if flaky else df


def load_events_ntz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` as TIMESTAMP_NTZ — the parquet wall time with
    NO session-timezone cast.

    ``load_table``'s NTZ→LTZ cast round-trips for calendar-in/render-out
    queries (the session-TZ shift applied on the way in is undone when the
    result timestamp is rendered), so those stay session-TZ independent.
    But a query that extracts an ABSOLUTE epoch mid-flight (``unix_*`` on
    the cast column) bakes the shift into a number that never renders back
    — under a non-UTC session TZ it silently diverges from the DuckDB
    oracle's ``epoch(naive)`` (found by the r9 CORRECTNESS_TZ sweep on
    q_user_value_trend).  Such queries must read the wall time NTZ and do
    calendar math (``timestampdiff``), which no session TZ can shift."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import types as T

    if isinstance(df.schema["ts"].dataType, T.LongType):
        # nanos layout: epoch nanos -> calendar add onto the NTZ epoch
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " timestamp_ntz'1970-01-01 00:00:00')"
            ),
        )
    # else: micros layout already reads as TIMESTAMP_NTZ
    return _flaky_retry_wrap(df) if os.environ.get("SDI_FLAKY_SOURCES") == "1" else df


def load_tables(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, namespace: str = "", names: Iterable[str] = TABLES) -> dict[str, DataFrame]:
    """Create ``{namespace}_{table}`` (or bare-named) temp views — the engine's
    replacement for SQLite ATTACH namespaces (S8).  Re-registration is the
    "reset" operation: views are lazy over immutable parquet, so re-attaching
    is free (the reference re-imports data between evaluations,
    ``DatabaseManager.py:133-143``)."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        view = f"{namespace}_{name}" if namespace else name
        df.createOrReplaceTempView(view)
        out[view] = df
    return out


def read_instance_csv(
    spark: SparkSession,
    path: str,
    schema_cols: list[str],
    renames: Mapping[str, str] | None = None,
    drop_cols: Iterable[str] = ("row_id",),
    add_missing: bool = True,
    lowercase_cols: bool = False,
) -> DataFrame:
    """Untyped instance-data CSV read with the reference's realignment
    semantics (S3, ``InstanceDataHandler.py:104-410``):

    every cell a string (no inferSchema), optionally lowercased headers
    (synthea, :306-309), drift columns renamed, surrogate ``row_id``
    dropped, columns missing from the file added as NULL (or, with
    ``add_missing=False``, the valentine policy: keep only the schema∩csv
    intersection, :122-134), and the result projected in declared-schema
    order.  Per-dataset front-ends live in ``sources/dataset_loaders.py``.
    """
    df = spark.read.csv(path, header=True, inferSchema=False)
    if lowercase_cols:
        df = df.toDF(*[c.lower() for c in df.columns])
    if renames:
        df = df.withColumnsRenamed(dict(renames))
    for c in drop_cols:
        if c in df.columns:
            df = df.drop(c)
    present = set(df.columns)
    keep = schema_cols if add_missing else [c for c in schema_cols if c in present]
    return df.select(
        [
            (F.col(c) if c in present else F.lit(None).cast("string")).alias(c)
            for c in keep
        ]
    )
