"""S1/S2 on real dataset JSON: the matching-task scan the reference drives
everything from (``Stable Schema Matching/utils/data_builder.py:16-43``) as
a distributed read.

One DataFrame of test cases with the declared nested schema (never
inferred — SURVEY §1.3), plus the S1 perturbations as column expressions:

* seeded column shuffle — the engine's deterministic contract (order by
  ``md5(seed:name)``), replacing ``random.Random(seed).shuffle``
  (``data_builder.py:21-24``) with an order that any engine reproduces;
* source/target swap, which also reverses every gold pair
  (``data_builder.py:26-38``);

and the S2 flatten (``load_schemas``, ``data_builder.py:133-185``) as an
explode to the long catalog frame that downstream validation joins against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_COLUMN = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("column_description", T.StringType()),
        T.StructField("is_pk", T.StringType()),
    ]
)
_SCHEMA_SIDE = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("columns", T.ArrayType(_COLUMN)),
    ]
)
CASE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("gold_mapping", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("source_schema", _SCHEMA_SIDE),
        T.StructField("target_schema", _SCHEMA_SIDE),
        # instance-row counts appear in ehr, not synthea — nullable by schema
        T.StructField("source_rows", T.LongType()),
        T.StructField("target_rows", T.LongType()),
    ]
)


def _shuffled(side: str, seed: int):
    """Deterministic seeded shuffle of a schema side's column array:
    order by md5('<seed>:' || name)."""
    return F.col(side).withField(
        "columns",
        F.array_sort(
            F.col(f"{side}.columns"),
            lambda a, b: F.when(
                F.md5(F.concat_ws(":", F.lit(str(seed)), a["name"]))
                < F.md5(F.concat_ws(":", F.lit(str(seed)), b["name"])),
                -1,
            )
            .when(
                F.md5(F.concat_ws(":", F.lit(str(seed)), a["name"]))
                > F.md5(F.concat_ws(":", F.lit(str(seed)), b["name"])),
                1,
            )
            .otherwise(0),
        ),
    )


def load_dataset_json(
    spark: SparkSession,
    path: str,
    shuffle_seed: int | None = None,
    swap: bool = False,
) -> DataFrame:
    """Load a matching dataset (array-of-cases JSON) with the declared
    schema; optionally column-shuffle per seed and/or swap source↔target
    (swapping also reverses each gold pair)."""
    df = spark.read.json(path, multiLine=True, schema=CASE_SCHEMA)
    if shuffle_seed is not None:
        df = df.withColumns(
            {
                "source_schema": _shuffled("source_schema", shuffle_seed),
                "target_schema": _shuffled("target_schema", shuffle_seed),
            }
        )
    if swap:
        df = df.withColumns(
            {
                "source_schema": F.col("target_schema"),
                "target_schema": F.col("source_schema"),
                "gold_mapping": F.transform(
                    "gold_mapping", lambda p: F.array(p[1], p[0])
                ),
            }
        )
    return df


def catalog_from_cases(cases: DataFrame) -> DataFrame:
    """S2 flatten: one row per (case, side, column) — the broadcast-join
    side for alignment validation (data_builder.py:133-185)."""
    sides = []
    for side in ("source", "target"):
        sides.append(
            cases.select(
                F.col("id").alias("case_id"),
                F.lit(side).alias("side"),
                F.col(f"{side}_schema.name").alias("table_name"),
                F.explode(f"{side}_schema.columns").alias("c"),
            ).select(
                "case_id",
                "side",
                "table_name",
                F.lower("c.name").alias("col_name"),
                F.col("c.type").alias("col_type"),
                F.col("c.column_description").alias("col_desc"),
                (F.lower(F.coalesce("c.is_pk", F.lit("no"))) == "yes").alias("is_pk"),
            )
        )
    return sides[0].unionByName(sides[1])
