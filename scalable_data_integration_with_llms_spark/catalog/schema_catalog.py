"""Schema catalog (SURVEY §1.1, §1.3).

Mirrors the reference's ``Schema`` → ``Relation`` → ``Attribute`` object graph
(``Schema Mapping/DatabaseUtils/Schema.py:3-203``) and the flattened
``load_schemas`` lookup (``Stable Schema Matching/utils/data_builder.py:133-185``).

Design: schemas are *fixed and declared, never inferred*.  The catalog lives
driver-side (schemas are tiny); instance data stays distributed.  Constraints
(PK/FK/UNIQUE/NOT NULL) are recorded here and *audited* by queries
(operators/audit.py), never enforced — Spark has no constraint enforcement.

Lookups against the catalog become broadcast joins via ``to_df`` (J2/S2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from ..functions.localframe import local_df

# Free-form declared type string -> normalized Spark type (SURVEY §1.2).
# The reference keeps type strings descriptive (used verbatim in prompts,
# PromptReprTemplate.py:564) and separately maps SQL supertypes
# {text,varchar,char}->TEXT {int}->INTEGER {float,real}->DOUBLE
# (Schema Mapping/DatabaseUtils/Schema.py:16-22).
_TYPE_PREFIX_MAP: list[tuple[str, T.DataType]] = [
    ("bigint", T.LongType()),
    ("int", T.IntegerType()),
    ("smallint", T.IntegerType()),
    ("tinyint", T.IntegerType()),
    ("serial", T.LongType()),
    ("float", T.DoubleType()),
    ("double", T.DoubleType()),
    ("real", T.DoubleType()),
    ("numeric", T.DoubleType()),
    ("decimal", T.DoubleType()),
    ("bool", T.BooleanType()),
    ("datetime", T.TimestampType()),
    ("timestamp", T.TimestampType()),
    ("date", T.DateType()),
    ("uuid", T.StringType()),
    ("iso8601", T.StringType()),
    ("char", T.StringType()),
    ("varchar", T.StringType()),
    ("text", T.StringType()),
    ("string", T.StringType()),
]


def normalize_type(type_str: str | None) -> T.DataType:
    """Normalize a free-form declared type string to a Spark DataType.
    Unknown/empty -> StringType (the reference treats instance data as
    all-strings anyway, InstanceDataHandler.py:122-123)."""
    s = (type_str or "").strip().lower()
    for prefix, dt in _TYPE_PREFIX_MAP:
        if s.startswith(prefix):
            return dt
    return T.StringType()


def supertype(type_str: str | None) -> str:
    """The reference's SQL supertype partition (``Schema.py:16-22``)."""
    s = (type_str or "").strip().lower()
    if s.startswith(("int", "bigint", "smallint", "tinyint", "serial")):
        return "INTEGER"
    if s.startswith(("float", "real", "double", "numeric", "decimal")):
        return "DOUBLE"
    return "TEXT"


@dataclass
class Attribute:
    """One column (``Schema.py:3-42``)."""

    name: str
    type_str: str = "string"
    description: str = ""
    is_pk: bool = False
    nullable: bool = True
    unique: bool = False
    size: int | None = None  # TEXT length bound, audited not enforced
    meaningful: bool = True  # HasSemanticMeaning flag (SchemaLoader.py)

    @property
    def spark_type(self) -> T.DataType:
        return normalize_type(self.type_str)

    @property
    def supertype(self) -> str:
        return supertype(self.type_str)


@dataclass
class Relation:
    """One table with constraints (``Schema.py:61-138``)."""

    name: str
    attributes: list[Attribute] = field(default_factory=list)
    # foreign keys: (local_cols, ref_table, ref_cols)
    foreign_keys: list[tuple[tuple[str, ...], str, tuple[str, ...]]] = field(default_factory=list)

    @property
    def pk(self) -> list[str]:
        return [a.name for a in self.attributes if a.is_pk]

    @property
    def meaningful(self) -> list[str]:
        return [a.name for a in self.attributes if a.meaningful]

    def attr(self, name: str) -> Attribute:
        for a in self.attributes:
            if a.name.lower() == name.lower():
                return a
        raise KeyError(name)

    def struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(a.name, a.spark_type, a.nullable) for a in self.attributes]
        )


@dataclass
class SchemaCatalog:
    """A namespace of relations (``Schema.py:140-203``)."""

    name: str
    relations: dict[str, Relation] = field(default_factory=dict)

    def add(self, rel: Relation) -> None:
        self.relations[rel.name.lower()] = rel

    def rel(self, name: str) -> Relation:
        return self.relations[name.lower()]

    def table_names(self) -> list[str]:
        return sorted(self.relations)

    def to_df(self, spark: SparkSession, case_id: str = "", side: str = "") -> DataFrame:
        """Flatten to the long-form column catalog (FIXTURES B2): the join
        side for validation (P5) and enrichment (J2).  Broadcast-sized."""
        rows = []
        for rel in self.relations.values():
            for a in rel.attributes:
                rows.append(
                    (
                        case_id,
                        side,
                        rel.name.lower(),
                        a.name.lower(),
                        a.type_str,
                        a.description,
                        "YES" if a.is_pk else "NO",
                        a.nullable,
                    )
                )
        schema = (
            "case_id string, side string, table_name string, col_name string, "
            "col_type string, col_desc string, is_pk string, nullable boolean"
        )
        return local_df(spark, rows, schema)


# Catalog of the driver test tables, with constraints used by the audit and
# overlap operators.  PK/FK per the TPC-H-ish layout in TESTDATA.md.
def testdata_catalog() -> SchemaCatalog:
    cat = SchemaCatalog("testdata")
    cat.add(Relation("region", [
        Attribute("r_regionkey", "integer", "region key", is_pk=True, nullable=False),
        Attribute("r_name", "varchar(25)", "region name", nullable=False),
    ]))
    cat.add(Relation("nation", [
        Attribute("n_nationkey", "integer", "nation key", is_pk=True, nullable=False),
        Attribute("n_name", "varchar(25)", "nation name", nullable=False),
        Attribute("n_regionkey", "integer", "region of the nation", nullable=False),
    ], foreign_keys=[(("n_regionkey",), "region", ("r_regionkey",))]))
    cat.add(Relation("customer", [
        Attribute("c_custkey", "bigint", "customer key", is_pk=True, nullable=False),
        Attribute("c_name", "varchar(25)", "customer name", nullable=False),
        Attribute("c_nationkey", "integer", "nation of the customer", nullable=False),
        Attribute("c_acctbal", "double", "account balance"),
        Attribute("c_mktsegment", "varchar(10)", "market segment"),
    ], foreign_keys=[(("c_nationkey",), "nation", ("n_nationkey",))]))
    cat.add(Relation("supplier", [
        Attribute("s_suppkey", "bigint", "supplier key", is_pk=True, nullable=False),
        Attribute("s_name", "varchar(25)", "supplier name", nullable=False),
        Attribute("s_nationkey", "integer", "nation of the supplier", nullable=False),
        Attribute("s_acctbal", "double", "account balance"),
    ], foreign_keys=[(("s_nationkey",), "nation", ("n_nationkey",))]))
    cat.add(Relation("part", [
        Attribute("p_partkey", "bigint", "part key", is_pk=True, nullable=False),
        Attribute("p_name", "varchar(55)", "part name", nullable=False),
        Attribute("p_brand", "varchar(10)", "brand"),
        Attribute("p_type", "varchar(25)", "type"),
        Attribute("p_size", "integer", "size"),
        Attribute("p_retailprice", "double", "retail price"),
    ]))
    cat.add(Relation("orders", [
        Attribute("o_orderkey", "bigint", "order key", is_pk=True, nullable=False),
        Attribute("o_custkey", "bigint", "ordering customer", nullable=False),
        Attribute("o_orderstatus", "varchar(1)", "order status"),
        Attribute("o_totalprice", "double", "total price"),
        Attribute("o_orderdate", "timestamp", "order date"),
        Attribute("o_orderpriority", "varchar(15)", "priority"),
    ], foreign_keys=[(("o_custkey",), "customer", ("c_custkey",))]))
    cat.add(Relation("lineitem", [
        Attribute("l_orderkey", "bigint", "order key", is_pk=True, nullable=False),
        Attribute("l_partkey", "bigint", "part key", nullable=False),
        Attribute("l_suppkey", "bigint", "supplier key", nullable=False),
        Attribute("l_linenumber", "integer", "line number", is_pk=True, nullable=False),
        Attribute("l_quantity", "double", "quantity"),
        Attribute("l_extendedprice", "double", "extended price"),
        Attribute("l_discount", "double", "discount"),
        Attribute("l_tax", "double", "tax"),
        Attribute("l_returnflag", "varchar(1)", "return flag"),
        Attribute("l_linestatus", "varchar(1)", "line status"),
        Attribute("l_shipdate", "timestamp", "ship date"),
    ], foreign_keys=[
        (("l_orderkey",), "orders", ("o_orderkey",)),
        (("l_partkey",), "part", ("p_partkey",)),
        (("l_suppkey",), "supplier", ("s_suppkey",)),
    ]))
    cat.add(Relation("events", [
        Attribute("event_id", "bigint", "event id", is_pk=True, nullable=False),
        Attribute("ts", "timestamp", "event time", nullable=False),
        Attribute("user_id", "bigint", "user id", nullable=False),
        Attribute("event_type", "varchar(20)", "event type"),
        Attribute("value", "double", "event value"),
        Attribute("props", "text", "JSON properties"),
    ]))
    cat.add(Relation("documents", [
        Attribute("doc_id", "bigint", "document id", is_pk=True, nullable=False),
        Attribute("text", "text", "document text"),
        Attribute("lang", "varchar(8)", "language tag"),
        Attribute("source", "varchar(16)", "source id"),
        Attribute("n_chars", "bigint", "character count"),
    ]))
    cat.add(Relation("embeddings", [
        Attribute("vec_id", "bigint", "vector id", is_pk=True, nullable=False),
        Attribute("embedding", "array<float>", "embedding vector"),
        Attribute("label", "integer", "cluster label"),
    ]))
    return cat
