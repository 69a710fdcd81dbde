"""XML schema + mapping-rule loaders (SURVEY §2.1 S4/S5; reference
``Schema Mapping/DatabaseUtils/SchemaLoader.py:49-157`` and
``MappingLoader.py:31-64``).

Schemas are tiny, so parsing is driver-side ``xml.etree`` producing the
engine's ``SchemaCatalog``; mapping rules become a driver-side list (and a
DataFrame via ``rules_df``) feeding the mapping engine.

Expected shape (reference's ``schema.xml``):

    <schema name="...">
      <relation name="...">
        <attribute name="..." type="..." nullable="true" size="25"
                   HasSemanticMeaning="true"/>
        <primarykey><attr>...</attr></primarykey>
        <foreignkey table="other"><from>a</from><to>b</to></foreignkey>
      </relation>
    </schema>

    <mappings>
      <mapping id="m1">
        <source><relation>r1</relation></source>
        <target><relation>t1</relation></target>
        <gold_sql>INSERT INTO ...</gold_sql>
        <select_sql>SELECT ...</select_sql>
      </mapping>
    </mappings>
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..catalog.schema_catalog import Attribute, Relation, SchemaCatalog
from ..functions.localframe import local_df


def _bool(v: str | None, default: bool) -> bool:
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes")


def load_schema_xml(xml_text: str) -> SchemaCatalog:
    """Parse a schema document into a SchemaCatalog (constraints recorded
    for auditing, never enforced)."""
    root = ET.fromstring(xml_text)
    cat = SchemaCatalog(root.get("name", "schema"))
    for rel_node in root.findall(".//relation"):
        pk = {a.text.strip().lower() for a in rel_node.findall("./primarykey/attr") if a.text}
        attrs = []
        for a in rel_node.findall("./attribute"):
            name = a.get("name", "")
            attrs.append(
                Attribute(
                    name=name,
                    type_str=a.get("type", "string"),
                    description=a.get("description", ""),
                    is_pk=name.lower() in pk,
                    nullable=_bool(a.get("nullable"), True),
                    unique=_bool(a.get("unique"), False),
                    size=int(a.get("size")) if a.get("size") else None,
                    meaningful=_bool(a.get("HasSemanticMeaning"), True),
                )
            )
        fks = []
        for fk in rel_node.findall("./foreignkey"):
            local = tuple(x.text.strip() for x in fk.findall("./from") if x.text)
            remote = tuple(x.text.strip() for x in fk.findall("./to") if x.text)
            fks.append((local, fk.get("table", ""), remote))
        cat.add(Relation(rel_node.get("name", ""), attrs, foreign_keys=fks))
    return cat


@dataclass
class MappingRule:
    rule_id: str
    source_relations: list[str]
    target_relations: list[str]
    gold_sql: str
    join_overlap_sql: str | None = None


def load_mapping_xml(xml_text: str) -> list[MappingRule]:
    root = ET.fromstring(xml_text)
    rules = []
    for m in root.findall(".//mapping"):
        sel = m.find("./select_sql")
        gold = m.find("./gold_sql")
        rules.append(
            MappingRule(
                rule_id=m.get("id", ""),
                source_relations=[r.text.strip() for r in m.findall("./source/relation") if r.text],
                target_relations=[r.text.strip() for r in m.findall("./target/relation") if r.text],
                gold_sql=(gold.text or "").strip() if gold is not None else "",
                join_overlap_sql=(sel.text or "").strip() if sel is not None and sel.text else None,
            )
        )
    return rules


def remove_subsumed_rules(rules: list[MappingRule]) -> list[MappingRule]:
    """P7 (``MappingLoader.py:76-88``): drop rules whose source+target
    relation sets are both subsets of another rule's.  The reference removes
    sequentially (equal-set duplicates keep only the later rule); the
    engine's deterministic contract is rule-id order — see
    queries/mapping_q.q_subsumed_rules for the distributed form."""
    out = []
    for r in rules:
        rs, rt = set(r.source_relations), set(r.target_relations)
        subsumed = any(
            o.rule_id != r.rule_id
            and rs <= set(o.source_relations)
            and rt <= set(o.target_relations)
            and (
                (rs, rt) != (set(o.source_relations), set(o.target_relations))
                or o.rule_id > r.rule_id
            )
            for o in rules
        )
        if not subsumed:
            out.append(r)
    return out


def rules_df(spark: SparkSession, rules: list[MappingRule]) -> DataFrame:
    return local_df(spark, 
        [
            (r.rule_id, r.source_relations, r.target_relations, r.gold_sql, r.join_overlap_sql)
            for r in rules
        ],
        "rule_id string, source_relations array<string>, target_relations array<string>, "
        "gold_sql string, join_overlap_sql string",
    )
