"""Schema-Mapping prompt surface (``Schema Mapping/DatabaseUtils/
prompt_templates.py:1-96`` + ``PromptBuilder.py:112-268``): the five prompt
template classes and the JSON schema serializer with constraint hints.

Same contract as ``prompt_repr``: template constants transcribed verbatim
(including the JSON_original template's U+2019 apostrophe), plus a
sequential golden renderer mirroring the reference's control flow
(OrderedDict key order, ``json.dumps`` non-pretty, ``str(bool)`` nullable
rendering, conditional hint keys) — the independent twin the Spark
assembly is byte-checked against.

Engine substitutions, documented:

* ``shuffle_relations`` / ``shuffle_attributes`` use ``random.Random(seed)
  .shuffle`` in the reference (PromptBuilder.py:227-236); the engine's
  canonical seeded-shuffle substitution (SURVEY §2.6, as for S1) orders by
  ``md5(f"{seed}:{name}")`` — deterministic, partitioning-safe, and
  reproducible in plain Python for the golden side.
* ``attr.description is not None`` becomes non-empty (the engine catalog
  defaults descriptions to ``""``).
* SAMPLE_DATA hints are carried by the engine's sampling operators
  (A1/A2, W-sampling queries); this surface pins the SERIALIZATION layout.
"""

from __future__ import annotations

import hashlib
import json

# --- prompt_templates.py, verbatim -----------------------------------------

MAPPING_TEMPLATES: dict[str, tuple[str, str]] = {
    "JSON_original": (
        (
            "Act as a schema mapper for relational schemas. Your task is to generate an SQL script that moves "
            "data from the source database to the target database. "
            "I will provide the information of tables in the source database and the target database."
        ),
        (
            "Source database schema:\n{source_schema}\n\n"
            "Target database schema:\n{target_schema}\n\n"
            "Let’s work this out step-by-step to make sure we get it correct. Note the following,\n"
            " - Source tables must be specified using source.relation_name.\n"
            " - Target tables must be specified using target.relation_name.\n"
            " - Some attributes in the source database may not have any corresponding attributes in the target database. "
            "In this case, data from these attributes should not be moved."
        ),
    ),
    "SQL": (
        (
            "Act as an expert schema mapper for relational databases. Your task is to generate a complete and correct SQL script "
            "that migrates data from the Source Database to the Target Database. "
            "You will be given details of the Source Tables and the Target Tables, including information about their attributes.\n"
            "Ensure that your script follows SQL best practices and that you explain your mapping choices step-by-step."
        ),
        (
            "Source Tables:\n{source_schema}\n\n"
            "Target Tables:\n{target_schema}\n\n"
            "Please generate an SQL script to transfer data from the Source Tables to the Target Tables. Work through each SQL statement step-by-step and follow these directives:\n"
            " 1. Write INSERT statements in the format: INSERT INTO target.target_table SELECT ...\n"
            " 2. Only migrate data from a source attribute to a target attribute if they are conceptually and semantically similar; ignore any extra source attributes.\n"
            " 3. Provide the final SQL code in markdown format using a code block labeled with ```sql.\n"
            "Provide a detailed explanation of your mapping logic followed by the final SQL code."
        ),
    ),
    "SQLite": (
        (
            "Act as an expert schema mapper for relational databases. Your task is to generate a complete and correct SQLite script "
            "that migrates data from the Source Database to the Target Database. "
            "You will be given details of the Source Tables and the Target Tables, including information about their attributes.\n"
            "Ensure that your script follows SQL best practices and that you explain your mapping choices step-by-step."
        ),
        (
            "Source Tables:\n{source_schema}\n\n"
            "Target Tables:\n{target_schema}\n\n"
            "Please generate an SQLite script to transfer data from the Source Tables to the Target Tables. Work through each SQL statement step-by-step and follow these directives:\n"
            " 1. Write INSERT statements in the format: INSERT INTO target.target_table SELECT ...\n"
            " 2. Only migrate data from a source attribute to a target attribute if they are conceptually and semantically similar; ignore any extra source attributes.\n"
            " 3. Provide the final SQLite code in markdown format using a code block labeled with ```sql. No other ```sql blocks should appear afterwards.\n"
            "Provide a detailed explanation of your mapping logic followed by the final SQLite code."
        ),
    ),
    "SQL_IgnorePKs": (
        (
            "Act as an expert schema mapper for relational databases. Your task is to generate a complete and correct SQL script "
            "that migrates data from the Source Database to the Target Database. "
            "You will be given details of the Source Tables and the Target Tables, including information about their attributes.\n"
            "Ensure that your script follows SQL best practices and that you explain your mapping choices step-by-step."
        ),
        (
            "Source Tables:\n{source_schema}\n\n"
            "Target Tables:\n{target_schema}\n\n"
            "Please generate an SQL script to transfer data from the Source Tables to the Target Tables. Work through each SQL statement step-by-step and follow these directives:\n"
            " 1. Write INSERT statements in the format: INSERT INTO target.target_table SELECT ...\n"
            " 2. Only migrate data from a source attribute to a target attribute if they are conceptually and semantically similar; ignore any extra source attributes.\n"
            " 3. Always follow rule #2, even if it leads to NULL primary keys in the target tables.\n"
            " 4. Provide the final SQL code in markdown format using a code block labeled with ```sql.\n"
            "Provide a detailed explanation of your mapping logic followed by the final SQL code."
        ),
    ),
    "Datalog": (
        (
            "Act as an expert Datalog programmer. Your task is to generate a complete and correct set of Datalog rules "
            "that derive the Intensional Tables based on the Extensional Tables. "
            "You will be given details of the Intensional Tables and the Extensional Tables, including information about their attributes.\n"
            "Ensure that your Datalog rules are logically correct, follow standard Datalog syntax, and that you explain your logical choices step-by-step."
        ),
        (
            "Extensional Tables:\n{source_schema}\n\n"
            "Intensional Tables:\n{target_schema}\n\n"
            "Please generate Datalog rules to derive (deduce) the Intensional Tables given the Extensional Tables. Work through each rule step-by-step and follow these directives:\n"
            " 1. Write datalog rules in the format: intensional_relation(...) :- extensional_relation1(...), extensional_relation2(...), ...\n"
            " 2. Only map an extensional attribute to an intensional attribute if they are conceptually and semantically similar; ignore any extra extensional attributes.\n"
            " 3. Provide the final Datalog code in markdown format using a code block labeled with ```datalog.\n"
            "Provide a detailed explanation of your mapping logic followed by the final Datalog code."
        ),
    ),
}


def shuffle_key(seed: int | str, name: str) -> str:
    """The §2.6 seeded-shuffle ordering key — identical to the engine's
    ``det_shuffle_key`` (md5 over ``seed:name``)."""
    return hashlib.md5(f"{seed}:{name}".encode()).hexdigest()


def serialize_schema_json(
    relations: list[dict],
    seed: int | str,
    include_nullable: bool = True,
    include_desc: bool = True,
    include_fk: bool = True,
) -> str:
    """PromptBuilder JSON serializer (PromptBuilder.py:130-197) over plain
    relation dicts::

        {"name": ..., "attributes": [(name, type, desc, is_pk, nullable)],
         "foreign_keys": [(from_cols, to_rel, to_cols), ...]}

    Relations and attributes order by the seeded shuffle key; the per-
    relation JSON follows the reference's OrderedDict key order with the
    conditional hint keys; the result is ``json.dumps`` non-pretty."""
    out = []
    for rel in sorted(relations, key=lambda r: shuffle_key(seed, r["name"])):
        attrs = sorted(rel["attributes"], key=lambda a: shuffle_key(seed, a[0]))
        rel_json: dict = {"relation": rel["name"], "attributes": []}
        for name, typ, desc, _is_pk, nullable in attrs:
            a: dict = {"name": name, "type": typ}
            if include_nullable:
                a["nullable"] = str(bool(nullable))
            if include_desc and desc:
                a["description"] = desc
            for v in a.values():  # concat-safe guard (Spark side escapes nothing)
                assert '"' not in str(v) and "\\" not in str(v), v
            rel_json["attributes"].append(a)
        # primary key keeps DECLARED attribute order (the reference stores
        # it separately from the shuffled attribute list)
        rel_json["primary key"] = [a[0] for a in rel["attributes"] if a[3]]
        fks = rel.get("foreign_keys") or []
        if include_fk and fks:
            rel_json["foreign keys"] = [
                {
                    "from_attributes": list(fc),
                    "to_relation": tr,
                    "to_attributes": list(tc),
                }
                for fc, tr, tc in fks
            ]
        out.append(rel_json)
    return json.dumps(out)


def render_mapping_prompt(
    template: str, source_schema: str, target_schema: str
) -> tuple[str, str]:
    """(system, user) for one template (PromptBuilder.get_prompt_content,
    PromptBuilder.py:249-256)."""
    system, user = MAPPING_TEMPLATES[template]
    return system, user.format(
        source_schema=source_schema, target_schema=target_schema
    )
