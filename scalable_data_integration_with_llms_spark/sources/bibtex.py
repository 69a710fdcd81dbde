"""BibTeX import source (SURVEY S6; reference ``Schema Mapping/
DatabaseUtils/DataLoader.py:135-574`` — the Amalgam ``.bib`` loaders).

The reference parses ``data.bib`` with bibtexparser plus two name
middlewares (``SeparateCoAuthors``: split the author field on ``and``;
``SplitNameParts``: re-order "Last, First" into first-name-first), routes
each entry type to a relation, and assigns sequential surrogate ids.  The
container has no bibtexparser and the Amalgam data blob is not shipped, so
the parser here is a self-contained re-expression of the format's public
grammar (entries ``@type{key, field = {value}, ...}``, brace nesting,
quoted values), and the loaders are pinned by synthesized fixtures.

Two surrogate regimes, both present in the reference:

* **occurrence ids** (a1, ``:253-260``): every author OCCURRENCE gets a
  fresh AuthID — no dedup; the join table links entry pk → occurrence id.
* **first-seen ids** (a2, ``:326-350``): a value→id dict assigns each
  distinct (title-cased) name the next id at its first appearance.

Spark shape: the file parse is driver-side (config-scale input, same
policy as the XML schema/mapping loaders); everything after —
explode author lists, assign ids by window over (entry order, position),
route types, build join tables — is DataFrame work.  At corpus scale the
parse itself distributes by splitting the text on depth-0 ``@`` inside
``mapPartitions``; the downstream plan is unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ..functions.localframe import local_df


def parse_bib_text(text: str) -> list[dict]:
    """Parse BibTeX source into entry dicts: {entry_type, key, fields}.

    Handles ``{...}`` nesting, ``"..."`` values, bare numbers, and
    ``@comment``/``@preamble`` skipping.  Field names lowercase."""
    entries: list[dict] = []
    i, n = 0, len(text)
    while i < n:
        at = text.find("@", i)
        if at < 0:
            break
        j = at + 1
        while j < n and (text[j].isalnum() or text[j] == "_"):
            j += 1
        etype = text[at + 1 : j].lower()
        while j < n and text[j] not in "{(":
            j += 1
        if j >= n:
            break
        open_ch = text[j]
        close_ch = "}" if open_ch == "{" else ")"
        depth, k = 1, j + 1
        while k < n and depth:
            if text[k] == open_ch:
                depth += 1
            elif text[k] == close_ch:
                depth -= 1
            k += 1
        body = text[j + 1 : k - 1]
        i = k
        if etype in ("comment", "preamble", "string"):
            continue
        comma = body.find(",")
        key = body[:comma].strip() if comma >= 0 else body.strip()
        fields: dict[str, str] = {}
        p = comma + 1 if comma >= 0 else len(body)
        while p < len(body):
            eq = body.find("=", p)
            if eq < 0:
                break
            name = body[p:eq].strip(" ,\n\t").lower()
            q = eq + 1
            while q < len(body) and body[q] in " \n\t":
                q += 1
            if q < len(body) and body[q] == "{":
                depth, r = 1, q + 1
                while r < len(body) and depth:
                    if body[r] == "{":
                        depth += 1
                    elif body[r] == "}":
                        depth -= 1
                    r += 1
                value = body[q + 1 : r - 1]
                p = r
            elif q < len(body) and body[q] == '"':
                r = body.find('"', q + 1)
                if r < 0:  # unterminated quote: consume to end-of-body
                    r = len(body)  # (a -1 here used to reset p to 0 and loop forever)
                value = body[q + 1 : r]
                p = r + 1
            else:
                r = q
                while r < len(body) and body[r] not in ",\n":
                    r += 1
                value = body[q:r].strip()
                p = r
            if name:
                fields[name] = " ".join(value.split())
            comma2 = body.find(",", p)
            p = comma2 + 1 if comma2 >= 0 else len(body)
        entries.append({"entry_type": etype, "key": key, "fields": fields})
    return entries


def split_authors(author_field: str) -> list[str]:
    """``SeparateCoAuthors``: split on `` and `` at brace depth 0."""
    parts, buf, depth = [], [], 0
    tokens = author_field.split(" ")
    k = 0
    while k < len(tokens):
        t = tokens[k]
        if depth == 0 and t == "and" and buf:
            parts.append(" ".join(buf))
            buf = []
        else:
            depth += t.count("{") - t.count("}")
            buf.append(t)
        k += 1
    if buf:
        parts.append(" ".join(buf))
    return [p.strip() for p in parts if p.strip()]


def merge_first_name_first(name: str) -> str:
    """``SplitNameParts`` + ``merge_first_name_first``: "Last, First" (and
    "von Last, Jr, First") re-ordered to "First von Last Jr"; already
    first-first names pass through.  Braces are protective grouping and are
    stripped in the merged form."""
    raw_parts = [p.strip() for p in name.split(",")]
    strip = lambda s: s.replace("{", "").replace("}", "")  # noqa: E731
    if len(raw_parts) == 1:
        return strip(raw_parts[0])
    if len(raw_parts) == 2:
        last, first = raw_parts
        return strip(f"{first} {last}".strip())
    last, jr, first = raw_parts[0], raw_parts[1], raw_parts[2]
    return strip(f"{first} {last} {jr}".strip())


def bib_entries_df(spark: SparkSession, text: str) -> DataFrame:
    """Entries as (entry_idx, entry_type, key, fields map) — entry_idx is
    file order, the id-assignment axis of both reference loaders."""
    rows = [
        (i, e["entry_type"], e["key"], e["fields"])
        for i, e in enumerate(parse_bib_text(text))
    ]
    return local_df(spark, 
        rows, "entry_idx int, entry_type string, key string, fields map<string,string>"
    )


def author_occurrences(entries: DataFrame) -> DataFrame:
    """a1 regime: one row per author OCCURRENCE with a fresh sequential
    AuthID in (entry order, author position) order — the reference's
    ``auth_id_counter`` (no dedup)."""
    occ = entries.filter(F.map_contains_key("fields", "author")).select(
        "entry_idx",
        F.posexplode(_split_authors_col(F.col("fields")["author"])).alias(
            "auth_pos", "raw_name"
        ),
    )
    win = W.orderBy("entry_idx", "auth_pos")
    return occ.select(
        "entry_idx",
        "auth_pos",
        _merge_name_col(F.col("raw_name")).alias("name"),
        (F.row_number().over(win) - 1).alias("auth_id"),
    )


def author_dim_first_seen(occurrences: DataFrame) -> DataFrame:
    """a2 regime: distinct title-cased names, id = first-seen order
    (``value_to_ID``, ``:326-350`` — names normalized with .title())."""
    normed = occurrences.select(
        F.initcap(F.col("name")).alias("name"), "entry_idx", "auth_pos"
    )
    firsts = normed.groupBy("name").agg(
        F.min(F.struct("entry_idx", "auth_pos")).alias("first_at")
    )
    win = W.orderBy(F.col("first_at.entry_idx"), F.col("first_at.auth_pos"))
    return firsts.select(
        "name", (F.row_number().over(win) - 1).alias("name_id")
    )


_TYPE_TO_RELATION = {
    "article": "Article",
    "book": "Book",
    "inproceedings": "InProceedings",
    "misc": "Misc",
    "manual": "Manual",
    "incollection": "InCollection",
    "techreport": "TechReport",
}


def route_entries(entries: DataFrame) -> DataFrame:
    """Entry-type routing with the shared pk counter: known types get
    relation + sequential pk in file order (``type_id_counter``); unknown
    types are skipped (``:247-250``)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in _TYPE_TO_RELATION.items() for x in kv]
    )
    routed = entries.withColumn("relation", mapping[F.col("entry_type")]).filter(
        F.col("relation").isNotNull()
    )
    win = W.orderBy("entry_idx")
    return routed.withColumn("pk_id", F.row_number().over(win) - 1)


def _split_authors_col(c: F.Column) -> F.Column:
    @F.pandas_udf("array<string>")
    def _f(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None else split_authors(x))

    return _f(c)


def _merge_name_col(c: F.Column) -> F.Column:
    @F.pandas_udf("string")
    def _f(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None else merge_first_name_first(x))

    return _f(c)
