"""CREATE VIEW alignment extraction (SURVEY §2.8 F3 'view parsing stays a
Python UDF'; reference ``eval/eval_utils.py:76-160``).

The 'view' representation mode asks the LLM to emit
``CREATE VIEW target (t_cols...) AS SELECT s_cols... FROM source_table``;
alignments are read positionally from select-columns → view-columns, with
``AS``-alias and same-name fallbacks.  The multi-group verbose regex does not
translate to an engine expression, so this runs as an Arrow-batched
``mapInPandas`` (the same boundary discipline as the LLM calls).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_VIEW_CMD_RE = re.compile(r"CREATE\s+VIEW.*?;", re.IGNORECASE | re.DOTALL)
_VIEW_RE = re.compile(
    r"""CREATE\s+VIEW\s+(?P<view_name>[`"']?[%\w]+[`"']?)\s+
        (?:\((?P<view_columns>[%\w`"',\s]+)\)\s+)?
        AS\s+SELECT\s+(?P<select_cols>.+?)\s+FROM\s+(?P<from_table>[`"']?[%\w]+[`"']?)""",
    re.DOTALL | re.VERBOSE | re.IGNORECASE,
)


def parse_view_alignments(text: str) -> tuple[list[str], list[tuple[str, str]] | None]:
    """First CREATE VIEW command → positional (source_col, view_col)
    alignments; (errors, pairs) like ``parse_alignments_from_view``."""
    commands = _VIEW_CMD_RE.findall(text)
    if not commands:
        return ["No CREATE VIEWs found"], None
    m = _VIEW_RE.search(commands[0])
    if m is None:
        return ["SQL not parsable"], None
    view_cols_raw = m.group("view_columns")
    view_cols = (
        [c.strip().strip('`"\'').lower() for c in view_cols_raw.split(",")]
        if view_cols_raw
        else None
    )
    pairs: list[tuple[str, str]] = []
    select_cols = [c.strip().strip('`"\'').lower() for c in m.group("select_cols").split(",")]
    for idx, sel in enumerate(select_cols):
        if sel.startswith("source_table."):
            sel = sel[len("source_table."):]
        src = tgt = None
        if " " in sel:
            parts = re.split(r" as | ", sel)
            if len(parts) == 2:
                src, tgt = parts[0], parts[1]
            else:
                return [f"unparsable select column: {sel}"], None
        elif view_cols is not None and len(view_cols) > idx and sel != view_cols[idx]:
            src, tgt = sel, view_cols[idx]
        if src is not None and tgt is not None:
            pairs.append((src, tgt))
        else:
            pairs.append((sel, sel))
    return [], pairs


def parse_views(responses: DataFrame, response_col: str = "response") -> DataFrame:
    """Distributed form: one row per extracted alignment, plus error rows
    with NULL pairs."""
    schema = "case_id string, attr string, pair_src string, pair_tgt string, parse_error string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                errors, pairs = parse_view_alignments(getattr(r, response_col))
                if pairs is None:
                    rows.append((r.case_id, r.attr, None, None, errors[0]))
                else:
                    rows += [(r.case_id, r.attr, s, t, None) for s, t in pairs]
            yield pd.DataFrame(
                rows, columns=["case_id", "attr", "pair_src", "pair_tgt", "parse_error"]
            )

    return responses.mapInPandas(batches, schema)
