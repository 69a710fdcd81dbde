"""SQL admission control + namespace rewriting for the Schema-Mapping
execution engine (SURVEY §2.9 U7, §2.2 P6, §4 "custom pre-pass").

The reference parses LLM-emitted SQL with sqlglot, drops inadmissible
statements, qualifies bare table names into SQLite ATTACH namespaces, and
executes on SQLite (``Schema Mapping/AnalysisUtils/Evaluator.py:59-119``).
The engine reproduces the same decision rules but executes on Spark SQL
against temp views named ``{namespace}_{table}``:

* admission (``_mark_queries_to_ignore``, Evaluator.py:59-87): keep only
  DDL/DML; drop CREATE SCHEMA, and CREATE/DROP of *target* tables (the
  harness owns the target schema);
* qualification (``_append_schema_namespaces``, Evaluator.py:89-105):
  a bare table name in the source set gets the source namespace, in the
  target set the predicted namespace, in both — left untouched;
* INSERT INTO a Spark temp view is illegal, so ``INSERT INTO t SELECT ...``
  becomes an accumulated per-table view: ``CREATE OR REPLACE TEMP VIEW
  ns_t AS (prior UNION ALL) SELECT ...`` handled by the executor
  (mapping_engine.py).

Three qualification backends, preferred in this order:

* **sqlglot AST path** (``_replace_table_refs_ast``): when the public
  ``sqlglot`` package is importable, table nodes and table-qualified column
  references are renamed on the parse tree — the reference's own mechanism.
* **built-in scope-aware path** (``plans/sql_ast.qualify_sql``): this
  repo's own tokenizer + structural analysis, always available, with
  statement-local names (aliases, CTEs) shadowing the mapping — the default
  in this container where sqlglot is absent, so the AST-grade decision
  procedure actually RUNS in CI rather than lying dormant behind an import
  guard.
* **regex path** (``_replace_table_refs``): the conservative word-boundary
  rewriter, kept as the parity reference for the admissible statement
  shapes (LLM-emitted INSERT/SELECT/CREATE/DROP over simple identifiers).
  tests/test_mapping_streaming.py asserts built-in == regex on those
  shapes, and == sqlglot whenever that package is present.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

try:  # pragma: no cover - environment-dependent upgrade path
    import sqlglot  # noqa: F401

    HAVE_SQLGLOT = True
except ImportError:
    HAVE_SQLGLOT = False


@dataclass
class Statement:
    sql: str
    kind: str  # INSERT / SELECT / CREATE / DROP / UPDATE / DELETE / OTHER
    ignore_reason: str | None = None
    target_table: str | None = None  # for INSERT/CREATE/DROP: the object table

    @property
    def admitted(self) -> bool:
        return self.ignore_reason is None


_FENCE_RE = re.compile(r"```(?:sql)?\s*(.*?)```", re.DOTALL | re.IGNORECASE)


def extract_sql_blocks(response: str) -> str:
    """Code-fence extraction from an LLM response
    (``AnalysisUtils/Experiment.py:73,101-130``): concatenate every fenced
    block; if none, treat the whole response as SQL."""
    blocks = _FENCE_RE.findall(response)
    return "\n".join(blocks) if blocks else response


def split_statements(sql: str) -> list[str]:
    """Split on ';' outside single/double-quoted strings."""
    out, buf, quote = [], [], None
    for ch in sql:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == ";":
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return [s.strip() for s in out if s.strip()]


_KIND_RE = re.compile(r"^\s*(INSERT|SELECT|CREATE|DROP|UPDATE|DELETE|WITH)\b", re.IGNORECASE)
_INSERT_TABLE_RE = re.compile(r"INSERT\s+INTO\s+([A-Za-z_][\w.]*)", re.IGNORECASE)
_CREATE_TABLE_RE = re.compile(
    r"CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?(TABLE|VIEW|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*)",
    re.IGNORECASE,
)
_DROP_TABLE_RE = re.compile(r"DROP\s+(?:TABLE|VIEW)\s+(?:IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)", re.IGNORECASE)


def classify(stmt: str) -> Statement:
    m = _KIND_RE.match(stmt)
    kind = m.group(1).upper() if m else "OTHER"
    if kind == "WITH":
        kind = "SELECT"
    s = Statement(sql=stmt, kind=kind)
    if kind == "INSERT":
        t = _INSERT_TABLE_RE.search(stmt)
        s.target_table = t.group(1).lower() if t else None
    elif kind == "CREATE":
        t = _CREATE_TABLE_RE.search(stmt)
        if t:
            if t.group(1).upper() == "SCHEMA":
                s.ignore_reason = "Trying to CREATE SCHEMA. Statement ignored"
            s.target_table = t.group(2).lower()
    elif kind == "DROP":
        t = _DROP_TABLE_RE.search(stmt)
        s.target_table = t.group(1).lower() if t else None
    return s


def admit(statements: list[Statement], target_tables: set[str]) -> list[Statement]:
    """P6 admission: mirror of ``_mark_queries_to_ignore``."""
    for s in statements:
        if s.ignore_reason:
            continue
        if s.kind == "OTHER":
            s.ignore_reason = "Stray statement ignored"
        elif s.kind in ("CREATE", "DROP") and s.target_table in target_tables:
            s.ignore_reason = f"Trying to {s.kind} {s.target_table}. Statement ignored"
    return statements


# The ONE protected-segment splitter shared by ``_replace_table_refs`` and
# ``referenced_tables`` (they must stay in lockstep — ADVICE r8): odd split
# parts are passed through untouched and never matched against.  Protected:
# single-quoted literals (with '' escapes), double-quoted identifiers,
# ``--`` line comments, and ``/* */`` block comments — so a table name that
# appears only inside a comment or quoted identifier neither triggers a
# persist nor gets rewritten (ADVICE r9).
_LITERAL_SPLIT = re.compile(
    r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"|--[^\n]*|/\*.*?\*/)", re.DOTALL
)


def _table_ref_pattern(names) -> re.Pattern:
    """The ONE matcher for bare table references: word-boundary, longest
    name first, case-insensitive; ``(?<![\\w.])`` protects already-qualified
    ``ns.t``, ``(?![\\w(]`` keeps function calls and longer identifiers out
    while letting ``t.col`` qualifiers follow a rename."""
    return re.compile(
        r"(?<![\w.])(" + "|".join(re.escape(t) for t in sorted(names, key=len, reverse=True)) + r")(?![\w(])",
        re.IGNORECASE,
    )


def _replace_table_refs(sql: str, mapping: dict[str, str]) -> str:
    """Word-boundary replacement of bare table names outside string
    literals.  Names already namespace-qualified (``ns.t``) are protected by
    the lookbehind; a trailing ``.`` is allowed so table-qualified column
    references (``t.col``) follow the table rename and don't dangle."""
    pattern = _table_ref_pattern(mapping)
    out = []
    for i, part in enumerate(_LITERAL_SPLIT.split(sql)):
        if i % 2 == 1:
            out.append(part)
        else:
            out.append(pattern.sub(lambda m: mapping[m.group(1).lower()], part))
    return "".join(out)


def referenced_tables(sql: str, names) -> list[str]:
    """Which of ``names`` the SQL actually references, decided by the EXACT
    matcher ``_replace_table_refs`` substitutes with (same literal split,
    same word-boundary pattern), so a caller choosing what to persist can
    never disagree with what the namespace rewrite will touch (ADVICE r8 on
    the old independent regex in ``mapping_engine.join_referenced_tables``).
    Returns names in their input order."""
    if not names:
        return []
    pattern = _table_ref_pattern(names)
    found = set()
    for i, part in enumerate(_LITERAL_SPLIT.split(sql)):
        if i % 2 == 0:
            found.update(m.group(1).lower() for m in pattern.finditer(part))
    return [t for t in names if t.lower() in found]


def _replace_table_refs_ast(sql: str, mapping: dict[str, str]) -> str:
    """sqlglot-backed qualification (the reference's own mechanism,
    Evaluator.py:89-105): rename unqualified table nodes and the column
    qualifiers that reference them on the parse tree, then re-render."""
    import sqlglot
    from sqlglot import exp

    tree = sqlglot.parse_one(sql)
    for node in tree.find_all(exp.Table):
        if not node.db and node.name and node.name.lower() in mapping:
            node.set("this", exp.to_identifier(mapping[node.name.lower()]))
    for node in tree.find_all(exp.Column):
        if node.table and node.table.lower() in mapping:
            node.set("table", exp.to_identifier(mapping[node.table.lower()]))
    return tree.sql()


def qualify_namespaces(
    stmt: Statement,
    source_tables: set[str],
    target_tables: set[str],
    source_ns: str = "source",
    target_ns: str = "pred",
) -> Statement:
    """U7 qualification: source-only names -> ``{source_ns}_{t}``,
    target-only -> ``{target_ns}_{t}``, ambiguous -> untouched
    (``_append_schema_namespaces``, Evaluator.py:89-105)."""
    mapping = {}
    for t in source_tables - target_tables:
        mapping[t] = f"{source_ns}_{t}"
    for t in target_tables - source_tables:
        mapping[t] = f"{target_ns}_{t}"
    if not mapping:
        return stmt
    if HAVE_SQLGLOT:
        new_sql = _replace_table_refs_ast(stmt.sql, mapping)
    else:
        from .sql_ast import qualify_sql

        new_sql = qualify_sql(stmt.sql, mapping)
    return Statement(
        sql=new_sql,
        kind=stmt.kind,
        ignore_reason=stmt.ignore_reason,
        target_table=stmt.target_table,
    )


def prepare_response(
    response: str, source_tables: set[str], target_tables: set[str],
    source_ns: str = "source", target_ns: str = "pred",
    dialect_normalize: bool = True,
) -> list[Statement]:
    """Full pre-pass: fence-extract → split → classify → admit → qualify →
    dialect render (the reference renders per dialect at execution time,
    ``Evaluator.py:257,271``; here SQLite-isms normalize to Spark SQL —
    semantics-preserving transforms only, see sql_ast.transpile_sqlite_to_spark)."""
    from .sql_ast import transpile_sqlite_to_spark

    stmts = [classify(s) for s in split_statements(extract_sql_blocks(response))]
    admit(stmts, target_tables)
    out = []
    for s in stmts:
        if s.admitted:
            s = qualify_namespaces(s, source_tables, target_tables, source_ns, target_ns)
            if dialect_normalize:
                s = Statement(
                    sql=transpile_sqlite_to_spark(s.sql),
                    kind=s.kind,
                    ignore_reason=s.ignore_reason,
                    target_table=s.target_table,
                )
        out.append(s)
    return out


# -- U3: map_pk(tbl, attr, val) rewrite ---------------------------------------
# The reference registers a stateful SQLite UDF (DatabaseManager.py:84-95)
# assigning each distinct value a dense first-seen index.  The engine's
# declared contract is rank-by-value (operators/surrogate.py); gold SQL
# calling map_pk is rewritten into a scalar subquery against a precomputed
# ``__mappk_{tbl}_{attr}`` dimension view (SURVEY §4 "dialect translation").

_MAP_PK_HEAD = re.compile(r"\bmap_pk\s*\(", re.IGNORECASE)


def _split_args(src: str, start: int) -> tuple[list[str], int] | None:
    """Parse a parenthesized argument list starting at ``src[start] == '('``;
    returns (args, index_after_close) or None if unbalanced."""
    depth, quote, args, buf = 0, None, [], []
    i = start
    while i < len(src):
        ch = src[i]
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            if depth > 1:
                buf.append(ch)
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append("".join(buf).strip())
                return args, i + 1
            buf.append(ch)
        elif ch == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    return None


def _ident(arg: str) -> str:
    """Strip quotes from a name argument ('publication' or publication)."""
    return arg.strip().strip("'\"").lower()


def rewrite_map_pk(sql: str) -> tuple[str, set[tuple[str, str]]]:
    """Replace every ``map_pk(tbl, attr, val)`` call with a scalar subquery
    ``(SELECT pk_id FROM __mappk_tbl_attr WHERE pk_val = (val))``; returns
    the rewritten SQL plus the set of (tbl, attr) dimensions the executor
    must register.  Nested parens/quotes in ``val`` are handled; unbalanced
    calls are left untouched (the statement will fail loudly at execution)."""
    refs: set[tuple[str, str]] = set()
    out = sql
    while True:
        m = _MAP_PK_HEAD.search(out)
        if not m:
            break
        parsed = _split_args(out, m.end() - 1)
        if parsed is None:
            break
        args, end = parsed
        if len(args) != 3:
            break
        tbl, attr = _ident(args[0]), _ident(args[1])
        refs.add((tbl, attr))
        sub = (
            f"(SELECT pk_id FROM __mappk_{tbl}_{attr} "
            f"WHERE pk_val = ({args[2]}))"
        )
        out = out[: m.start()] + sub + out[end:]
    return out, refs
