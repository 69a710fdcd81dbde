"""Shared SQL-text helpers for oracle generation (one quoting routine for
the whole package — round-6 review consolidated five local copies)."""

from __future__ import annotations


def sql_quote(s: object) -> str:
    """Single-quoted ANSI string literal with '' escaping."""
    return "'" + str(s).replace("'", "''") + "'"


def sql_lit(v: object) -> str:
    """Literal for a VALUES row cell: ints verbatim, everything else quoted."""
    if isinstance(v, bool):  # bool is an int subclass; don't emit True/False
        return sql_quote(v)
    if isinstance(v, int):
        return str(v)
    return sql_quote(v)
