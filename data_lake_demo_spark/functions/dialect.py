"""Presto/Athena → Spark SQL dialect translation.

The reference's queries are Athena SQL (Presto semantics). Two
constructs differ from Spark SQL (SURVEY §2.8 F1/F3):

- ``date_format(ts, '%Y-%m-%d')`` — Presto uses MySQL-style strftime
  specifiers (README.md:97); Spark uses java.time patterns
  (``yyyy-MM-dd``).
- ``cardinality(arr)`` — exists in Spark SQL ≥3.x, runs verbatim; kept
  in the table for documentation.

``translate`` rewrites a Presto query string so the reference's doc
queries run unchanged on this engine (tested against the reference's
own smoke query, README.md:87-99).
"""

from __future__ import annotations

import re

# MySQL/Presto strftime specifier → java.time pattern
_STRFTIME = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%i": "mm",
    "%s": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%W": "EEEE",
    "%M": "MMMM",
    "%%": "%",
}


def translate_strftime(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            spec = fmt[i : i + 2]
            out.append(_STRFTIME.get(spec, spec))
            i += 2
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def translate(sql: str) -> str:
    """Rewrite Presto-isms to Spark SQL equivalents."""

    def fix_datefmt(m: re.Match) -> str:
        return f"date_format({m.group(1)}, '{translate_strftime(m.group(2))}')"

    sql = re.sub(
        r"date_format\(\s*([^,]+?)\s*,\s*'([^']*)'\s*\)",
        fix_datefmt,
        sql,
        flags=re.IGNORECASE,
    )
    # Presto double-quoted identifiers ("db"."table") → backticks
    sql = re.sub(r'"([A-Za-z_][\w$-]*)"', r"`\1`", sql)
    return sql
