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


def _translate_date_format_calls(sql: str) -> str:
    """Rewrite every ``date_format(expr, '<strftime>')`` call site.

    A tiny scanner (paren depth + quote state) rather than a regex:
    the first argument may itself contain commas and nested calls
    (``date_format(coalesce(a, b), '%Y-%m-%d')``), which a
    ``([^,]+?)`` capture mis-splits, leaving the format untranslated.
    Nested ``date_format`` in the first argument is handled
    recursively; an unbalanced call is left untouched.
    """
    m = re.search(r"date_format\s*\(", sql, re.IGNORECASE)
    if not m:
        return sql
    depth, in_str = 1, False
    args: list[str] = []
    arg_start = i = m.end()
    while i < len(sql) and depth > 0:
        ch = sql[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(sql) and sql[i + 1] == "'":  # '' escape
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append(sql[arg_start:i])
                break
        elif ch == "," and depth == 1:
            args.append(sql[arg_start:i])
            arg_start = i + 1
        i += 1
    if depth != 0:  # unbalanced — not a call we can safely rewrite
        return sql
    head, tail = sql[: m.start()], sql[i + 1 :]
    if len(args) == 2:
        first = _translate_date_format_calls(args[0].strip())
        fm = re.fullmatch(r"\s*'([^']*)'\s*", args[1])
        second = f"'{translate_strftime(fm.group(1))}'" if fm else args[1].strip()
        call = f"date_format({first}, {second})"
    else:
        call = sql[m.start() : i + 1]
    return head + call + _translate_date_format_calls(tail)


def translate(sql: str) -> str:
    """Rewrite Presto-isms to Spark SQL equivalents."""
    sql = _translate_date_format_calls(sql)
    # Presto double-quoted identifiers ("db"."table") → backticks
    sql = re.sub(r'"([A-Za-z_][\w$-]*)"', r"`\1`", sql)
    return sql
