"""Presto/Athena → Spark SQL dialect translation.

The reference's queries are Athena SQL (Presto semantics). Constructs
that differ from Spark SQL (SURVEY §2.8 F1/F3):

- ``date_format(ts, '%Y-%m-%d')`` — Presto uses MySQL-style strftime
  specifiers (README.md:97); Spark uses java.time patterns
  (``yyyy-MM-dd``).
- ``date_add('unit', n, ts)`` / ``date_diff('unit', t1, t2)`` —
  Presto's 3-arg temporal forms → ``timestampadd`` /
  ``timestampdiff`` (same orientation: diff = t2 - t1).
- Function renames where semantics already agree: ``approx_distinct``,
  ``arbitrary``, ``contains`` (Presto's ARRAY membership — must become
  ``array_contains``; Spark 3.5 reuses the name for strings),
  ``strpos``, ``json_extract[_scalar]``, ``from_iso8601_timestamp``.
- ``to_unixtime`` → ``cast(ts AS DOUBLE)`` (Presto returns fractional
  DOUBLE seconds; a rename to ``unix_timestamp`` would truncate), and
  ``random(n)`` / ``random(m, n)`` → floor-of-rand forms (Trino's arg
  forms are uniform INTEGERS; Spark ``rand(n)`` seeds instead).
- ``cardinality(arr)`` / ``split_part`` / ``regexp_like`` /
  ``try_cast`` / ``slice`` / ``element_at`` — exist in Spark SQL ≥3.x
  with matching semantics, run verbatim.

``translate`` rewrites a Presto query string so the reference's doc
queries run unchanged on this engine (tested against the reference's
own smoke query, README.md:87-99). Every pass is string-literal
aware: renames and identifier quoting skip single-quoted literals,
and call-site rewrites (date_format/date_add/date_diff) track quote
and paren state.
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


def _rewrite_calls(sql: str, fname: str, rewrite) -> str:
    """Rewrite every ``fname(...)`` call site with ``rewrite(args) ->
    str | None`` (None leaves the call untouched).

    A tiny scanner (paren depth + quote state) rather than a regex:
    any argument may itself contain commas and nested calls
    (``date_format(coalesce(a, b), '%Y-%m-%d')``), which a
    ``([^,]+?)`` capture mis-splits. Nested calls of the same function
    inside arguments are handled by the recursive tail/argument passes;
    an unbalanced call is left untouched.
    """
    m = re.search(rf"\b{fname}\s*\(", sql, re.IGNORECASE)
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
    args = [_rewrite_calls(a, fname, rewrite).strip() for a in args]
    call = rewrite(args)
    if call is None:
        call = f"{fname}({', '.join(args)})"
    return head + call + _rewrite_calls(tail, fname, rewrite)


def _date_format_rewrite(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    fm = re.fullmatch(r"\s*'([^']*)'\s*", args[1])
    second = f"'{translate_strftime(fm.group(1))}'" if fm else args[1]
    return f"date_format({args[0]}, {second})"


# Presto temporal units accepted by Spark's timestampadd/timestampdiff
_UNITS = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}


def _unit_ident(arg: str) -> str | None:
    m = re.fullmatch(r"\s*'(\w+)'\s*", arg)
    if m and m.group(1).lower() in _UNITS:
        return m.group(1).upper()
    return None


def _date_add_rewrite(args: list[str]) -> str | None:
    # Presto date_add('unit', n, ts) → Spark timestampadd(UNIT, n, ts).
    # Two-arg date_add(date, n) is already Spark's own — leave it.
    if len(args) != 3:
        return None
    unit = _unit_ident(args[0])
    return f"timestampadd({unit}, {args[1]}, {args[2]})" if unit else None


def _date_diff_rewrite(args: list[str]) -> str | None:
    # Presto date_diff('unit', t1, t2) = t2 - t1 in units →
    # Spark timestampdiff(UNIT, t1, t2), same orientation.
    if len(args) != 3:
        return None
    unit = _unit_ident(args[0])
    return f"timestampdiff({unit}, {args[1]}, {args[2]})" if unit else None


# Pure function renames (argument order and semantics already agree).
# `contains` is Presto's ARRAY membership test — Spark 3.5 reuses the
# name for strings, so Presto input must become array_contains.
_RENAMES = {
    "approx_distinct": "approx_count_distinct",
    "arbitrary": "any_value",
    "contains": "array_contains",
    "strpos": "instr",
    "json_extract_scalar": "get_json_object",
    "json_extract": "get_json_object",
    "from_iso8601_timestamp": "to_timestamp",
    "from_iso8601_date": "to_date",
    # Joda patterns for y/M/d/H/m/s coincide with Spark's — the cases
    # Athena queries actually use; exotic Joda tokens would need a
    # pattern translator like translate_strftime
    "format_datetime": "date_format",
    "last_day_of_month": "last_day",
    "reduce": "aggregate",  # same (arr, init, merge[, finish]) shape
    "day_of_year": "dayofyear",
    "doy": "dayofyear",
    "week_of_year": "weekofyear",
    "week": "weekofyear",
}

# Presto URL accessors → Spark's parse_url part extraction; the
# web-corpus pipeline staple (domain mixing keys on url host)
_URL_PARTS = {
    "url_extract_host": "HOST",
    "url_extract_path": "PATH",
    "url_extract_protocol": "PROTOCOL",
    "url_extract_query": "QUERY",
}


def _url_rewrite(part: str):
    def rw(args: list[str]) -> str | None:
        if len(args) != 1:
            return None
        return f"parse_url({args[0]}, '{part}')"

    return rw


def _random_rewrite(args: list[str]) -> str | None:
    # Presto random() → double in [0,1) = Spark rand(); but Presto
    # random(n) is a uniform INTEGER in [0,n) and random(m,n) an
    # integer in [m,n), while Spark rand(n) treats n as a SEED — a
    # bare rename silently changes semantics for the arg forms.
    if len(args) == 0 or (len(args) == 1 and not args[0].strip()):
        return "rand()"
    if len(args) == 1:
        return f"cast(floor(rand() * ({args[0]})) as bigint)"
    if len(args) == 2:
        return (
            f"({args[0]}) + cast(floor(rand() * "
            f"(({args[1]}) - ({args[0]}))) as bigint)"
        )
    return None


def _split_rewrite(args: list[str]) -> str | None:
    # Presto split(s, delim) treats delim as a LITERAL string; Spark
    # split(s, pattern) treats it as a REGEX — split(url, '.') would
    # silently explode every character. When the delimiter is a
    # string literal, regex-escape it; non-literal delimiters pass
    # through untouched (can't safely rewrite an expression).
    if len(args) not in (2, 3):
        return None
    m = re.fullmatch(r"\s*'((?:[^']|'')*)'\s*", args[1])
    if not m:
        return None
    lit = m.group(1)
    if not re.search(r"[.^$*+?()\[\]{}|\\]", lit):
        return None  # no metacharacters — passthrough
    # two backslashes in the emitted SQL: one survives Spark's string-
    # literal escape processing, leaving \<char> for the regex engine
    escaped = re.sub(r"([.^$*+?()\[\]{}|\\])", r"\\\\\1", lit)
    rest = f", {args[2]}" if len(args) == 3 else ""
    return f"split({args[0]}, '{escaped}'{rest})"


def _to_unixtime_rewrite(args: list[str]) -> str | None:
    # Presto to_unixtime returns a DOUBLE with fractional seconds;
    # Spark unix_timestamp truncates to BIGINT — a bare rename loses
    # sub-second precision AND changes the type. cast(ts AS DOUBLE)
    # is Spark's exact fractional-epoch spelling.
    if len(args) != 1:
        return None
    return f"cast(({args[0]}) as double)"


def _dow_rewrite(args: list[str]) -> str | None:
    # Presto day_of_week is ISO (1=Monday..7=Sunday); Spark's
    # dayofweek is 1=Sunday..7=Saturday — a bare rename would be
    # silently off by one day, so emit the shifted expression.
    if len(args) != 1:
        return None
    return f"((dayofweek({args[0]}) + 5) % 7) + 1"


# A single-quoted SQL literal, with '' escapes
_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _outside_literals(sql: str, fn) -> str:
    """Apply ``fn`` to the segments of ``sql`` that are NOT inside
    single-quoted string literals, so renames and identifier quoting
    never mangle literal text (e.g. a JSON document or a date string
    containing double quotes)."""
    out, last = [], 0
    for m in _LITERAL.finditer(sql):
        out.append(fn(sql[last : m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.append(fn(sql[last:]))
    return "".join(out)


def _rename_and_quote(segment: str) -> str:
    for presto, spark in _RENAMES.items():
        segment = re.sub(
            rf"\b{presto}\s*\(", f"{spark}(", segment, flags=re.IGNORECASE
        )
    # Presto double-quoted identifiers ("db"."table") → backticks
    return re.sub(r'"([A-Za-z_][\w$-]*)"', r"`\1`", segment)


def translate(sql: str) -> str:
    """Rewrite Presto-isms to Spark SQL equivalents."""
    sql = _rewrite_calls(sql, "date_format", _date_format_rewrite)
    sql = _rewrite_calls(sql, "date_add", _date_add_rewrite)
    sql = _rewrite_calls(sql, "date_diff", _date_diff_rewrite)
    sql = _rewrite_calls(sql, "day_of_week", _dow_rewrite)
    sql = _rewrite_calls(sql, "dow", _dow_rewrite)
    sql = _rewrite_calls(sql, "random", _random_rewrite)
    sql = _rewrite_calls(sql, "to_unixtime", _to_unixtime_rewrite)
    sql = _rewrite_calls(sql, "split", _split_rewrite)
    for presto, part in _URL_PARTS.items():
        sql = _rewrite_calls(sql, presto, _url_rewrite(part))
    return _outside_literals(sql, _rename_and_quote)
