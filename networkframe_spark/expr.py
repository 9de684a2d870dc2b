"""pandas-`DataFrame.query` style expression → Spark SQL predicate.

The reference evaluates filter expressions with ``pd.DataFrame.query``
(reference: networkframe/networkframe.py:330-336, 404-408).  pandas query
syntax is near-SQL already; the differences we bridge:

- ``&`` / ``|`` / ``~``  →  ``AND`` / ``OR`` / ``NOT``
- ``@name`` variable interpolation  →  rendered SQL literals, resolved
  Python-side from ``local_dict`` / ``global_dict`` *before* the string
  reaches Catalyst (so the optimizer sees plain literals and can push
  them into the parquet scan).
- python list literals after ``in``  →  SQL ``IN (...)`` tuples.

Everything else (``==``, ``!=``, ``<``, comparisons, arithmetic,
backtick-quoted column names, and/or/not keywords, parentheses) is valid
in both dialects and passes through untouched.
"""

from __future__ import annotations

import re
from datetime import date, datetime
from typing import Any, Iterable

_STRING_RE = re.compile(r"('([^'\\]|\\.)*'|\"([^\"\\]|\\.)*\")")


def _render_literal(value: Any) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, str):
        escaped = value.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if isinstance(value, datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, Iterable):
        items = ", ".join(_render_literal(v) for v in value)
        return f"({items})"
    raise TypeError(f"cannot render {type(value).__name__} as a SQL literal")


def _transform_code_segment(segment: str, env: dict[str, Any]) -> str:
    def sub_var(m: re.Match) -> str:
        name = m.group(1)
        if name not in env:
            raise NameError(f"name '{name}' referenced with @ is not defined")
        return _render_literal(env[name])

    segment = re.sub(r"@([A-Za-z_][A-Za-z0-9_]*)", sub_var, segment)
    # python list literal -> SQL tuple (brackets have no other meaning in
    # a pandas-query predicate; string literals are handled outside)
    segment = segment.replace("[", "(").replace("]", ")")
    segment = segment.replace("&", " AND ").replace("|", " OR ").replace("~", " NOT ")
    return segment


def to_sql_predicate(
    expr: str,
    local_dict: dict[str, Any] | None = None,
    global_dict: dict[str, Any] | None = None,
) -> str:
    """Translate a pandas-query-style expression into a Spark SQL predicate."""
    env: dict[str, Any] = {}
    env.update(global_dict or {})
    env.update(local_dict or {})
    out: list[str] = []
    pos = 0
    for m in _STRING_RE.finditer(expr):
        out.append(_transform_code_segment(expr[pos : m.start()], env))
        out.append(m.group(0))
        pos = m.end()
    out.append(_transform_code_segment(expr[pos:], env))
    return "".join(out)
