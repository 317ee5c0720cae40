"""Three-part table naming: catalog.schema.table parsing + temp names.

Behavioral parity with the reference's ``TableName.parse``
(fugue_trino/collections.py:16-49, semantics pinned by
tests/fugue_trino/test_collections.py:5-39): whitespace-trimmed
segments, str/tuple/list/TableName input, right-aligned defaulting,
``table_func`` generation for empty table names, and ValueError when
any of the three parts is still missing after defaulting. Extended
(beyond the reference) with backquoted segments so Spark identifiers
containing dots/spaces round-trip.

Spark mapping: catalog defaults to ``spark_catalog``, schema to the
session database ``default``; temp views occupy the session namespace
(name only).
"""

from __future__ import annotations

import uuid
from typing import Any, Callable, NamedTuple


class TableName(NamedTuple):
    catalog: str
    schema: str
    table: str

    @staticmethod
    def parse(
        obj: Any,
        default_catalog: str | None = None,
        default_schema: str | None = None,
        table_func: Callable[[], str] | None = None,
    ) -> "TableName":
        if isinstance(obj, TableName):
            return obj
        if obj is None:
            obj = ""
        if isinstance(obj, str):
            parts: list[str | None] = [p.strip() for p in _split_ident(obj)]
        elif isinstance(obj, (tuple, list)):
            parts = [None if x is None else str(x) for x in obj]
        else:
            raise ValueError(f"{obj!r} can't be parsed into a table name")
        if len(parts) == 1:
            res: list[str | None] = [default_catalog, default_schema, parts[0]]
        elif len(parts) == 2:
            res = [default_catalog, parts[0], parts[1]]
        elif len(parts) == 3:
            res = list(parts)
        else:
            raise ValueError(f"{obj!r} can't be parsed into a table name")
        if (res[2] is None or res[2] == "") and table_func is not None:
            res[2] = table_func()
        for part, label in zip(res, ("catalog", "schema", "table name")):
            if part is None or part == "":
                raise ValueError(f"{label} is not provided")
        return TableName(catalog=res[0], schema=res[1], table=res[2])

    @property
    def full_name(self) -> str:
        return ".".join(
            _quote_if_needed(s) for s in (self.catalog, self.schema, self.table)
        )

    def __str__(self) -> str:
        return self.full_name


SPARK_SESSION_CATALOG = "spark_catalog"
SPARK_DEFAULT_SCHEMA = "default"


def temp_table_name(prefix: str = "temp_") -> TableName:
    """Generated unique table name (the reference's ``temp_<uuid>``
    convention, fugue_bigquery/client.py:298-301), rooted in Spark's
    session catalog/database."""
    return TableName(
        SPARK_SESSION_CATALOG, SPARK_DEFAULT_SCHEMA, f"{prefix}{uuid.uuid4().hex}"
    )


def _split_ident(name: str) -> list[str]:
    """Dot-split honoring backquoted segments (`a.b`.c -> ['a.b','c'])."""
    parts: list[str] = []
    buf: list[str] = []
    in_quote = False
    quoted_segment = False
    i = 0
    while i < len(name):
        ch = name[i]
        if ch == "`":
            if in_quote and i + 1 < len(name) and name[i + 1] == "`":
                buf.append("`")  # escaped backquote
                i += 2
                continue
            in_quote = not in_quote
            quoted_segment = True
        elif ch == "." and not in_quote:
            parts.append("".join(buf))
            buf = []
            quoted_segment = False
        else:
            buf.append(ch)
        i += 1
    if in_quote:
        raise ValueError(f"unbalanced backquote in {name!r}")
    parts.append("".join(buf))
    return parts


def _quote_if_needed(seg: str) -> str:
    if seg and all(c.isalnum() or c == "_" for c in seg):
        return seg
    return "`" + seg.replace("`", "``") + "`"
