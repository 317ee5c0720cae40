"""take — n rows per partition with presort (Fugue contract B10).

The one relational operator in the contract with no single Spark
primitive (SURVEY.md §4 item 1). Composition:

- partitioned: ``Window.partitionBy(keys).orderBy(presort)`` +
  ``row_number() <= n``. This shuffles once on the keys and keeps the
  top-n per key; at scale the window ranks within each hash partition
  without materializing full sorts of non-surviving rows (Spark's
  WindowExec is rank-limit aware via WindowGroupLimit in recent
  releases).
- global: ``orderBy(presort).limit(n)`` — Catalyst turns this into
  TakeOrderedAndProject (a distributed top-n, no full sort).

Presort syntax: ``"a asc, b desc nulls last"`` — column, optional
direction, optional NULL position, comma-separated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def parse_presort(presort: str | None) -> list[tuple[str, bool, str | None]]:
    """``"a desc nulls first, b"`` -> [("a", False, "first"), ("b", True, None)].

    Returns (column, ascending, nulls_position) triples.
    """
    if not presort or not presort.strip():
        return []
    out: list[tuple[str, bool, str | None]] = []
    for part in presort.split(","):
        tokens = part.strip().split()
        if not tokens:
            continue
        col = tokens[0]
        asc = True
        nulls: str | None = None
        rest = [t.lower() for t in tokens[1:]]
        i = 0
        while i < len(rest):
            if rest[i] == "asc":
                asc = True
            elif rest[i] == "desc":
                asc = False
            elif rest[i] == "nulls" and i + 1 < len(rest):
                nulls = rest[i + 1]
                i += 1
            else:
                raise ValueError(f"bad presort token {rest[i]!r} in {presort!r}")
            i += 1
        out.append((col, asc, nulls))
    return out


def _order_columns(presort: str | None, default_cols: list[str]) -> list[Column]:
    spec = parse_presort(presort)
    if not spec:
        spec = [(c, True, None) for c in default_cols]
    cols: list[Column] = []
    for name, asc, nulls in spec:
        c = F.col(name)
        if asc:
            c = c.asc_nulls_first() if nulls != "last" else c.asc_nulls_last()
        else:
            c = c.desc_nulls_last() if nulls != "first" else c.desc_nulls_first()
        cols.append(c)
    return cols


def take(
    df: DataFrame,
    n: int,
    presort: str | None = None,
    na_position: str = "last",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Return ``n`` rows (per partition if ``partition_by``) honoring presort.

    ``na_position`` ("first"/"last") applies when the presort does not
    say ``nulls ...`` explicitly, matching the Fugue signature.
    """
    if n < 0:
        raise ValueError("n must be >= 0")
    spec = parse_presort(presort)
    # apply the default NULL position where unspecified
    normalized = ", ".join(
        f"{c} {'asc' if asc else 'desc'} nulls {nulls or na_position}"
        for c, asc, nulls in spec
    )
    if not partition_by:
        if not spec:
            return df.limit(n)
        return df.orderBy(*_order_columns(normalized, [])).limit(n)
    order = _order_columns(normalized, []) if spec else [F.lit(1)]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    rank = F.row_number().over(w)
    return (
        df.withColumn("__wf_rn", rank)
        .filter(F.col("__wf_rn") <= n)
        .drop("__wf_rn")
    )
