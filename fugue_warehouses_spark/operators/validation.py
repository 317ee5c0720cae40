"""Declarative data-quality validation: warehouse constraint checks as
one-pass aggregates.

Warehouses enforce (or at least declare) PRIMARY KEY / NOT NULL /
FOREIGN KEY / CHECK constraints; a Spark-first engine validates them as
queries. Each rule compiles to the cheapest distributed shape:

- ``unique``      → one hash aggregate on the key (map-side combine),
                    violations = Σ (count - 1) over duplicated keys;
- ``not_null``    → a conditional-sum scan, no shuffle;
- ``in_range`` /
  ``accepted``    → same, pure scan-side predicates;
- ``foreign_key`` → left-anti join child→parent on the key; the parent
                    side is distinct-collapsed first so the join input
                    is |parent keys|, not |parent rows|. Catalyst
                    broadcasts it when small; a 100 TB fact side
                    streams through a shuffled semi/anti join otherwise.

``validate`` returns one row per rule: (rule, violations) — tiny
result, all heavy work stays distributed. Scan-only rules on the same
frame share a single aggregate pass (one scan for any number of
not_null/range/accepted rules).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    cols: tuple[str, ...]
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    parent: DataFrame | None = field(default=None, compare=False)
    parent_cols: tuple[str, ...] = ()


def unique(name: str, *cols: str) -> Rule:
    return Rule(name, "unique", cols)


def not_null(name: str, *cols: str) -> Rule:
    return Rule(name, "not_null", cols)


def in_range(name: str, col: str, lo: float, hi: float) -> Rule:
    return Rule(name, "in_range", (col,), lo=lo, hi=hi)


def accepted(name: str, col: str, *values) -> Rule:
    return Rule(name, "accepted", (col,), values=tuple(values))


def foreign_key(
    name: str, cols: tuple[str, ...], parent: DataFrame, parent_cols: tuple[str, ...]
) -> Rule:
    if len(cols) != len(parent_cols):
        raise ValueError("child and parent key lists must align")
    return Rule(name, "foreign_key", tuple(cols), parent=parent,
                parent_cols=tuple(parent_cols))


def _scan_violation_expr(rule: Rule) -> F.Column:
    if rule.kind == "not_null":
        cond = F.lit(False)
        for c in rule.cols:
            cond = cond | F.col(c).isNull()
    elif rule.kind == "in_range":
        c = F.col(rule.cols[0])
        cond = c.isNull() | (c < rule.lo) | (c > rule.hi)
    elif rule.kind == "accepted":
        c = F.col(rule.cols[0])
        cond = c.isNull() | ~c.isin(*rule.values)
    else:  # pragma: no cover - guarded by validate()
        raise ValueError(rule.kind)
    return F.sum(cond.cast("long")).alias(rule.name)


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule string, violations long).

    All scan-only rules share ONE aggregate job over ``df``; each
    unique/foreign-key rule adds its own shuffle-bounded branch. The
    branches are unioned lazily — Spark runs them as one plan and
    reuses the scan via exchange/subquery reuse where possible.
    """
    if not rules:
        raise ValueError("no rules given")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")
    spark = df.sparkSession
    parts: list[DataFrame] = []

    scan_rules = [r for r in rules if r.kind in ("not_null", "in_range", "accepted")]
    if scan_rules:
        wide = df.agg(*[_scan_violation_expr(r) for r in scan_rules])
        stack = ", ".join(f"'{r.name}', `{r.name}`" for r in scan_rules)
        parts.append(
            wide.selectExpr(
                f"stack({len(scan_rules)}, {stack}) AS (rule, violations)"
            )
        )

    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*[F.col(c) for c in r.cols])
                .agg(F.count("*").alias("__n"))
                .agg(
                    F.coalesce(
                        F.sum(F.col("__n") - 1), F.lit(0)
                    ).alias("violations")
                )
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            parts.append(dup)
        elif r.kind == "foreign_key":
            parent_keys = (
                r.parent.select(
                    *[F.col(p).alias(c) for c, p in zip(r.cols, r.parent_cols)]
                ).distinct()
            )
            # SQL FK MATCH SIMPLE: a row with ANY NULL key col is exempt
            all_set = F.lit(True)
            for c in r.cols:
                all_set = all_set & F.col(c).isNotNull()
            orphans = (
                df.filter(all_set)
                .join(parent_keys, list(r.cols), "left_anti")
                .agg(F.count("*").alias("violations"))
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            parts.append(orphans)
        elif r.kind not in ("not_null", "in_range", "accepted"):
            raise ValueError(f"unknown rule kind {r.kind!r}")

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Deterministic per-column table profile — the warehouse
    ``ANALYZE`` / column-statistics surface as a first-class operator:
    one row per column with ``(column, dtype, n_rows, n_null,
    n_distinct, min_num, max_num, min_str, max_str)``.

    Numeric columns report min/max in the ``_num`` slots (doubles,
    engine-comparable at 6 dp); strings and timestamps report string
    forms in the ``_str`` slots — never a double rendered to text,
    which engines format differently. ``n_distinct`` is EXACT (this is
    the audited-profile variant; the estimated path is
    ``orders_approx_distinct`` / the KMV family).

    One aggregate over the input computes every column's stats in a
    single pass (the multi-countDistinct expands the aggregate —
    acceptable for profile runs, which are scheduled maintenance, not
    per-query work); the one-row aggregate then explodes into the
    per-column rows INSIDE the plan, so the whole profile stays a lazy
    DataFrame (nothing runs until an action).
    """
    if columns is not None and not columns:
        raise ValueError("columns must be None (all) or a non-empty list")
    cols = df.columns if columns is None else list(columns)
    dtypes = dict(df.dtypes)
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double",
               "decimal", "long", "integer", "short"}
    exprs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = dtypes[c].split("(")[0] in numeric
        exprs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        exprs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        if is_num:
            exprs.append(
                F.round(F.min(F.col(c)).cast("double"), 6).alias(f"__mn_{c}")
            )
            exprs.append(
                F.round(F.max(F.col(c)).cast("double"), 6).alias(f"__mx_{c}")
            )
        else:
            exprs.append(
                F.min(F.col(c)).cast("string").alias(f"__mns_{c}")
            )
            exprs.append(
                F.max(F.col(c)).cast("string").alias(f"__mxs_{c}")
            )
    agg = df.agg(*exprs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in cols:
        is_num = dtypes[c].split("(")[0] in numeric
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).cast("long").alias("n_null"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                (F.col(f"__mn_{c}") if is_num else null_d).alias("min_num"),
                (F.col(f"__mx_{c}") if is_num else null_d).alias("max_num"),
                (null_s if is_num else F.col(f"__mns_{c}")).alias("min_str"),
                (null_s if is_num else F.col(f"__mxs_{c}")).alias("max_str"),
            )
        )
    return agg.select(F.explode(F.array(*structs)).alias("__p")).select("__p.*")
