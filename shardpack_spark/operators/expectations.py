"""Declarative data-quality expectations (constraint validation at scale).

Training-data pipelines gate every ingest on contracts: "doc_id is never
null and unique", "n_chars in [1, 1e7]", "lang in the allow-list", "every
order references an existing customer".  This module compiles a rule list
into the minimum number of Spark jobs:

- ALL row-local rules (not_null / in_range / in_set / matches / satisfies)
  and all uniqueness rules fold into ONE aggregation over ONE scan — at
  100 TB the check costs a single pass no matter how many rules run;
- each foreign-key rule needs the referenced table, so it adds one
  (typically broadcast) join job per distinct reference.

``check`` returns a per-rule report; ``quarantine`` splits rows into
(passing, violating-with-reasons) using only codegen expressions — no
shuffle, no Python in the row path — so bad rows can be diverted to a
side output instead of failing the load.

Beyond-reference surface (SURVEY.md §2B.10 family): the reference format
validates only checksums (src/checksum.rs); content-level contracts are
the engine-side complement.  pytest verifies every rule kind against
DuckDB SQL recomputation on the driver tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation.  ``kind`` drives compilation; ``params`` carry the
    rule-specific payload.  ``max_violation_fraction`` makes a rule a
    soft threshold (passes while violations/total <= fraction); the
    default 0.0 is a hard constraint."""

    kind: str
    column: str
    params: dict = field(default_factory=dict)
    max_violation_fraction: float = 0.0

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})"


def not_null(column: str, max_violation_fraction: float = 0.0) -> Rule:
    return Rule("not_null", column, {}, max_violation_fraction)


def in_range(
    column: str,
    lo: Any = None,
    hi: Any = None,
    max_violation_fraction: float = 0.0,
) -> Rule:
    """NULLs do not violate range rules (compose with not_null)."""
    if lo is None and hi is None:
        raise ValueError("in_range needs lo and/or hi")
    return Rule("in_range", column, {"lo": lo, "hi": hi}, max_violation_fraction)


def in_set(column: str, values, max_violation_fraction: float = 0.0) -> Rule:
    return Rule("in_set", column, {"values": sorted(values)}, max_violation_fraction)


def matches(column: str, pattern: str, max_violation_fraction: float = 0.0) -> Rule:
    """Full-match regex (anchored), like SQL ``rlike`` wrapped in ^...$."""
    return Rule("matches", column, {"pattern": pattern}, max_violation_fraction)


def satisfies(predicate_sql: str, name: str = "predicate", max_violation_fraction: float = 0.0) -> Rule:
    """Arbitrary row-local SQL predicate; a row violates when the
    predicate is FALSE or NULL."""
    return Rule("satisfies", name, {"predicate": predicate_sql}, max_violation_fraction)


def unique(*columns: str, max_violation_fraction: float = 0.0) -> Rule:
    """Violations = rows carrying a duplicated key (count - distinct)."""
    if not columns:
        raise ValueError("unique needs at least one column")
    return Rule("unique", ",".join(columns), {"columns": list(columns)}, max_violation_fraction)


def foreign_key(
    column: str,
    ref: DataFrame,
    ref_column: str,
    max_violation_fraction: float = 0.0,
) -> Rule:
    """Every non-null value must exist in ``ref[ref_column]``."""
    return Rule("foreign_key", column, {"ref": ref, "ref_column": ref_column}, max_violation_fraction)


def _violation_expr(rule: Rule) -> Column:
    """Row-local rules compile to a 0/1 'this row violates' expression —
    the single-scan aggregation sums these."""
    c = F.col(rule.column)
    if rule.kind == "not_null":
        bad = c.isNull()
    elif rule.kind == "in_range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        ok = F.lit(True)
        if lo is not None:
            ok = ok & (c >= F.lit(lo))
        if hi is not None:
            ok = ok & (c <= F.lit(hi))
        bad = c.isNotNull() & ~ok
    elif rule.kind == "in_set":
        bad = c.isNotNull() & ~c.isin(rule.params["values"])
    elif rule.kind == "matches":
        bad = c.isNotNull() & ~c.rlike(f"^(?:{rule.params['pattern']})$")
    elif rule.kind == "satisfies":
        p = F.expr(rule.params["predicate"])
        bad = ~F.coalesce(p, F.lit(False))
    else:  # pragma: no cover - guarded by check()
        raise ValueError(f"not a row-local rule: {rule.kind}")
    return bad.cast("long")


_ROW_LOCAL = {"not_null", "in_range", "in_set", "matches", "satisfies"}


def check(df: DataFrame, rules: list[Rule]) -> dict:
    """Run all expectations; returns
    ``{"passed": bool, "total_rows": n, "rules": [{rule, column,
    violations, violation_fraction, passed}, ...]}``.

    Job count: 1 aggregation for every row-local + unique rule combined,
    plus one anti-join per foreign_key rule.  The only driver-side
    materialization is the one-row aggregate — never data rows.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for i, r in enumerate(rules):
        if r.kind in _ROW_LOCAL:
            aggs.append(F.sum(_violation_expr(r)).alias(f"__v{i}"))
        elif r.kind == "unique":
            cols = r.params["columns"]
            # rows belonging to a duplicated key: count - countDistinct
            # counts the EXTRA copies; report every row of a dup group
            # minus one, the standard "how many rows must go" measure.
            # The key is a STRUCT, not a string concat: concat_ws SKIPS
            # null fields, so ("a", NULL, "b") and ("a", "b", NULL)
            # would collide as "a\x00b" and count as false duplicates.
            # Keys containing any NULL never violate (masked to a null
            # key, which count/count_distinct both skip) — same contract
            # as the single-column form: compose with not_null.
            cs = [F.col(x) for x in cols]
            nonnull = cs[0].isNotNull()
            for c in cs[1:]:
                nonnull = nonnull & c.isNotNull()
            key = F.when(nonnull, F.struct(*cs))
            aggs.append(
                (F.count(key) - F.count_distinct(key)).alias(f"__v{i}")
            )
        elif r.kind == "foreign_key":
            pass  # joined below; no aggregate slot needed
        else:
            raise ValueError(f"unknown rule kind: {r.kind}")

    row = df.agg(*aggs).head()
    total = row["__total"]

    results = []
    passed_all = True
    for i, r in enumerate(rules):
        if r.kind == "foreign_key":
            ref = r.params["ref"].select(
                F.col(r.params["ref_column"]).alias("__ref")
            ).dropDuplicates(["__ref"])
            viol = (
                df.select(F.col(r.column).alias("__val"))
                .where(F.col("__val").isNotNull())
                .join(ref, F.col("__val") == F.col("__ref"), "left_anti")
                .count()
            )
        else:
            viol = int(row[f"__v{i}"] or 0)
        frac = (viol / total) if total else 0.0
        ok = frac <= r.max_violation_fraction
        passed_all = passed_all and ok
        results.append(
            {
                "rule": r.name,
                "kind": r.kind,
                "column": r.column,
                "violations": viol,
                "violation_fraction": frac,
                "passed": ok,
            }
        )
    return {"passed": passed_all, "total_rows": total, "rules": results}


def quarantine(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """Split rows into (clean, quarantined) by the ROW-LOCAL rules.

    Quarantined rows gain a ``_violated`` array column naming every rule
    they break — the triage signal a pipeline writes to its dead-letter
    sink.  Pure codegen (when/array/filter expressions); both outputs are
    lazy views over the same scan, and a persisted upstream df makes the
    two passes share it.  unique/foreign_key rules are rejected here:
    row-local quarantine cannot see other rows, run ``check`` for those.
    """
    local = [r for r in rules if r.kind in _ROW_LOCAL]
    if len(local) != len(rules):
        bad = [r.name for r in rules if r.kind not in _ROW_LOCAL]
        raise ValueError(f"quarantine takes only row-local rules; got {bad}")
    tags = F.array_compact(
        F.array(
            *[
                F.when(_violation_expr(r) == 1, F.lit(r.name))
                for r in local
            ]
        )
    ).cast("array<string>")  # stable schema even with zero rules
    tagged = df.withColumn("_violated", tags)
    clean = tagged.where(F.size("_violated") == 0).drop("_violated")
    dirty = tagged.where(F.size("_violated") > 0)
    return clean, dirty
