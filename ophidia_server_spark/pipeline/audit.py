"""Declarative data-quality audit: evaluate a rule list over a table in ONE
aggregate pass and report per-rule violation counts — the
expectations/contract check a pipeline runs before (and after) every
transform stage, next to mix_report's distribution audit.

Rules are (name, kind, params) tuples compiled to JVM boolean expressions;
the whole audit is a single map + one scalar aggregate per rule batch (no
shuffle beyond the final one-row combine), so auditing 100 TB costs one
scan. `unique` rules are the exception — uniqueness is a global property,
so each one adds a distinct-count aggregate (still one shuffle, keyed on
the audited column).

Reference parity note: the reference has no data-quality operators — this
extends the surface for LLM training-data pipelines per the project's
extension mandate (same status as pipeline/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rule_violation(kind: str, params: dict) -> Column:
    """Boolean column: True where the row VIOLATES the rule."""
    col = F.col(params["col"])
    if kind == "not_null":
        return col.isNull()
    if kind == "in_range":
        lo, hi = params.get("lo"), params.get("hi")
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (col < lo)
        if hi is not None:
            bad = bad | (col > hi)
        return col.isNotNull() & bad
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(*params["values"])
    if kind == "matches":
        return col.isNotNull() & ~col.rlike(params["pattern"])
    if kind == "min_length":
        return col.isNotNull() & (F.length(col) < int(params["n"]))
    raise ValueError(f"unknown audit rule kind: {kind}")


def corpus_audit(
    df: DataFrame, rules: list[tuple[str, str, dict]],
    max_violation_frac: float = 0.0,
) -> DataFrame:
    """Evaluate every rule and return one row per rule:
    (rule, kind, n_rows, n_violations, violation_frac, passed) — `passed`
    compares the fraction against `max_violation_frac` (0 = strict).

    Row-local rules fold into ONE aggregate over one scan regardless of the
    rule count; each `unique` rule adds one count/countDistinct pair on its
    column. The single aggregate row is collected driver-side (it is one
    row by construction) and the report emitted as a literal DataFrame —
    an earlier per-rule union of selects over the lazy aggregate re-ran
    the source scan once per rule, because column pruning specialized each
    branch and defeated exchange reuse. The result is rule-count rows —
    the audit table a pipeline writes next to its output."""
    if not rules:
        raise ValueError("corpus_audit needs at least one rule")
    names = [r[0] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")
    row_aggs, uniq_rules = [], []
    for name, kind, params in rules:
        if kind == "unique":
            uniq_rules.append((name, params))
        else:
            row_aggs.append(
                F.sum(_rule_violation(kind, params).cast("long")).alias(f"__v_{name}")
            )
    for name, params in uniq_rules:
        c = params["col"]
        row_aggs.append(
            (F.count(c) - F.countDistinct(c)).cast("long").alias(f"__v_{name}")
        )
    base = df.agg(F.count("*").alias("__n"), *row_aggs).first()
    n = int(base["__n"])
    rows = []
    for name, kind, _params in rules:
        v = int(base[f"__v_{name}"] or 0)
        frac = round(v / max(n, 1), 6)
        rows.append((name, kind, n, v, frac, int(frac <= max_violation_frac)))
    return df.sparkSession.createDataFrame(
        rows,
        "rule string, kind string, n_rows long, n_violations long, "
        "violation_frac double, passed int",
    )
