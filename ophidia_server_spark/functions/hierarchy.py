"""Concept hierarchies for dimension rollups (time: day -> week -> month ->
quarter -> year).

Reference: oph_hierarchy (oph_json_objkeys.h:54-57) describes the hierarchy
document; reduce2/aggregate2 walk one level of it. Spark-side a concept level
is just a Column mapping over the dimension — `date_trunc` for time levels —
so hierarchy walks stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered fine -> coarse, matching the reference's time hierarchy document
TIME_LEVELS = ("hour", "day", "week", "month", "quarter", "year")


def concept_level(level: str):
    """Column mapper for a time concept level: returns a date column at the
    period floor. Usable as the `concept_level` arg of oph_reduce2 /
    oph_aggregate2."""
    level = level.lower()
    if level not in TIME_LEVELS:
        raise KeyError(f"unknown concept level {level!r}; known: {TIME_LEVELS}")

    def mapper(col: Column) -> Column:
        return F.date_trunc(level, col).cast("date" if level != "hour" else "timestamp")

    return mapper


def hierarchy_document(name: str = "oph_time") -> dict:
    """oph_hierarchy: describe the hierarchy (levels + attrs)."""
    if name != "oph_time":
        raise KeyError(name)
    return {
        "hierarchy": name,
        "levels": [
            {"level": lv, "short": lv[0], "aggregation_set": ["max", "min", "avg", "sum"]}
            for lv in TIME_LEVELS
        ],
    }
