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

# ordered fine -> coarse, matching the reference's time hierarchy document;
# "season" is the meteorological level (DJF/MAM/JJA/SON, December belonging
# to the following year's DJF) climate rollups use between month and year
TIME_LEVELS = ("hour", "day", "week", "month", "quarter", "season", "year")


def concept_level(level: str):
    """Column mapper for a time concept level: the period floor as a date
    (date_trunc levels) or the season label "<year>-DJF|MAM|JJA|SON".
    Usable as the `concept_level` arg of oph_reduce2 / oph_aggregate2."""
    level = level.lower()
    if level not in TIME_LEVELS:
        raise KeyError(f"unknown concept level {level!r}; known: {TIME_LEVELS}")

    if level == "season":

        def mapper(col: Column) -> Column:
            m = F.month(col)
            y = F.year(col) + F.when(m == 12, F.lit(1)).otherwise(F.lit(0))
            name = (
                F.when(m.isin(12, 1, 2), "DJF")
                .when(m.isin(3, 4, 5), "MAM")
                .when(m.isin(6, 7, 8), "JJA")
                .otherwise("SON")
            )
            return F.concat_ws("-", y.cast("string"), name)

        return mapper

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
