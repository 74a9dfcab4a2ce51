"""Join compositions Spark lacks as primitives: bucketized range join.

(The as-of join lives in streaming/windows.py; both are named extension
operators in the build brief — compositions of DataFrame ops, no UDFs.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame, right: DataFrame, ts_col: str, lo_col: str, hi_col: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Range (interval-containment) join: pair every left row with every right
    interval where lo <= ts <= hi.

    A plain theta join `ON ts BETWEEN lo AND hi` plans as a nested-loop /
    cartesian — quadratic. Bucketizing makes it a HASH join: left rows key on
    floor(ts/bucket); right intervals explode into every bucket they overlap
    (interval_len/bucket copies); equal-bucket pairs are then filtered by the
    exact range. Choose bucket_seconds near the typical interval length so
    replication stays ~1-2x. Each matching pair meets in exactly one bucket
    (the left row's), so no post-join dedup is needed.
    """
    blen = int(bucket_seconds)
    lb = left.withColumn("__b", F.floor(F.unix_timestamp(ts_col) / blen))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(lo_col) / blen),
                F.floor(F.unix_timestamp(hi_col) / blen),
            )
        ),
    )
    return (
        lb.join(rb, "__b")
        .filter((F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) <= F.col(hi_col)))
        .drop("__b")
    )


def interval_overlap_join(
    left: DataFrame, right: DataFrame,
    l_lo: str, l_hi: str, r_lo: str, r_hi: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Interval-overlap join: pair every (left, right) interval pair that
    overlaps (l_lo <= r_hi AND r_lo <= l_hi) — sessions x incidents,
    experiments x outages, the both-sides-are-ranges sibling of
    bucketed_range_join.

    Same hash-join trick, applied to BOTH sides: each interval explodes
    into every bucket it covers, equal-bucket pairs are filtered by the
    exact overlap predicate. A pair overlapping across k shared buckets
    would match k times, so pairs are kept only in the FIRST shared bucket
    — greatest(floor(l_lo/b), floor(r_lo/b)) — which both sides cover by
    construction; that turns the dedup into a zero-cost filter instead of
    a distinct over the join output. Replication per side ~ interval_len /
    bucket_seconds; pick the bucket near the typical interval length.
    """
    blen = int(bucket_seconds)

    def exploded(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(lo) / blen),
                    F.floor(F.unix_timestamp(hi) / blen),
                )
            ),
        )

    first_shared = F.greatest(
        F.floor(F.unix_timestamp(l_lo) / blen),
        F.floor(F.unix_timestamp(r_lo) / blen),
    )
    return (
        exploded(left, l_lo, l_hi)
        .join(exploded(right, r_lo, r_hi), "__b")
        .filter(
            # exact predicate on the raw (sub-second) timestamps; only the
            # bucket arithmetic goes through second-resolution
            # unix_timestamp, which preserves <= under floor
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (F.col("__b") == first_shared)
        )
        .drop("__b")
    )
