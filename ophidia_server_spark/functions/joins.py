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
