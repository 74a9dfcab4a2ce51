"""Materialize an sf1-scale dataset by replicating sf0.1 with key shifts.

The driver ships sf0.001/0.01/0.1 fixtures; every design claim in this repo
targets 100x, but the 2x bench band has only ever been exercised at sf0.1.
This script builds a 10x copy (~sf1) so a super-linear plan — one whose
runtime grows faster than the data — shows up as a >>10x time ratio before
it would ever reach a real cluster.

Replication preserves join structure: fact keys (orderkey, custkey, partkey,
suppkey, doc_id, event_id, user_id, vec_id) shift per copy so copy i joins
only within copy i — the same selectivities and group cardinalities per
copy, 10x the rows. Dimension tables (region, nation) stay fixed, like the
real TPC-H scaling rules. Timestamps are left as-is (10x events per day —
a denser stream, which is the harder case for window/sketch operators).

Usage: python scripts/make_sfn.py [src_dir] [dst_dir] [factor]
       defaults: /root/testdata/sf0.1 /tmp/ophidia_sf1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ophidia_server_spark.session import get_spark, load_tables  # noqa: E402

# column -> the table that OWNS its key domain: every foreign key shifts by
# the owner's stride, so copy i's lineitems still join copy i's parts —
# referential integrity (and thus join selectivity) survives the scale-up
DOMAINS = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
# table -> [(column, domain)]
SHIFT_COLS = {
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [("l_orderkey", "orderkey"), ("l_partkey", "partkey"),
                 ("l_suppkey", "suppkey")],
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "part": [("p_partkey", "partkey")],
    "events": [("event_id", "event_id"), ("user_id", "user_id")],
    "documents": [("doc_id", "doc_id")],
    "embeddings": [("vec_id", "vec_id")],
}
FIXED = ["region", "nation"]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ophidia_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make_sfn")
    tables = load_tables(spark, src)
    os.makedirs(dst, exist_ok=True)
    strides = {}
    for dom, (tab, col) in DOMAINS.items():
        mx = tables[tab].agg(F.max(F.col(col).cast("long"))).first()[0]
        strides[dom] = (mx or 0) + 1
    print("strides:", strides)
    for name in FIXED:
        tables[name].write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied")
    for name, cols in SHIFT_COLS.items():
        df = tables[name]
        dtypes = dict(df.dtypes)
        copies = df
        for i in range(1, factor):
            shifted = df
            for c, dom in cols:
                shifted = shifted.withColumn(
                    c, (F.col(c).cast("long")
                        + F.lit(i * strides[dom])).cast(dtypes[c])
                )
            copies = copies.unionByName(shifted)
        copies.write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: x{factor}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
