"""Decade probe for the span family's hash_key byte-volume lever
(round-11 judge item 8): time duplicate_spans with the shuffle key as
k-token STRINGS (hash_key=False, the default the sf10 campaign measured)
vs 8-byte xxhash64 CODES (hash_key=True), and report the EXACT shuffled
key byte volume both ways — the occurrence table is the thing both
shuffles move, so Σ length(key) over occurrences (strings) vs 8 x
occurrences (codes) is the true key-byte comparison, computed as one
aggregate rather than inferred from timings.

Usage: SPARK_GRAFT_SF_DIR=/tmp/ophidia_sf10 SPARK_GRAFT_CPUS=32 \
       python scripts/span_hashkey_probe.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.dedup import (
        _occurrences, duplicate_spans,
    )
    from ophidia_server_spark.session import get_spark, load_tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("span_hashkey_probe")
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")

    # exact key-byte volumes from the occurrence table (one aggregate)
    occ_str = _occurrences(docs, "text", 8, "doc_id", hash_key=False)
    # octet_length, not length: shuffled string keys are UTF-8 bytes, and
    # char counts would understate the volume up to 4x on CJK-heavy text
    vol = occ_str.agg(
        F.count(F.lit(1)).alias("occ"),
        F.sum(F.octet_length("__key")).alias("str_bytes"),
    ).first()
    out = {
        "sf_dir": sf_dir,
        "occurrences": int(vol["occ"]),
        "key_bytes_string": int(vol["str_bytes"] or 0),
        "key_bytes_hash": 8 * int(vol["occ"]),
    }
    out["byte_ratio"] = round(
        out["key_bytes_string"] / max(1, out["key_bytes_hash"]), 2
    )
    for label, hk in (("string", False), ("hash", True)):
        t0 = time.perf_counter()
        n = duplicate_spans(docs, k=8, min_docs=2, hash_key=hk).count()
        out[f"sec_{label}"] = round(time.perf_counter() - t0, 2)
        out[f"spans_{label}"] = n
        print(f"## {label}: {out[f'sec_{label}']}s, {n} spans",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
