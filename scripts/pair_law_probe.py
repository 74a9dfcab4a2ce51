"""Candidate-pair LAW probe for the banded near-dup family.

The artifact-quadratic queries (dhash/minhash banded joins on a cloning
replica) grow with SUM over buckets of C(n,2) — the candidate-pair count —
not with row count. Timing them at sf10 costs the full pair join; the LAW
is checkable with one grouped aggregate per family instead: reproduce the
gate's exact bucketing (dHash 4x16-bit bands / MinHash LSH band
signatures), count bucket sizes, and report total candidate pairs. The
decade ratio of that number against sf1 IS the growth-law measurement the
adjudication predicts (~(clones_10/clones_1)^2 / 10 per unit data).

Usage: python scripts/pair_law_probe.py <sf_dir>
Prints one JSON line {"dhash_candidates": N, "minhash_candidates": N,
"rows": N, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from ophidia_server_spark.pipeline import dedup as dd
    from ophidia_server_spark.pipeline import multimodal as mm
    from ophidia_server_spark.session import get_spark, load_tables

    sf_dir = sys.argv[1]
    spark = get_spark("pair_law_probe")
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    n_rows = docs.count()

    # --- dHash: the multimodal_dhash_pairs gate's payloads and banding ---
    import pandas as pd

    need = 18 * 16

    def to_raw(batches):
        for pdf in batches:
            payloads = []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                raw = bytes(ord(c) % 256 for c in txt)
                if did % 50 != 0:
                    raw = (raw + b"x" * need)[:need]
                payloads.append(raw)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    codes = mm.dhash_gray(
        docs.mapInPandas(to_raw, "doc_id long, payload binary"), 18, 16
    ).filter(F.col("ok") == 1)
    mask = F.lit(0xFFFF)
    banded = codes.select(
        F.posexplode(
            F.array(
                F.col("code_lo").bitwiseAND(mask),
                F.shiftright("code_lo", 16).bitwiseAND(mask),
                F.col("code_hi").bitwiseAND(mask),
                F.shiftright("code_hi", 16).bitwiseAND(mask),
            )
        ).alias("__band", "__val"),
    )
    dhash_cand = (
        banded.groupBy("__band", "__val")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).cast("long").alias("c"))
        .first()["c"]
    )

    # --- MinHash LSH: dedup_minhash_pairs' exact corpus and banding
    # (num_hashes=32, bands=8 -> r=4; bucket = hash of each 4-slice of the
    # signature — the same expressions minhash_lsh_pairs joins on)
    from ophidia_server_spark.registry import _dup_input

    corpus = _dup_input(spark, sf_dir)
    sigs = dd.minhash_signatures(corpus, "text", 32, 3).filter(
        F.col("sig").isNotNull()
    )
    r, bands = 4, 8
    buckets = sigs.select(
        F.posexplode(
            F.array(*[
                F.hash(F.slice(F.col("sig"), i * r + 1, r))
                for i in range(bands)
            ])
        ).alias("__band", "__key")
    )
    mh_cand = (
        buckets.groupBy("__band", "__key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).cast("long").alias("c"))
        .first()["c"]
    )
    print(json.dumps({
        "dhash_candidates": int(dhash_cand or 0),
        "minhash_candidates": int(mh_cand or 0),
        "rows": int(n_rows),
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
