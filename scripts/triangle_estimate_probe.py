"""Triangle auto-chunk ESTIMATE probe — the K decision without the count.

The sf10 full run costs ~18 minutes; at sf30+ the wedge-closure join is an
hour-plus and the POINT of `chunks="auto"` is that its K comes from a cheap
pre-pass (exact Σ d·(d−1)/2 over the oriented out-degrees). This probe runs
exactly that pre-pass — the SAME code triangle_counts runs
(graph.clean_and_orient / wedge_total / auto_chunks) over the SAME edge
list the gate counts (registry.triangle_gate_edges), so probe and operator
cannot drift — and reports the wedge total plus the K auto would choose at
the given scratch budget: the decade check for prediction 5 of the
round-12 pre-registration (BASELINE.md) with none of the quadratic work.

Usage: python scripts/triangle_estimate_probe.py <sf_dir> [budget_gb]
Prints one JSON line
  {"sf_dir":..., "wedges": N, "budget_gb": G, "auto_k": K,
   "estimate_sec": S}
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
    from ophidia_server_spark.pipeline.graph import (
        auto_chunks, clean_and_orient, wedge_total,
    )
    from ophidia_server_spark.registry import triangle_gate_edges
    from ophidia_server_spark.session import get_spark

    sf_dir = sys.argv[1]
    budget_gb = float(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark("triangle_estimate_probe")
    edges = triangle_gate_edges(spark, sf_dir)
    t0 = time.time()
    _, oriented = clean_and_orient(edges)
    wedges = wedge_total(oriented)
    k = auto_chunks(wedges, budget_gb)
    print(json.dumps({
        "sf_dir": sf_dir, "wedges": int(wedges),
        "budget_gb": budget_gb, "auto_k": k,
        "estimate_sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
