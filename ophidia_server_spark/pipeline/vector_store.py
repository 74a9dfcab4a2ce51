"""Materialized ANN index lifecycle: build once -> partitioned store -> probe.

The reference engine's whole data model is import-once/query-many over a
fragmented store (oph_ophidiadb_query.h:48 hostxdatacube x fragmentxdb): the
expensive step — placing every row into its fragment — happens at import, and
every later query touches only the fragments its subset needs.  This module is
that model for ANN serving on Spark:

  build  — assign every vector to its IVF cell (trained spherical-KMeans
           codebook) or LSH bucket (hyperplane signature) ONCE, and write the
           corpus as parquet partitioned by that column.  The Python/Arrow
           matmul (the only non-JVM stage) runs exactly once, at build time.
  probe  — read the store with a partition filter on the probed cells /
           signatures.  Parquet directory partitioning turns the filter into
           partition pruning: only ~nprobe/n_cells (IVF) or ~(bits+1)/2^bits
           (LSH) of the corpus bytes are ever read, and the probe-time plan is
           100% JVM (scan -> cosine fold -> TakeOrdered) — no Python stage.

At 100 TB each cell/signature is a parquet directory of many files; probes
read nprobe directories regardless of corpus size, and concurrent queries
share the store read-only.  The codebook / plane parameters ride in a JSON
sidecar (`_vector_index.json` — the underscore prefix keeps Spark's parquet
reader from treating it as data), so a probe needs no driver-side recompute
and no access to the original corpus.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ophidia_server_spark.functions.lits import const_double_array

from ophidia_server_spark.pipeline import similarity as sim

_SIDECAR = "_vector_index.json"

_TARGET_FILE_BYTES = 128 * 1024 * 1024  # healthy parquet file size at scale


def _estimated_input_bytes(df: DataFrame) -> int | None:
    """Size of the files feeding this plan (None when not file-backed).
    `inputFiles()` sees through projections/UDF stages to the parquet leaves,
    so the estimate is the true corpus size, not a Catalyst default."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else f[5:] if f.startswith("file:") else f
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total


def _clustered_partitioned_write(
    df: DataFrame, path: str, part_col: str, salt_col: str, n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write `df` parquet-partitioned by `part_col`, clustering rows so each
    bucket directory is produced by as few tasks as its size warrants.

    Writer-count policy (the 100 TB knob): aim for ~128 MB output files.
      - tiny corpus  -> fewer writer tasks than buckets (each task commits a
        run of buckets; avoids paying per-task commit overhead for KB files);
      - huge corpus  -> more writer tasks than buckets: salt within the bucket
        (hash of the id column) so a 400 GB bucket becomes ~bucket_bytes/128MB
        files written in parallel instead of one task's single giant file.
    Either way each row moves exactly once (one build-time shuffle).
    `n_buckets` comes from the caller (cell/signature cardinality) — counting
    distinct values here would cost an extra full pass over the corpus."""
    est = _estimated_input_bytes(df)
    if est is None:
        writers = min(n_buckets, df.sparkSession.sparkContext.defaultParallelism)
    else:
        # bytes/128MB writers for data volume, floored at one writer per
        # bucket directory up to the cores available: parquet-writer
        # open/commit cost is per-FILE, so on a small corpus the write is
        # bound by serial file creation, not bytes — spreading the bucket
        # dirs across every core was measured 4.1 s -> 3.4 s at 384
        # buckets/32 cores (round-13 opt; the old floor was n_buckets/32
        # writers). The big-corpus branch (est/128MB) is unchanged.
        writers = max(
            1, -(-est // _TARGET_FILE_BYTES),
            min(n_buckets, df.sparkSession.sparkContext.defaultParallelism),
        )
    if writers <= n_buckets:
        clustered = df.repartition(writers, F.col(part_col))
    else:
        salt_mod = -(-writers // n_buckets)
        clustered = df.repartition(
            writers, F.col(part_col), F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_mod))
        )
    clustered.write.mode(mode).partitionBy(part_col).parquet(path)


@dataclass
class VectorIndex:
    """Handle to a materialized, partition-pruned vector store."""

    kind: str           # 'ivf' | 'lsh'
    path: str           # ACTIVE parquet data dir, partitioned by __cell / __sig
    id_col: str
    vec_col: str
    params: dict = field(default_factory=dict)
    # ivf: {'n_cells': int, 'leaders': [[float]]}; lsh: {'bits': int, 'dim': int}
    # Store ROOT. Equal to `path` until an object-scheme index_compact
    # redirects the active data dir through a generation pointer
    # (_GEN_DIR manifests under the root); posix compaction swaps
    # directories in place, so root == path there forever.
    root: str | None = None
    # Data schema as written (StructType.json()), recorded at build time.
    # Lets readers skip parquet schema inference entirely.
    schema_json: str | None = None
    # Memoized reader DataFrame over the active data dir (round-13 opt,
    # guide §6 file-listing): every probe/scan of the store used to pay a
    # fresh InMemoryFileIndex build + schema inference (~1-1.5 s driver
    # time on a 384-directory store); sharing one DataFrame handle makes
    # each subsequent action ~0.2 s. Invalidated by any store mutation
    # (index_append / index_compact) — a stale file index would silently
    # miss appended files.
    _stored: DataFrame | None = field(
        default=None, init=False, repr=False, compare=False
    )

    def store_root(self) -> str:
        return self.root or self.path

    def stored_df(self, spark: SparkSession) -> DataFrame:
        """The store as a DataFrame — one shared handle per index object,
        schema from the sidecar when recorded (no footer inference)."""
        if self._stored is None:
            reader = spark.read
            if self.schema_json:
                from pyspark.sql.types import StructType

                reader = reader.schema(
                    StructType.fromJson(json.loads(self.schema_json))
                )
            self._stored = reader.parquet(self.path)
        return self._stored

    def invalidate_stored(self) -> None:
        self._stored = None

    def save_sidecar(self) -> None:
        meta = {
            "kind": self.kind,
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "params": self.params,
        }
        if self.schema_json:
            meta["schema"] = json.loads(self.schema_json)
        with open(os.path.join(self.path, _SIDECAR), "w") as fh:
            json.dump(meta, fh)


def _footer_rows(path: str) -> int | None:
    """Exact store row count from parquet footers (pyarrow metadata read —
    no Spark job, no data pages touched). None if pyarrow is unavailable
    or any footer is unreadable; callers fall back to a Spark count.

    Mirrors Spark's hidden-path filter (InMemoryFileIndex): names
    starting with `.` are pruned, and names starting with `_` are pruned
    UNLESS they contain `=` (partition dirs like `__cell=3` stay). So
    sidecars, the `_gendata` generation directory (which may hold a
    crashed writer's orphan generation — the crash-recovery pytest pins
    this), and in-flight `.compact-*` dirs are never counted."""
    try:
        import pyarrow.parquet as pq
    except Exception:
        return None

    def _hidden(name: str) -> bool:
        return name.startswith(".") or (
            name.startswith("_") and "=" not in name
        )

    total = 0
    try:
        for root_, dirs, fs in os.walk(path):
            dirs[:] = [d for d in dirs if not _hidden(d)]
            for f in fs:
                if f.endswith(".parquet") and not _hidden(f):
                    total += pq.ParquetFile(
                        os.path.join(root_, f)
                    ).metadata.num_rows
    except Exception:
        return None
    return total


def _recover_compact(path: str) -> None:
    """Crash recovery for index_compact's directory swap. The swap is two
    renames (live → .compact-old, then .compact-tmp → live); a crash in the
    gap leaves NO store at `path`. Recovery prefers the tmp dir when it is
    complete (its sidecar was the last thing copied in before the swap
    began — a sidecar-bearing tmp is row-identical to the old store and
    compacted), else falls back to .compact-old. Leftover dirs from crashes
    before the swap (live store still in place) are retired lazily by the
    next index_compact run.

    Concurrency-safe for READERS: the restore is one atomic os.rename onto
    a missing `path` — never an rmtree of anything that could be live. Two
    probes racing the same recovery serialize on the rename: the loser's
    rename fails (target exists / source gone), it re-checks the live
    sidecar the winner just installed, and proceeds read-only."""
    import shutil

    if os.path.exists(os.path.join(path, _SIDECAR)):
        return
    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".compact-old"
    src = tmp if os.path.exists(os.path.join(tmp, _SIDECAR)) else (
        old if os.path.exists(os.path.join(old, _SIDECAR)) else None
    )
    if src is None:
        return  # nothing to recover from; load_index will fail loudly
    try:
        os.rename(src, path)
    except OSError:
        # lost the race: another recoverer (or a finishing compaction)
        # installed a live store between our check and the rename
        if not os.path.exists(os.path.join(path, _SIDECAR)):
            raise
        return
    if src == tmp:
        # the compacted tmp won; the superseded old copy can go — the
        # winner alone reaches this line, so the rmtree target is never
        # a directory another process just installed as live
        shutil.rmtree(old, ignore_errors=True)


_GEN_DIR = "_gen"        # generation-pointer manifests (object-scheme compaction)
_GEN_DATA = "_gendata"   # generation data dirs (underscore => invisible to Spark)


def _gen_versions(root: str) -> list[int]:
    d = os.path.join(root, _GEN_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    )


def _resolve_generation(root: str) -> str:
    """The active data dir for a store root: the latest generation
    pointer's target when object-scheme compactions have run, else the
    root itself. Pointer publication is atomic (commitio), so this read
    always lands on a COMPLETE generation."""
    vs = _gen_versions(root)
    if not vs:
        return root
    with open(os.path.join(root, _GEN_DIR, f"v{vs[-1]}.json")) as fh:
        rel = json.load(fh)["data"]
    return root if rel == "." else os.path.join(root, rel)


def load_index(path: str) -> VectorIndex:
    """Re-open a store built earlier (possibly by another process/cluster).
    Detects and repairs a half-finished posix index_compact swap first
    (leftover .compact-old/.compact-tmp with no live sidecar), then
    resolves the generation pointer if object-scheme compactions
    redirected the active data dir."""
    _recover_compact(path)
    data = _resolve_generation(path)
    with open(os.path.join(data, _SIDECAR)) as fh:
        meta = json.load(fh)
    return VectorIndex(
        kind=meta["kind"], path=data, id_col=meta["id_col"],
        vec_col=meta["vec_col"], params=meta["params"], root=path,
        schema_json=(
            json.dumps(meta["schema"]) if meta.get("schema") else None
        ),
    )


def ivf_build(
    df: DataFrame, path: str, n_cells: int = 16, codebook: str = "kmeans",
    leaders: list | None = None, id_col: str = "vec_id",
    vec_col: str = "embedding", codes: str = "float",
    pq_m: int = 8, pq_k: int = 16,
) -> VectorIndex:
    """Build the IVF store: train (or accept) the codebook, cell-assign every
    vector, write parquet partitioned by `__cell` (one build-time shuffle to
    cluster rows by cell — each vector moves once, ever).

    `codes="pq"` composes PQ INSIDE the IVF cells — the standard
    100 TB serving shape (FAISS IVFPQ): per-subspace PQ codebooks train on
    a bounded sample, every row stores an extra `pq_codes` array
    (~pq_m bytes) next to its float vector, and `ivf_probe` then scans
    ONLY the code column in the nprobe pruned partitions, exact-reranking
    just the ADC shortlist's float vectors. Probe byte volume drops from
    (pruned rows x float dim x 4) to (pruned rows x pq_m) + (shortlist x
    dim x 4); the parquet column projection is what delivers it, so one
    store serves both the compressed scan and the exact rerank."""
    if leaders is None:
        if codebook == "kmeans":
            leaders = sim.ivf_kmeans_codebook(df, n_cells, vec_col, id_col)
        else:
            leaders = sim.ivf_leaders(df, n_cells, id_col, vec_col)
    assigned = sim.ivf_assign(df, leaders, vec_col).select(id_col, vec_col, "__cell")
    params = {
        "n_cells": len(leaders),
        "leaders": [list(map(float, L)) for L in leaders],
    }
    if codes == "pq":
        books = sim.pq_codebooks(df, m=pq_m, k=pq_k, vec_col=vec_col,
                                 id_col=id_col)
        assigned = sim.pq_encode(
            assigned, books, vec_col=vec_col, id_col=id_col,
            keep=(vec_col, "__cell"),
        )
        params["pq_books"] = [[list(map(float, c)) for c in B] for B in books]
    elif codes != "float":
        raise ValueError(f"codes must be 'float' or 'pq', got {codes!r}")
    # cluster rows by cell before the partitioned write: without this every
    # input task writes a file into every cell directory (tasks x cells small
    # files — 8k at local scale, millions at 100 TB); after it each cell is
    # written by ~cell_bytes/128MB tasks. One build-time shuffle, amortized
    # over all probes.
    _clustered_partitioned_write(assigned, path, "__cell", id_col, len(leaders))
    idx = VectorIndex(
        kind="ivf", path=path, id_col=id_col, vec_col=vec_col, params=params,
        schema_json=assigned.schema.json(),
    )
    idx.save_sidecar()
    return idx


def _pq_books(index: VectorIndex):
    import numpy as np

    return [np.asarray(B, dtype="float64") for B in index.params["pq_books"]]


def _resolve_shortlist(shortlist: int | None, k: int) -> int:
    """Default 5*k; an explicit value must be >= 1 (an accidental 0 must
    error, not silently fall back — ADVICE r11)."""
    if shortlist is None:
        shortlist = 5 * k
    if int(shortlist) < 1:
        raise ValueError(f"shortlist must be >= 1, got {shortlist}")
    return int(shortlist)


def _adc_shortlist(
    pruned: DataFrame, index: VectorIndex, query_vec: list[float],
    shortlist: int, dedup: bool,
) -> DataFrame:
    """The shared PQ probe step (ivf_probe and lsh_probe): ADC-rank the
    pruned rows over the ~pq_m-byte code column (sim.pq_adc_dist, pure
    JVM), keep the `shortlist` best ids, and broadcast-join them back so
    the caller's exact-cosine rerank decodes float vectors for shortlist
    rows only. `dedup=True` collapses multi-table copies (identical codes
    -> identical __d) first, so the shortlist budget buys DISTINCT ids."""
    books = _pq_books(index)
    cand = pruned.select(
        index.id_col, sim.pq_adc_dist(books, query_vec).alias("__d")
    )
    if dedup:
        cand = cand.groupBy(index.id_col).agg(F.min("__d").alias("__d"))
    cand = (
        cand.orderBy("__d", index.id_col)
        .limit(int(shortlist))
        .select(index.id_col)
    )
    return pruned.join(F.broadcast(cand), index.id_col)


def ivf_probe(
    spark: SparkSession, index: VectorIndex | str, query_vec: list[float],
    k: int = 10, nprobe: int = 4, shortlist: int | None = None,
) -> DataFrame:
    """Probe the materialized IVF store: pick the nprobe closest cells
    driver-side (n_cells dot products on the tiny codebook), read ONLY those
    parquet partitions, score exact cosine inside them.  Plan: pruned scan ->
    JVM cosine fold -> TakeOrdered.  No Python stage, no full-corpus read.

    On a `codes="pq"` store the pruned scan reads the 8-byte PQ code
    column instead of the float vectors: ADC (sim.pq_adc_dist, pure JVM)
    ranks the pruned rows, the top `shortlist` (default 5*k) candidate
    ids broadcast-semi-join back against the SAME pruned partitions for
    the exact-cosine rerank — two column-pruned scans of nprobe
    partitions, never a full-corpus read, and the heavy column is only
    decoded for shortlist rows."""
    shortlist = _resolve_shortlist(shortlist, k)
    if isinstance(index, str):
        index = load_index(index)
    leaders = index.params["leaders"]
    qn = sum(x * x for x in query_vec) ** 0.5 or 1.0
    qsims = [sum(q / qn * l for q, l in zip(query_vec, L)) for L in leaders]
    probe_cells = [
        c + 1 for c in sorted(range(len(leaders)), key=lambda c: -qsims[c])[:nprobe]
    ]
    q = const_double_array(query_vec)
    stored = index.stored_df(spark)
    pruned = stored.filter(F.col("__cell").isin(probe_cells))
    if index.params.get("pq_books"):
        pruned = _adc_shortlist(pruned, index, query_vec, shortlist,
                                dedup=False)
    scored = pruned.select(
        F.col(index.id_col),
        F.round(sim.cosine(F.col(index.vec_col), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(index.id_col)).limit(k)


def _lsh_bucketize(
    df: DataFrame, dim: int, bits: int, tables: int,
    id_col: str, vec_col: str, extra_cols: tuple = (),
) -> DataFrame:
    """All `tables` hash tables' bucket ids in ONE Arrow matmul: the
    (dim, tables*bits) plane matrix's global bit t*bits+j is table t's
    local bit j, so table 0 of a multi-table store signs IDENTICALLY to a
    single-table store (backward compatible by construction), and the
    whole family costs one signature pass however many tables there are.
    Bucket id = (t << bits) | sig_t — a single partition column keeps
    partition pruning, the clustered write policy, and append/compact
    working unchanged. Requires tables*bits <= 63 (one packed long)."""
    if tables * bits > 63:
        raise ValueError(
            f"tables*bits must fit a packed long (<= 63), got "
            f"{tables}*{bits}={tables * bits}"
        )
    full = sim.signature_udf(dim, bits * tables)(
        F.col(vec_col).cast("array<double>")
    )
    cols = [id_col, vec_col, *extra_cols, "__sig"]
    if tables == 1:
        return df.withColumn("__sig", full).select(*cols)
    mask = (1 << bits) - 1
    buckets = F.array(*[
        F.shiftright(F.col("__full"), t * bits).bitwiseAND(F.lit(mask))
        + F.lit(t << bits)
        for t in range(tables)
    ])
    return (
        df.withColumn("__full", full)
        .withColumn("__sig", F.explode(buckets))
        .select(*cols)
    )


def _lsh_probe_buckets(
    query_vec: list[float], bits: int, tables: int, hamming: int,
) -> list[int]:
    """Driver-side probe-bucket list: per table, the query's bucket plus
    every bucket within the `hamming` multiprobe radius. len = tables *
    sum_{h<=hamming} C(bits, h) — the RECALL-COST DIAL in one formula:
    more tables / wider hamming = more buckets read = higher recall."""
    from itertools import combinations

    full = sim.signature_of(query_vec, bits * tables)
    mask = (1 << bits) - 1
    out: list[int] = []
    for t in range(tables):
        qs = (full >> (t * bits)) & mask
        flips = [0]
        for h in range(1, int(hamming) + 1):
            flips += [
                sum(1 << j for j in js) for js in combinations(range(bits), h)
            ]
        out += [(t << bits) | (qs ^ fl) for fl in flips]
    return out


def lsh_build(
    df: DataFrame, path: str, bits: int = 8, dim: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding", tables: int = 1,
    codes: str = "float", pq_m: int = 8, pq_k: int = 16,
) -> VectorIndex:
    """Build the LSH store: hyperplane-sign every vector once, write parquet
    partitioned by `__sig` (tables * 2^bits directories; each vector is
    stored once per table — the standard multi-table LSH space trade).

    `tables`/`bits` plus lsh_probe's `hamming` are the recall-cost dial:
    per-neighbor hit probability per table is ~agreement^bits (agreement =
    1 - angle/pi), unioned across tables as 1-(1-p)^tables; buckets read
    per probe = tables * sum_{h<=hamming} C(bits, h) of tables * 2^bits.
    On a clustered real corpus (near-dup mining), few tables at high bits
    read a tiny fraction; on a structureless corpus whose exact top-10 sit
    near cosine ~0.3 (the synthetic test fixture), clearing recall >= 0.5
    genuinely requires a wide dial (e.g. bits=5, tables=12, hamming=2) —
    that cost is the corpus's property, not the store's.

    `codes="pq"` composes PQ inside the LSH buckets exactly as ivf_build
    does inside cells (same sidecar key, same ADC + rerank probe path):
    the multiprobe bucket scan reads ~pq_m bytes per row instead of the
    float vectors — the lever that matters precisely when a wide
    tables/hamming dial makes the probed fraction large. With tables > 1
    each table copy of a row carries the same pq_codes (encoded once,
    before the bucket explode replicates the row)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    params: dict = {"bits": bits, "dim": dim, "tables": int(tables)}
    if codes == "pq":
        books = sim.pq_codebooks(df, m=pq_m, k=pq_k, vec_col=vec_col,
                                 id_col=id_col)
        df = sim.pq_encode(df, books, vec_col=vec_col, id_col=id_col,
                           keep=(vec_col,))
        params["pq_books"] = [[list(map(float, c)) for c in B] for B in books]
    elif codes != "float":
        raise ValueError(f"codes must be 'float' or 'pq', got {codes!r}")
    signed = _lsh_bucketize(df, dim, bits, int(tables), id_col, vec_col,
                            extra_cols=("pq_codes",) if codes == "pq" else ())
    # same small-files rationale as ivf_build: writer count scales with
    # corpus bytes instead of tasks x 2^bits fragments
    _clustered_partitioned_write(signed, path, "__sig", id_col,
                                 int(tables) << bits)
    idx = VectorIndex(
        kind="lsh", path=path, id_col=id_col, vec_col=vec_col, params=params,
        schema_json=signed.schema.json(),
    )
    idx.save_sidecar()
    return idx


def lsh_probe(
    spark: SparkSession, index: VectorIndex | str, query_vec: list[float],
    k: int = 10, hamming: int = 1, shortlist: int | None = None,
) -> DataFrame:
    """Probe the materialized LSH store: per table, the query's bucket plus
    its hamming<=`hamming` multiprobe neighbors form the partition filter;
    only those directories are read, then exact cosine + TakeOrdered. With
    tables > 1 a vector found in several tables is deduplicated by id
    (its cosine is identical in every copy). The deterministic plane
    matrix means the driver-side `signature_of` can never drift from the
    build-time corpus signatures.

    On a `codes="pq"` store the probed buckets are ADC-ranked over the
    ~pq_m-byte code column first (pure JVM, sim.pq_adc_dist — the same
    path ivf_probe uses), and only the top `shortlist` (default 5*k) ids
    join back for the exact-cosine rerank — the float vectors decode for
    shortlist rows only."""
    shortlist = _resolve_shortlist(shortlist, k)
    if isinstance(index, str):
        index = load_index(index)
    bits = index.params["bits"]
    tables = int(index.params.get("tables", 1))
    probe_sigs = _lsh_probe_buckets(query_vec, bits, tables, hamming)
    q = const_double_array(query_vec)
    stored = index.stored_df(spark)
    pruned = stored.filter(F.col("__sig").isin(probe_sigs))
    if index.params.get("pq_books"):
        pruned = _adc_shortlist(pruned, index, query_vec, shortlist,
                                dedup=tables > 1)
    scored = pruned.select(
        F.col(index.id_col),
        F.round(sim.cosine(F.col(index.vec_col), q), 6).alias("cosine_sim"),
    )
    if tables > 1:
        # same vector, identical cosine in every table copy -> keep one
        scored = scored.groupBy(index.id_col).agg(
            F.max("cosine_sim").alias("cosine_sim")
        )
    return scored.orderBy(F.desc("cosine_sim"), F.col(index.id_col)).limit(k)


def _part_meta(index: VectorIndex) -> tuple[str, int]:
    """(partition column, bucket cardinality) for either store kind."""
    if index.kind == "ivf":
        return "__cell", int(index.params["n_cells"])
    return "__sig", (
        int(index.params.get("tables", 1)) << int(index.params["bits"])
    )


def index_append(df: DataFrame, index: VectorIndex | str) -> VectorIndex:
    """Grow the store with a NEW embedding batch — the lifecycle step a
    continuously re-embedding training pipeline needs (the reference's
    import-once model never re-imports the historical corpus either;
    compare dedup's minhash_index_append). The batch is assigned with the
    BUILD's codebook / plane parameters straight from the sidecar, so an
    append can never use a different geometry than the probes, and ONLY
    the batch is shuffled: historical partition files are untouched —
    append cost is O(batch), not O(corpus). New files land inside the
    same cell/signature directories, so every probe sees appended vectors
    immediately with the same partition pruning. Ids are the caller's
    contract: appending an id that already exists stores both rows (a
    probe may then return the id once per copy — dedup upstream).

    Repeated appends accrete small files per directory; run
    `index_compact` off-peak to restore ~128 MB files (the same
    OPTIMIZE-after-ingest discipline as layout.snapshot_optimize)."""
    if isinstance(index, str):
        index = load_index(index)
    if index.kind == "ivf":
        assigned = sim.ivf_assign(
            df, index.params["leaders"], index.vec_col
        ).select(index.id_col, index.vec_col, "__cell")
        if index.params.get("pq_books"):
            # the BUILD's PQ codebooks, straight from the sidecar — an
            # appended batch is encoded with the exact geometry probes use
            assigned = sim.pq_encode(
                assigned, _pq_books(index), vec_col=index.vec_col,
                id_col=index.id_col, keep=(index.vec_col, "__cell"),
            )
    else:
        lsh_df = df
        extra: tuple = ()
        if index.params.get("pq_books"):
            # same re-encode contract as the IVF branch: the batch gets
            # the BUILD's codebooks from the sidecar
            lsh_df = sim.pq_encode(
                df, _pq_books(index), vec_col=index.vec_col,
                id_col=index.id_col, keep=(index.vec_col,),
            )
            extra = ("pq_codes",)
        assigned = _lsh_bucketize(
            lsh_df, index.params["dim"], index.params["bits"],
            int(index.params.get("tables", 1)), index.id_col, index.vec_col,
            extra_cols=extra,
        )
    part_col, n_buckets = _part_meta(index)
    _clustered_partitioned_write(
        assigned, index.path, part_col, index.id_col, n_buckets, mode="append"
    )
    # the memoized reader's file index predates this append — drop it
    index.invalidate_stored()
    return index


def index_compact(spark: SparkSession, index: VectorIndex | str) -> dict:
    """Compact the store after a run of appends: ONE clustering shuffle
    rewrites every partition's accreted small files back to the
    ~128 MB-file policy of the original build, into a fresh directory
    that is then swapped in. Row-identical before and after (the gate
    asserts recall on the compacted store); only file counts change.
    Probes running strictly before or after the swap are consistent; the
    swap itself is two directory renames — at lakehouse scale this
    becomes a manifest flip (layout.snapshot_optimize is that shape), but
    a filesystem store has no manifest to flip.

    CONCURRENCY CONTRACT — compaction is WRITER-EXCLUSIVE: no index_append
    may run concurrently with index_compact. An append that lands after
    `stored` materializes into the tmp dir is silently dropped by the
    swap, and one landing between the two renames hits a missing
    directory. Serialize appends and compactions externally (the same
    single-writer discipline every filesystem-only table store requires).
    Crash safety IS handled: a crash between the two renames leaves a
    complete sidecar-bearing .compact-tmp (or the retired .compact-old),
    which load_index detects and swaps back in (_recover_compact).

    COMMIT PROTOCOL IS SCHEME-AWARE (commitio): the rename swap above is
    the posix/HDFS strategy — rename there is atomic. On object-store
    schemes (s3/gs/abfs/... — or when SPARK_GRAFT_COMMIT_BACKEND=object)
    rename is copy+delete with a long non-atomic window, so compaction
    NEVER renames: it writes the compacted store into a fresh
    writer-unique generation dir under <root>/_gendata/ and atomically
    publishes a generation pointer (<root>/_gen/v{N}.json, conditional
    put). Readers resolve the pointer at load_index time and always see
    a complete generation; a crash anywhere leaves either the old
    pointer (old store fully live, the orphan data dir is swept by the
    next compact) or the new pointer (new store fully live). The
    generation BEFORE the new one is retained as an in-flight-reader
    grace window; older ones are retired at commit.

    Returns {files_before, files_after, rows}."""
    import shutil

    from ophidia_server_spark import commitio

    if isinstance(index, str):
        index = load_index(index)
    part_col, n_buckets = _part_meta(index)
    root = index.store_root()
    stored = index.stored_df(spark)

    def _count_files(root_: str) -> int:
        n = 0
        for _, _, fs in os.walk(root_):
            n += sum(1 for f in fs if f.endswith(".parquet"))
        return n

    files_before = _count_files(index.path)
    # exact row count from the parquet FOOTERS (driver-side metadata read,
    # same O(files) walk as _count_files above) instead of a full-store
    # Spark scan — round-13 opt, guide §1.4/§5: the compact path read the
    # whole store twice (count + rewrite); footers carry num_rows exactly.
    rows = _footer_rows(index.path)
    if rows is None:
        rows = stored.count()
    if commitio.commit_scheme(root) == "object":
        return _compact_by_generation(
            index, stored, root, part_col, n_buckets, files_before, rows,
            _count_files,
        )
    tmp = index.path.rstrip("/") + ".compact-tmp"
    old = index.path.rstrip("/") + ".compact-old"
    shutil.rmtree(tmp, ignore_errors=True)
    _clustered_partitioned_write(
        stored, tmp, part_col, index.id_col, n_buckets
    )
    # the swap: new dir in, old dir out, sidecar carried over verbatim
    shutil.copy(os.path.join(index.path, _SIDECAR), os.path.join(tmp, _SIDECAR))
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index.path, old)
    os.rename(tmp, index.path)
    shutil.rmtree(old)
    index.invalidate_stored()
    files_after = _count_files(index.path)
    return {"files_before": files_before, "files_after": files_after,
            "rows": rows}


def _compact_by_generation(
    index: VectorIndex, stored, root: str, part_col: str, n_buckets: int,
    files_before: int, rows: int, _count_files,
) -> dict:
    """Object-scheme compaction: fresh generation dir + atomic pointer
    publish; no rename anywhere on the commit path (see index_compact)."""
    import json as _json
    import shutil
    import uuid

    from ophidia_server_spark import commitio

    gen_dir = os.path.join(root, _GEN_DIR)
    os.makedirs(gen_dir, exist_ok=True)
    vs = _gen_versions(root)
    referenced = set()
    for v in vs:
        with open(os.path.join(gen_dir, f"v{v}.json")) as fh:
            referenced.add(_json.load(fh)["data"])
    data_root = os.path.join(root, _GEN_DATA)
    if os.path.isdir(data_root):
        # compaction is writer-exclusive (the documented contract), so an
        # unreferenced generation dir at start is a crashed writer's
        # orphan — sweep it before paying the write
        for d in os.listdir(data_root):
            if os.path.join(_GEN_DATA, d) not in referenced:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
    n = (vs[-1] + 1) if vs else 1
    rel = os.path.join(_GEN_DATA, f"g{n:05d}-{uuid.uuid4().hex[:8]}")
    new_data = os.path.join(root, rel)
    _clustered_partitioned_write(
        stored, new_data, part_col, index.id_col, n_buckets
    )
    shutil.copy(
        os.path.join(index.path, _SIDECAR), os.path.join(new_data, _SIDECAR)
    )
    tmp = os.path.join(gen_dir, f".v{n}.json.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        _json.dump({"data": rel}, fh)
    try:
        commitio.publish_exclusive(
            tmp, os.path.join(gen_dir, f"v{n}.json"), "object"
        )
    except FileExistsError:
        os.unlink(tmp)
        shutil.rmtree(new_data, ignore_errors=True)
        raise RuntimeError(
            f"generation {n} of {root} was committed concurrently — "
            "compaction requires a single writer"
        ) from None
    # retire generations older than the PREVIOUS one (kept as the
    # in-flight-reader grace window); the pre-pointer root-level data of
    # generation 0 is left in place — it doubles as the recovery floor
    # and is invisible to pointer-resolved readers
    for v in vs[:-1]:
        with open(os.path.join(gen_dir, f"v{v}.json")) as fh:
            old_rel = _json.load(fh)["data"]
        if old_rel.startswith(_GEN_DATA):
            shutil.rmtree(os.path.join(root, old_rel), ignore_errors=True)
    index.path = new_data
    index.root = root
    index.invalidate_stored()
    return {"files_before": files_before,
            "files_after": _count_files(new_data), "rows": rows}
