"""Request facade: reference-style JSON workflows over the default operator
set, with tasks chained by cube PID.

This is the user-facing parity layer: the reference's clients submit a JSON
workflow whose tasks name operators (`oph_importcsv`, `oph_subset`,
`oph_reduce`, ...) and reference cubes by PID; each data operator emits the
PID of its output cube which dependents receive via their `cube` argument
(dependency `cube` propagation, oph_workflow_engine.c notify path). Here the
same contract runs on Spark: operators resolve PIDs through a CubeStore,
build lazy DataFrame plans, register results back, and return the new PID.

Argument conventions follow the reference XML descriptors: multivalue args are
`|`-separated strings, subsets are `dim1|dim2` + `filter1|filter2` pairs,
`operation` names the reduction kernel.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ophidia_server_spark.operators import cube_ops as C
from ophidia_server_spark.operators import io_ops as IO
from ophidia_server_spark.plans.workflow import WorkflowEngine
from ophidia_server_spark.store import CubeStore


def _resolve_cube_arg(args: dict, inputs: dict) -> str:
    """The reference propagates the parent task's output cube into the `cube`
    argument when the task does not set one (dep type `single`/`embedded`)."""
    pid = args.get("cube")
    if pid:
        return str(pid)
    for v in inputs.values():
        if isinstance(v, str) and v:
            return v
    raise ValueError("no cube argument and no parent cube to inherit")


def build_default_engine(spark: SparkSession, store: CubeStore) -> WorkflowEngine:
    """WorkflowEngine wired with the default datacube operator set.

    Every data operator is a closure over (spark, store): resolve input PIDs,
    build the Spark plan, register the output cube (lazily — no materialize
    unless the operator is an export), return the new PID as the task value.
    """

    def op_importcsv(engine, args: dict[str, Any], inputs):
        pid = store.importcsv(
            args["src_path"],
            explicit_dims=str(args["explicit_dims"]).split("|"),
            implicit_dim=args["implicit_dim"],
            value=args["measure"],
            container=args.get("container", "default"),
            schema=args.get("schema"),
        )
        return pid

    def op_importparquet(engine, args, inputs):
        cube = IO.oph_importparquet(
            spark, args["src_path"],
            explicit_dims=str(args["explicit_dims"]).split("|"),
            implicit_dim=args["implicit_dim"],
            value=args["measure"],
        )
        return store.register(cube, args.get("container", "default"), task="importparquet")

    def op_randcube(engine, args, inputs):
        from ophidia_server_spark.cube import randcube

        cube = randcube(
            spark,
            nrows=int(args.get("nrows", 100)),
            array_len=int(args.get("nvalues", 12)),
        )
        return store.register(cube, args.get("container", "default"), task="randcube")

    def op_subset(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        dims = str(args["subset_dims"]).split("|")
        filters = str(args["subset_filter"]).split("|")
        cube = store.get(pid)
        out = C.oph_subset(
            cube,
            dict(zip(dims, filters)),
            subset_type=str(args.get("subset_type", "index")),
            offset=int(args.get("offset", 0) or 0),
        )
        return store.register(out, args.get("container", "default"),
                              parents=[pid], task="subset")

    def op_reduce(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        cube = store.get(pid)
        out = C.oph_reduce(cube, str(args.get("operation", "avg")))
        # reduce collapses the implicit dim; re-pack the scalar per row as a
        # length-1 array so the result stays a cube (the reference keeps
        # reduced cubes addressable like any other)
        from ophidia_server_spark.cube import build_cube

        reduced_col = out.columns[-1]  # named <operation>_<measure>
        packed = build_cube(
            out.withColumn("__r", F.lit(0)),
            list(cube.explicit_dims), "__r", F.col(reduced_col),
            measure=cube.measure,
        )
        return store.register(packed, args.get("container", "default"),
                              parents=[pid], task="reduce")

    def op_aggregate(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        out = C.oph_aggregate(
            store.get(pid), str(args.get("operation", "sum")),
            str(args["group_dims"]).split("|") if args.get("group_dims") else
            list(store.get(pid).explicit_dims)[1:],
        )
        return store.register(out, args.get("container", "default"),
                              parents=[pid], task="aggregate")

    def op_intercube(engine, args, inputs):
        pids = str(args["cubes"]).split("|") if args.get("cubes") else [
            v for v in inputs.values() if isinstance(v, str)
        ]
        if len(pids) != 2:
            raise ValueError("oph_intercube needs exactly 2 cubes")
        out = C.oph_intercube(
            store.get(pids[0]), store.get(pids[1]), str(args.get("operation", "sub"))
        )
        return store.register(out, args.get("container", "default"),
                              parents=pids, task="intercube")

    def op_reduce2(engine, args, inputs):
        from ophidia_server_spark.functions.hierarchy import concept_level

        pid = _resolve_cube_arg(args, inputs)
        cube = store.get(pid)
        out = C.oph_reduce2(
            cube,
            str(args.get("operation", "avg")),
            concept_level(str(args.get("concept_level", "month"))),
        )
        return store.register(out, args.get("container", "default"),
                              parents=[pid], task="reduce2")

    def op_aggregate2(engine, args, inputs):
        from ophidia_server_spark.functions.hierarchy import concept_level

        pid = _resolve_cube_arg(args, inputs)
        out = C.oph_aggregate2(
            store.get(pid),
            str(args.get("operation", "sum")),
            args["dim"],
            concept_level(str(args.get("concept_level", "month"))),
        )
        return store.register(out, args.get("container", "default"),
                              parents=[pid], task="aggregate2")

    def op_rollup(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        out = C.oph_rollup(store.get(pid), args["dim"])
        return store.register(out, args.get("container", "default"),
                              parents=[pid], task="rollup")

    def op_drilldown(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        # drilldown explodes to the long form; returned as a response value
        # (the reference renders it as a grid)
        from ophidia_server_spark.plans.response import grid

        return grid(C.oph_drilldown(store.get(pid)), title=f"drilldown {pid}",
                    limit=int(args.get("limit", 1000)))

    def op_permute(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        out = C.oph_permute(store.get(pid), str(args["dim_order"]).split("|"))
        return store.register(out, args.get("container", "default"),
                              parents=[pid], task="permute")

    def op_mergecubes(engine, args, inputs):
        pids = str(args["cubes"]).split("|") if args.get("cubes") else [
            v for v in inputs.values() if isinstance(v, str)
        ]
        cubes = [store.get(p) for p in pids]
        out = C.oph_mergecubes_n(cubes) if len(cubes) > 2 else C.oph_mergecubes(*cubes)
        return store.register(out, args.get("container", "default"),
                              parents=pids, task="mergecubes")

    def op_apply(engine, args, inputs):
        from ophidia_server_spark.functions.primitives import PRIMITIVES

        pid = _resolve_cube_arg(args, inputs)
        name = str(args.get("query", "oph_mul_scalar"))
        if name not in PRIMITIVES:
            raise KeyError(f"unknown primitive {name!r}; known: {sorted(PRIMITIVES)}")
        # primitive parameters come as |-separated floats, e.g. query=
        # oph_mul_scalar;parameters=2.0|1.0 (mirrors the reference's
        # primitive-call strings without embedding a SQL-ish parser)
        params = [float(x) for x in str(args.get("parameters", "")).split("|") if x]
        prim_fn = PRIMITIVES[name](*params)
        out = C.oph_apply(store.get(pid), prim_fn)
        return store.register(out, args.get("container", "default"),
                              parents=[pid], task="apply")

    def op_duplicate(engine, args, inputs):
        return store.duplicate(_resolve_cube_arg(args, inputs))

    def op_delete(engine, args, inputs):
        store.delete(_resolve_cube_arg(args, inputs))
        return None

    def op_metadata(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        mode = str(args.get("mode", "read"))
        if mode == "insert":
            store.metadata_put(pid, args["metadata_key"], args["metadata_value"])
            return pid
        if mode == "delete":
            store.metadata_delete(pid, args["metadata_key"])
            return pid
        return store.metadata_get(pid, args.get("metadata_key"))

    def op_cubeschema(engine, args, inputs):
        return store.cubeschema(_resolve_cube_arg(args, inputs))

    def op_explorecube(engine, args, inputs):
        return store.explorecube_response(
            _resolve_cube_arg(args, inputs), limit=int(args.get("limit", 100))
        )

    def op_publish(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        out = IO.oph_publish(
            store.get(pid), args["publish_dir"], args.get("name", f"cube_{store.entries[pid].cube_id}"),
            limit=int(args.get("limit", 1000)),
        )
        return out

    def op_unpublish(engine, args, inputs):
        IO.oph_unpublish(args["publish_dir"], args["name"])
        return None

    def op_fs(engine, args, inputs):
        from ophidia_server_spark.plans.response import grid as _grid  # noqa: F401

        entries = IO.oph_fs(
            args["path"], file_filter=args.get("file"),
            recursive=str(args.get("recursive", "no")).lower() == "yes",
        )
        return {
            "objclass": "grid", "title": f"fs ls {args['path']}",
            "rowkeys": ["type", "name", "size"],
            "rowfieldtypes": ["string", "string", "bigint"],
            "rowvalues": [[e["type"], e["name"], e["size"]] for e in entries],
        }

    def op_exportcsv(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        IO.oph_exportcsv(store.get(pid), args["output_path"])
        return pid

    # -- LLM-pipeline operators: corpus jobs as workflow tasks ---------------
    def op_pipe_dedup(engine, args, inputs):
        from ophidia_server_spark.pipeline.dedup import dedup_exact
        from ophidia_server_spark.pipeline.packing import dedup_lines

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        level = args.get("level", "document")
        if level == "document":
            res = dedup_exact(
                spark.read.parquet(src), args.get("text_col", "text")
            )
        elif level == "line":
            res = dedup_lines(
                spark.read.parquet(src), args.get("text_col", "text"),
                args.get("key_col", "doc_id"),
                scope=args.get("scope", "corpus"),
            )
        else:
            raise ValueError(f"unknown dedup level: {level}")
        res.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_quality_filter(engine, args, inputs):
        from ophidia_server_spark.pipeline.text import quality_score

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        docs = spark.read.parquet(src)
        scored = quality_score(docs, args.get("text_col", "text"))
        kept = docs.join(
            scored.filter(F.col("quality") >= float(args.get("min_quality", 0.5))).select(
                "doc_id"
            ),
            "doc_id",
            "left_semi",
        )
        kept.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_minhash(engine, args, inputs):
        from ophidia_server_spark.pipeline.dedup import minhash_lsh_pairs

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        minhash_lsh_pairs(
            spark.read.parquet(src),
            args.get("text_col", "text"),
            jaccard_threshold=float(args.get("threshold", 0.5)),
        ).write.mode("overwrite").parquet(out)
        return out

    def op_pipe_chunk(engine, args, inputs):
        from ophidia_server_spark.pipeline.text import chunk_documents

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        chunk_documents(
            spark.read.parquet(src),
            int(args.get("chunk_tokens", 64)),
            int(args.get("overlap_tokens", 16)),
            args.get("text_col", "text"),
        ).write.mode("overwrite").parquet(out)
        return out

    def op_pipe_sample(engine, args, inputs):
        from ophidia_server_spark.pipeline.sampling import (
            fixed_k_sample, group_fixed_k_sample, hash_sample,
            stratified_sample, temperature_sample, train_val_test_split,
            weighted_sample,
        )

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        df = spark.read.parquet(src)
        mode = args.get("mode", "bernoulli")
        if mode == "bernoulli":
            res = hash_sample(
                df, float(args["frac"]), args.get("key_col", "doc_id"),
                args.get("salt", ""),
            )
        elif mode == "stratified":
            res = stratified_sample(
                df, dict(args["fracs"]), args.get("strata_col", "source"),
                args.get("key_col", "doc_id"),
                float(args.get("default_frac", 0.0)), args.get("salt", "mix"),
            )
        elif mode == "split":
            res = train_val_test_split(
                df, float(args.get("val_frac", 0.1)),
                float(args.get("test_frac", 0.1)),
                args.get("key_col", "doc_id"), args.get("salt", "split"),
            )
        elif mode == "fixed_k":
            res = fixed_k_sample(
                df, int(args["k"]), args.get("key_col", "doc_id"),
                args.get("salt", "resv"),
            )
        elif mode == "group_fixed_k":
            res = group_fixed_k_sample(
                df, int(args["k"]), args.get("strata_col", "source"),
                args.get("key_col", "doc_id"), args.get("salt", "gresv"),
            )
        elif mode == "temperature":
            res = temperature_sample(
                df, int(args["total"]), float(args.get("alpha", 0.5)),
                args.get("strata_col", "source"),
                args.get("key_col", "doc_id"), args.get("salt", "temp"),
            )
        elif mode == "weighted":
            res = weighted_sample(
                df, args["weight_col"], float(args.get("rate_scale", 1.0)),
                args.get("key_col", "doc_id"), args.get("salt", "wsamp"),
            )
        else:
            raise ValueError(f"unknown sampling mode: {mode}")
        res.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_vector_index(engine, args, inputs):
        # ANN serving stage: build the partition-pruned vector store, or
        # probe an existing one (query vector by row id) into a parquet stage
        from ophidia_server_spark.pipeline import vector_store as vstore

        action = str(args.get("action", "build"))
        path = str(args["index_path"])
        if action == "build":
            src = args.get("src_path") or next(
                v for v in inputs.values() if isinstance(v, str)
            )
            df = spark.read.parquet(src)
            kind = args.get("kind", "ivf")
            if kind == "ivf":
                vstore.ivf_build(
                    df, path, n_cells=int(args.get("n_cells", 16)),
                    id_col=args.get("key_col", "vec_id"),
                    vec_col=args.get("vec_col", "embedding"),
                )
            elif kind == "lsh":
                vstore.lsh_build(
                    df, path, bits=int(args.get("bits", 8)),
                    id_col=args.get("key_col", "vec_id"),
                    vec_col=args.get("vec_col", "embedding"),
                )
            else:
                raise ValueError(f"unknown index kind: {kind}")
            return path
        if action == "probe":
            out = str(args["output_path"])
            idx = vstore.load_index(path)
            qsrc = args.get("query_path") or args.get("src_path") or next(
                v for v in inputs.values() if isinstance(v, str)
            )
            qid = int(args["query_id"])
            qrow = (
                spark.read.parquet(qsrc)
                .filter(F.col(idx.id_col) == qid)
                .select(idx.vec_col)
                .first()
            )
            if qrow is None:
                raise ValueError(f"query id {qid} not found in {qsrc}")
            qvec = [float(x) for x in qrow[0]]
            probe = vstore.ivf_probe if idx.kind == "ivf" else vstore.lsh_probe
            res = probe(
                spark, idx, qvec, k=int(args.get("k", 10)),
            )
            res.write.mode("overwrite").parquet(out)
            return out
        raise ValueError(f"unknown vector-index action: {action}")

    def op_pipe_features(engine, args, inputs):
        # feature-engineering stage: clip / standardize / scale / encode /
        # rolling windows over a tabular stage
        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        df = spark.read.parquet(src)
        mode = args.get("mode", "standardize")
        vcol = args.get("value_col", "value")
        gcol = args.get("group_col", "event_type")
        if mode == "standardize":
            from ophidia_server_spark.pipeline.features import (
                standardize_by_group,
            )

            res = standardize_by_group(df, vcol, gcol)
        elif mode == "minmax":
            from ophidia_server_spark.pipeline.features import minmax_by_group

            res = minmax_by_group(df, vcol, gcol)
        elif mode == "index":
            from ophidia_server_spark.pipeline.features import string_index

            res, vocab = string_index(df, args.get("col", gcol))
            vocab.write.mode("overwrite").parquet(out.rstrip("/") + "_vocab")
        elif mode == "winsorize":
            from ophidia_server_spark.functions.sketches import (
                winsorize_by_group,
            )

            res = winsorize_by_group(
                df, vcol, gcol,
                float(args.get("lower_q", 0.01)),
                float(args.get("upper_q", 0.99)),
            )
        elif mode == "rolling":
            from ophidia_server_spark.streaming.windows import (
                rolling_user_window,
            )

            res = rolling_user_window(
                df, int(args.get("days", 7)), args.get("ts_col", "ts"),
                args.get("key_col", "user_id"), vcol,
            )
        else:
            raise ValueError(f"unknown features mode: {mode}")
        res.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_triplets(engine, args, inputs):
        # contrastive training pairs: LSH near-dup positives + content-
        # addressed random negatives (optionally hard negatives from a
        # lower-similarity band)
        from ophidia_server_spark.pipeline.contrastive import (
            contrastive_triplets, contrastive_triplets_hard,
        )
        from ophidia_server_spark.pipeline.dedup import ngram_jaccard_pairs

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        df = spark.read.parquet(src)
        thr = float(args.get("threshold", 0.5))
        pairs = ngram_jaccard_pairs(
            df, args.get("text_col", "text"), threshold=thr
        )
        hard_lo = float(args.get("hard_band_min", 0))
        if hard_lo > 0:
            hard = ngram_jaccard_pairs(
                df, args.get("text_col", "text"), threshold=hard_lo
            ).filter(F.col("jaccard") < thr).selectExpr(
                "doc_a AS id_a", "doc_b AS id_b", "jaccard"
            )
            res = contrastive_triplets_hard(
                df, pairs.selectExpr("doc_a AS id_a", "doc_b AS id_b", "jaccard"),
                hard, args.get("key_col", "doc_id"),
                int(args.get("n_buckets", 8)),
            )
        else:
            res = contrastive_triplets(
                df, pairs.selectExpr("doc_a AS id_a", "doc_b AS id_b", "jaccard"),
                args.get("key_col", "doc_id"), int(args.get("n_buckets", 8)),
            )
        res.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_classify(engine, args, inputs):
        # quality-classifier bootstrap: train logreg on a labeled stage,
        # score a corpus stage, write (id, prob, keep)
        from pyspark.storagelevel import StorageLevel

        from ophidia_server_spark.pipeline import classifier as clf
        from ophidia_server_spark.pipeline.dsir import hashed_gram_counts

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        m = int(args.get("m", 256))
        labeled = spark.read.parquet(src)
        text_col = args.get("text_col", "text")
        id_col = args.get("key_col", "doc_id")
        feats = hashed_gram_counts(labeled, m, text_col, id_col)
        if args.get("features", "presence") == "presence":
            feats = feats.select(
                id_col, "bucket", F.lit(1.0).alias("c")
            ).distinct()
        else:
            feats = clf.tf_normalize(feats, id_col)
        feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            res = clf.logreg_train(
                feats,
                labeled.select(id_col, args.get("label_col", "label")),
                m=m,
                iters=int(args.get("iters", 8)),
                lr=float(args.get("lr", 1.0)),
                id_col=id_col,
                label_col=args.get("label_col", "label"),
            )
            scored = clf.logreg_predict(
                feats, labeled.select(id_col), res.weights, res.bias,
                id_col=id_col,
                threshold=float(args.get("threshold", 0.5)),
            )
            scored.write.mode("overwrite").parquet(out)
        finally:
            feats.unpersist()
        return out

    def op_pipe_snapshot(engine, args, inputs):
        # versioned-table stage: write / upsert / optimize / vacuum against
        # a snapshot store (layout.py manifest-swap commits)
        from ophidia_server_spark import layout as lay

        path = str(args["table_path"])
        action = str(args.get("action", "write"))
        if action == "write":
            src = args.get("src_path") or next(
                v for v in inputs.values() if isinstance(v, str)
            )
            v = lay.snapshot_write(spark.read.parquet(src), path)
            return f"{path}@v{v}"
        if action == "upsert":
            src = args.get("src_path") or next(
                v for v in inputs.values() if isinstance(v, str)
            )
            keys = args["key_cols"]
            if isinstance(keys, str):
                keys = [k for k in keys.split("|") if k]
            res = lay.snapshot_upsert(
                spark, path, spark.read.parquet(src), list(keys)
            )
            return f"{path}@v{res['version']}"
        if action == "optimize":
            cols = args.get("columns")
            if isinstance(cols, str):
                cols = [c for c in cols.split("|") if c]
            res = lay.snapshot_optimize(
                spark, path, zorder_cols=list(cols) if cols else None,
                target_mb=int(args.get("target_mb", 128)),
            )
            return f"{path}@v{res['version']}"
        if action == "vacuum":
            lay.vacuum(path, keep_last=int(args.get("keep_last", 1)))
            return path
        raise ValueError(f"unknown snapshot action: {action}")

    def op_pipe_select(engine, args, inputs):
        # DSIR target-domain selection: keep the k most target-like docs
        from ophidia_server_spark.pipeline.dsir import dsir_select

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        df = spark.read.parquet(src)
        res = dsir_select(
            df,
            int(args["k"]),
            F.expr(str(args["target_filter"])),
            m=int(args.get("m", 1024)),
            alpha=float(args.get("alpha", 1.0)),
            gumbel_scale=float(args.get("gumbel_scale", 0.0)),
            text_col=args.get("text_col", "text"),
            id_col=args.get("key_col", "doc_id"),
        )
        res.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_interleave(engine, args, inputs):
        # round-robin training order across sources/languages/clusters
        from ophidia_server_spark.pipeline.sampling import interleave_groups

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        df = spark.read.parquet(src)
        res = interleave_groups(
            df, args.get("strata_col", "source"),
            args.get("key_col", "doc_id"), args.get("salt", "ilv"),
        )
        res.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_drift(engine, args, inputs):
        # PSI drift check between a reference stage and a new batch; abort
        # the workflow when psi exceeds the threshold (the audit-gate shape)
        from ophidia_server_spark.pipeline.audit import drift_report

        ref = spark.read.parquet(str(args["ref_path"]))
        new = spark.read.parquet(
            args.get("src_path") or next(
                v for v in inputs.values() if isinstance(v, str)
            )
        )
        out = str(args["output_path"])
        rep = drift_report(
            ref, new, args.get("value_col", "value"),
            int(args.get("n_buckets", 10)),
        )
        rep.write.mode("overwrite").parquet(out)
        psi = rep.select("psi").first()["psi"]
        limit = float(args.get("max_psi", 0))
        if limit and psi > limit:
            raise ValueError(
                f"drift gate failed: psi {psi} exceeds max_psi {limit}"
            )
        return out

    def op_pipe_contamination(engine, args, inputs):
        from ophidia_server_spark.pipeline.dedup import shingle_sets
        from ophidia_server_spark.pipeline.text import contamination_flags

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        docs = spark.read.parquet(src)
        probe_src = spark.read.parquet(str(args["probe_path"]))
        probe = shingle_sets(probe_src, args.get("text_col", "text")).select(
            F.explode("shingles").alias("s")
        )
        flags = contamination_flags(docs, probe, args.get("text_col", "text"))
        kept = docs.join(
            flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id", "left_semi"
        )
        kept.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_redact_pii(engine, args, inputs):
        # privacy scrub stage: replace PII spans with typed placeholders and
        # write the redacted corpus (text column swapped in place)
        from ophidia_server_spark.pipeline.text import redact_pii

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        tc = args.get("text_col", "text")
        docs = spark.read.parquet(src)
        red = redact_pii(docs, tc).drop(tc).withColumnRenamed(f"{tc}_redacted", tc)
        red.select(*docs.columns).write.mode("overwrite").parquet(out)
        return out

    def op_pipe_pack(engine, args, inputs):
        from ophidia_server_spark.pipeline.packing import pack_sequences

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        pack_sequences(
            spark.read.parquet(src),
            seq_len=int(args.get("seq_len", 2048)),
            n_buckets=int(args.get("n_buckets", 64)),
            text_col=args.get("text_col", "text"),
        ).write.mode("overwrite").parquet(out)
        return out

    def op_pipe_shuffle(engine, args, inputs):
        from ophidia_server_spark.pipeline.packing import global_shuffle

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        global_shuffle(
            spark.read.parquet(src),
            n_shards=int(args.get("n_shards", 64)),
            salt=args.get("salt", "epoch0"),
        ).write.mode("overwrite").parquet(out)
        return out

    def op_pipe_quality_model(engine, args, inputs):
        # logistic quality gate: score + filter at keep_threshold, writing
        # the surviving corpus rows (score columns ride along for audit)
        from ophidia_server_spark.pipeline.packing import quality_logistic

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        docs = spark.read.parquet(src)
        scored = quality_logistic(
            docs,
            keep_threshold=float(args.get("keep_threshold", 0.5)),
            text_col=args.get("text_col", "text"),
        )
        kept = docs.join(
            scored.filter(F.col("keep") == 1).select("doc_id"), "doc_id", "left_semi"
        )
        kept.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_semantic_dedup(engine, args, inputs):
        from ophidia_server_spark.pipeline.similarity import semantic_dedup

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        semantic_dedup(
            spark.read.parquet(src),
            n_clusters=int(args.get("n_clusters", 64)),
            threshold=float(args.get("threshold", 0.95)),
            id_col=args.get("id_col", "vec_id"),
            vec_col=args.get("vec_col", "embedding"),
        ).write.mode("overwrite").parquet(out)
        return out

    def op_pipe_repack(engine, args, inputs):
        # loader-handoff sharding: rewrite the stage's parquet near a
        # target file size (io_ops.repack_parquet)
        from ophidia_server_spark.operators.io_ops import repack_parquet

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        repack_parquet(
            spark.read.parquet(src), out,
            target_mb=float(args.get("target_mb", 256)),
        )
        return out

    def op_pipe_sketch(engine, args, inputs):
        # mergeable-summary stage: write a sketch table (HLL registers /
        # count-min counters / DDSketch buckets) for a column — downstream
        # jobs combine per-stage sketches instead of re-scanning the corpus
        from ophidia_server_spark.functions import sketches as sk

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        df = spark.read.parquet(src)
        kind = str(args.get("kind", "hll"))
        col = str(args["column"])
        if kind == "hll":
            res = sk.hll_registers(df, col, p=int(args.get("p", 12)))
        elif kind == "cms":
            res = sk.cms_sketch(
                df, col, d=int(args.get("d", 4)), w=int(args.get("w", 4096))
            )
        elif kind == "dds":
            res = sk.dds_sketch(df, col, alpha=float(args.get("alpha", 0.01)))
        elif kind == "bloom":
            res = sk.bloom_bits(
                df, col,
                m_bits=int(args.get("m_bits", 8192)), k=int(args.get("k", 4)),
            )
        elif kind == "hll_rolling":
            # the WAU/MAU dashboard table: trailing-N-day distinct estimates
            res = sk.hll_rolling_distinct(
                df, col, args.get("ts_col", "ts"),
                days=int(args.get("days", 7)), p=int(args.get("p", 8)),
            )
        else:
            raise ValueError(f"unknown sketch kind: {kind}")
        res.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_dedup_index(engine, args, inputs):
        # ingest-side artifact: materialize the corpus's banded MinHash
        # signatures once (mode=build); mode=append grows an existing index
        # with ONLY the new batch's rows — the historical corpus is never
        # re-shingled, so a daily crawl chains novelty-gate -> append
        from ophidia_server_spark.pipeline.dedup import (
            minhash_index_append, minhash_index_build)

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        fn = (
            minhash_index_append
            if str(args.get("mode", "build")) == "append"
            else minhash_index_build
        )
        return fn(
            spark.read.parquet(src), str(args["output_path"]),
            args.get("text_col", "text"),
        )

    def op_pipe_novelty(engine, args, inputs):
        # continuous-ingest novelty gate: verdicts for a new batch against
        # the materialized index; keep=novel writes only the genuinely new
        # docs (the filter stage a daily crawl chains before append)
        from ophidia_server_spark.pipeline.dedup import dedup_incremental

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        batch = spark.read.parquet(src)
        verdicts = dedup_incremental(
            batch, str(args["index_path"]),
            args.get("text_col", "text"),
            jaccard_threshold=float(args.get("threshold", 0.5)),
        )
        if str(args.get("keep", "verdicts")) == "novel":
            res = batch.join(
                verdicts.filter(F.col("is_novel") == 1).select("doc_id"),
                "doc_id", "left_semi",
            )
        else:
            res = verdicts
        res.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_export(engine, args, inputs):
        # loader-handoff stage: re-encode a parquet stage into the format
        # the downstream trainer consumes (executor-sharded sinks)
        from ophidia_server_spark.operators import io_ops

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        fmt = str(args.get("format", "tfrecord"))
        df = spark.read.parquet(src)
        shards = int(args.get("shards", 8))
        if fmt == "tfrecord":
            io_ops.oph_exporttfrecord(df, out, shards=shards)
        elif fmt == "webdataset":
            io_ops.oph_exportwebdataset(
                df, out, str(args.get("key_col", "doc_id")), shards=shards
            )
        elif fmt == "avro":
            io_ops.oph_exportavro(
                df, out, shards=shards, codec=str(args.get("codec", "deflate"))
            )
        else:
            raise ValueError(f"unknown export format: {fmt}")
        return out

    def op_pipe_zorder(engine, args, inputs):
        # layout-optimization stage: rewrite the stage's parquet clustered
        # on the Z-order of the named columns, then persist the min/max
        # file manifest next to it for pruned reads
        from ophidia_server_spark import layout as lay

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        cols = args["columns"]
        if isinstance(cols, str):
            cols = [c for c in cols.split("|") if c]
        lay.zorder_write(
            spark.read.parquet(src), out, list(cols),
            files=int(args.get("files", 16)), bits=int(args.get("bits", 16)),
        )
        lay.build_file_index(spark, out, list(cols)).write.mode(
            "overwrite"
        ).parquet(out.rstrip("/") + "_index")
        return out

    def op_pipe_kmeans(engine, args, inputs):
        # full-corpus clustering stage: Lloyd's k-means, assignments written
        # for downstream per-cluster sampling / SemDeDup-style pruning
        from ophidia_server_spark.pipeline import clustering as cl

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        res = cl.kmeans_lloyd(
            spark.read.parquet(src),
            k=int(args.get("k", 8)),
            iters=int(args.get("iters", 10)),
            vec_col=args.get("vec_col", "embedding"),
            id_col=args.get("id_col", "vec_id"),
        )
        res.assignments.write.mode("overwrite").parquet(out)
        return out

    def op_pipe_tokenize(engine, args, inputs):
        # real BPE as a pipeline stage: train merges on the source corpus
        # (or reuse a prior stage's merge table) and write the token table
        import json as _json

        from ophidia_server_spark.pipeline import bpe

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        docs = spark.read.parquet(src)
        if args.get("merges_path"):
            with open(str(args["merges_path"])) as fh:
                merges = [tuple(m) for m in _json.load(fh)]
        else:
            merges = bpe.bpe_train(
                docs, args.get("text_col", "text"),
                num_merges=int(args.get("num_merges", 200)),
            )
        if args.get("save_merges_path"):
            with open(str(args["save_merges_path"]), "w") as fh:
                _json.dump([list(m) for m in merges], fh)
        bpe.bpe_apply(
            docs, merges, args.get("text_col", "text")
        ).write.mode("overwrite").parquet(out)
        return out

    def op_pipe_audit(engine, args, inputs):
        # data-quality gate: run declared contract rules, write the audit
        # table, and FAIL the task if any rule fails (the contract check a
        # pipeline chains between stages)
        from ophidia_server_spark.pipeline.audit import corpus_audit

        src = args.get("src_path") or next(
            v for v in inputs.values() if isinstance(v, str)
        )
        out = str(args["output_path"])
        rules = [(r["name"], r["kind"], r) for r in args["rules"]]
        report = corpus_audit(
            spark.read.parquet(src), rules,
            max_violation_frac=float(args.get("max_violation_frac", 0.0)),
        )
        report.write.mode("overwrite").parquet(out)
        failed = [r.rule for r in report.collect() if not r.passed]
        if failed and str(args.get("on_fail", "abort")) == "abort":
            raise ValueError(f"audit rules failed: {', '.join(failed)}")
        return out

    def op_importarrow(engine, args, inputs):
        cube = IO.oph_importarrow(
            spark, str(args["src_path"]),
            [d for d in str(args.get("explicit_dims", "")).split("|") if d],
            args["implicit_dim"], args["measure"],
            measure=args.get("measure"),
        )
        return store.register(cube, args.get("container", "default"),
                              task="importarrow")

    def op_exportarrow(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        return IO.oph_exportarrow(
            store.get(pid), str(args["output_path"]),
            shards=int(args.get("shards", 8)),
        )

    def op_importnc(engine, args, inputs):
        # src_path may come directly or from file-massive expansion (which
        # also supplies measure under convention=cmip5); subset_dims/
        # subset_filter apply the import-time hyperslab
        paths = str(args["src_path"]).split("|")
        subset = None
        if args.get("subset_dims"):
            dims = str(args["subset_dims"]).split("|")
            filts = str(args.get("subset_filter", "")).split("|")
            subset = dict(zip(dims, filts))
        cube = IO.oph_importnc(
            spark, paths, args["measure"],
            explicit_dims=[d for d in str(args.get("explicit_dims", "")).split("|") if d],
            implicit_dim=args["implicit_dim"],
            subset=subset,
            subset_type=str(args.get("subset_type", "coord")),
        )
        return store.register(cube, args.get("container", "default"), task="importnc")

    def op_exportnc(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        return IO.oph_exportnc(
            store.get(pid), str(args["output_path"]),
            per_dim_files=str(args.get("per_dim_files", "no")).lower() == "yes",
            nc_format=str(args.get("nc_format", "classic")),
            compress=int(args["compress"]) if args.get("compress") else None,
        )

    def op_explorenc(engine, args, inputs):
        return IO.oph_explorenc(spark, str(args["src_path"]), args.get("measure"))

    def op_importzarr(engine, args, inputs):
        subset = None
        if args.get("subset_dims"):
            dims = str(args["subset_dims"]).split("|")
            filts = str(args.get("subset_filter", "")).split("|")
            subset = dict(zip(dims, filts))
        cube = IO.oph_importzarr(
            spark, str(args["src_path"]), args["measure"],
            explicit_dims=[d for d in str(args.get("explicit_dims", "")).split("|") if d],
            implicit_dim=args["implicit_dim"],
            subset=subset,
            subset_type=str(args.get("subset_type", "coord")),
        )
        return store.register(cube, args.get("container", "default"), task="importzarr")

    def op_exportzarr(engine, args, inputs):
        pid = _resolve_cube_arg(args, inputs)
        return IO.oph_exportzarr(
            store.get(pid), str(args["output_path"]),
            compress=int(args["compress"]) if args.get("compress") else None,
            per_dim_chunks=str(args.get("per_dim_chunks", "no")).lower() == "yes",
        )

    return WorkflowEngine(
        {
            "oph_importcsv": op_importcsv,
            "oph_importnc": op_importnc,
            "oph_exportnc": op_exportnc,
            "oph_explorenc": op_explorenc,
            "oph_importzarr": op_importzarr,
            "oph_exportzarr": op_exportzarr,
            "oph_importparquet": op_importparquet,
            "oph_importarrow": op_importarrow,
            "oph_exportarrow": op_exportarrow,
            "oph_randcube": op_randcube,
            "oph_subset": op_subset,
            "oph_reduce": op_reduce,
            "oph_reduce2": op_reduce2,
            "oph_aggregate": op_aggregate,
            "oph_aggregate2": op_aggregate2,
            "oph_intercube": op_intercube,
            "oph_rollup": op_rollup,
            "oph_drilldown": op_drilldown,
            "oph_permute": op_permute,
            "oph_mergecubes": op_mergecubes,
            "oph_apply": op_apply,
            "oph_duplicate": op_duplicate,
            "oph_delete": op_delete,
            "oph_metadata": op_metadata,
            "oph_cubeschema": op_cubeschema,
            "oph_explorecube": op_explorecube,
            "oph_exportcsv": op_exportcsv,
            "oph_publish": op_publish,
            "oph_unpublish": op_unpublish,
            "oph_fs": op_fs,
            "pipeline_dedup_exact": op_pipe_dedup,
            "pipeline_quality_filter": op_pipe_quality_filter,
            "pipeline_redact_pii": op_pipe_redact_pii,
            "pipeline_minhash_pairs": op_pipe_minhash,
            "pipeline_chunk": op_pipe_chunk,
            "pipeline_decontaminate": op_pipe_contamination,
            "pipeline_sample": op_pipe_sample,
            "pipeline_pack": op_pipe_pack,
            "pipeline_shuffle": op_pipe_shuffle,
            "pipeline_quality_model": op_pipe_quality_model,
            "pipeline_semantic_dedup": op_pipe_semantic_dedup,
            "pipeline_audit": op_pipe_audit,
            "pipeline_sketch": op_pipe_sketch,
            "pipeline_repack": op_pipe_repack,
            "pipeline_dedup_index": op_pipe_dedup_index,
            "pipeline_novelty": op_pipe_novelty,
            "pipeline_tokenize": op_pipe_tokenize,
            "pipeline_export": op_pipe_export,
            "pipeline_zorder": op_pipe_zorder,
            "pipeline_kmeans": op_pipe_kmeans,
            "pipeline_select": op_pipe_select,
            "pipeline_interleave": op_pipe_interleave,
            "pipeline_drift": op_pipe_drift,
            "pipeline_snapshot": op_pipe_snapshot,
            "pipeline_classify": op_pipe_classify,
            "pipeline_triplets": op_pipe_triplets,
            "pipeline_features": op_pipe_features,
            "pipeline_vector_index": op_pipe_vector_index,
        },
        catalog=store.as_catalog,  # callable: re-snapshot per massive expansion
        pid_resolver=lambda cid: next(
            pid for pid, e in store.entries.items() if str(e.cube_id) == cid
        ),
    )
