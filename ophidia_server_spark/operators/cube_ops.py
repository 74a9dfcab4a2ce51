"""Core datacube operators (the OLAP surface fronted by the reference server).

Reference operator names and semantics: /root/reference/src/oph_json_objkeys.h
(oph_subset :94, oph_reduce :96-97, oph_aggregate :98-99, oph_drilldown :100,
oph_rollup :101, oph_permute :93, oph_apply :103, oph_intercube :135,
oph_mergecubes :136). Semantics follow the public Ophidia docs: "reduce"
collapses the *implicit* (in-array) dimension, "aggregate" collapses *explicit*
dimensions; rollup/drilldown move a dimension between the two representations.

Everything here is expressed with Spark built-ins (higher-order array functions,
groupBy aggregation, joins) so Catalyst keeps whole-stage codegen and the 100 TB
scale path: per-row array ops are embarrassingly parallel (no shuffle); explicit
aggregation uses partial+final hash agg; intercube joins hash-partition both
sides on the explicit dims (co-partitioned if both cubes came from the same
build_cube shuffle).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ophidia_server_spark.cube import DIM_COL, MEASURE_COL, Cube
from ophidia_server_spark.subset import subset_predicate, time_predicate

# ---------------------------------------------------------------------------
# reduction kernels over the measure array (implicit dimension)
# ---------------------------------------------------------------------------

_D = "CAST(0.0 AS DOUBLE)"


def _arr_sum(col: str = MEASURE_COL) -> Column:
    return F.expr(f"aggregate({col}, {_D}, (a, x) -> a + CAST(x AS DOUBLE))")


def _arr_count(col: str = MEASURE_COL) -> Column:
    return F.size(F.col(col)).cast("long")


def _arr_avg(col: str = MEASURE_COL) -> Column:
    return _arr_sum(col) / F.size(F.col(col))


def _arr_max(col: str = MEASURE_COL) -> Column:
    return F.array_max(F.col(col)).cast("double")


def _arr_min(col: str = MEASURE_COL) -> Column:
    return F.array_min(F.col(col)).cast("double")


def _arr_var(col: str = MEASURE_COL) -> Column:
    # sample variance, matching SQL VAR_SAMP
    n = F.size(F.col(col)).cast("double")
    s = _arr_sum(col)
    s2 = F.expr(f"aggregate({col}, {_D}, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    return (s2 - s * s / n) / (n - 1)


def _arr_std(col: str = MEASURE_COL) -> Column:
    return F.sqrt(_arr_var(col))


REDUCE_OPS: dict[str, Callable[[str], Column]] = {
    "sum": _arr_sum,
    "count": _arr_count,
    "avg": _arr_avg,
    "mean": _arr_avg,
    "max": _arr_max,
    "min": _arr_min,
    "var": _arr_var,
    "std": _arr_std,
}

AGG_FNS: dict[str, Callable[[Column], Column]] = {
    "sum": F.sum,
    "count": F.count,
    "avg": F.avg,
    "mean": F.avg,
    "max": F.max,
    "min": F.min,
    "var": F.var_samp,
    "std": F.stddev_samp,
}


# ---------------------------------------------------------------------------
# oph_subset / oph_subset2
# ---------------------------------------------------------------------------

def oph_subset(
    cube: Cube,
    subset_dims: dict[str, str],
    subset_type: str = "index",
    offset: int = 0,
) -> Cube:
    """Slice the cube (oph_subset/oph_subset2, oph_json_objkeys.h:94-95).

    subset_dims maps dim name -> subset string ("start:stride:end,..."). Explicit
    dims become row filters (pushed to the parquet scan by Catalyst); the
    implicit dim becomes an aligned array filter via `F.filter` over the zipped
    (coordinate, value) pairs — per-row, shuffle-free.

    subset_type="index": clauses address 1-based positions (implicit dim) or the
    dimension's own integer values (explicit dims, per reference cube_filter
    semantics, oph_filters.c:173-243). subset_type="coord": clauses are closed
    coordinate ranges. subset_type="time": clauses are `start_end` date ranges
    with partial-date expansion (time_filter=yes semantics).
    """
    def pred_fn(col, ss):
        if subset_type == "time":
            return time_predicate(col, ss)
        try:
            return subset_predicate(col, ss, offset=offset)
        except ValueError:
            # non-numeric coordinates (string dims): clauses are literal
            # values, OR-combined
            vals = [v for v in str(ss).replace("|", ",").split(",") if v]
            return col.isin(vals)

    df = cube.df
    for dim, ss in subset_dims.items():
        if dim in cube.explicit_dims:
            df = df.filter(pred_fn(F.col(dim), ss))
        elif dim in cube.implicit_dims:
            composite = len(cube.implicit_dims) != 1
            zipped = F.arrays_zip(F.col(DIM_COL).alias("d"), F.col(MEASURE_COL).alias("m"))
            if subset_type == "index":
                if composite:
                    raise NotImplementedError(
                        "index subset on composite implicit dim is ambiguous: "
                        "use coord subsets per named dim, or drilldown first"
                    )
                # positions are 1-based over the packed array
                n = F.size(F.col(DIM_COL))
                idx = F.sequence(F.lit(1), n)
                z3 = F.arrays_zip(idx.alias("i"), F.col(DIM_COL).alias("d"), F.col(MEASURE_COL).alias("m"))
                kept = F.filter(z3, lambda s: subset_predicate(s["i"], ss, offset=offset))
            elif composite:
                # composite implicit dim (post-rollup/mergecubes): coordinates
                # are structs — subset on the named field of each struct
                kept = F.filter(zipped, lambda s: pred_fn(s["d"][dim], ss))
            else:
                kept = F.filter(zipped, lambda s: pred_fn(s["d"], ss))
            df = (
                df.withColumn("__z", kept)
                .withColumn(DIM_COL, F.col("__z.d"))
                .withColumn(MEASURE_COL, F.col("__z.m"))
                .drop("__z")
                .filter(F.size(MEASURE_COL) > 0)
            )
        else:
            raise KeyError(f"unknown dimension {dim!r}")
    return cube.with_df(df)


# ---------------------------------------------------------------------------
# oph_reduce / oph_reduce2
# ---------------------------------------------------------------------------

def oph_reduce(cube: Cube, operation: str, out_name: str | None = None) -> DataFrame:
    """Collapse the implicit dimension (oph_reduce, oph_json_objkeys.h:96).

    Returns a relational DataFrame (explicit dims + reduced scalar) — in Ophidia
    terms the result cube has an empty implicit dim, which is just a plain table.
    Per-row array kernel, zero shuffle.
    """
    out = out_name or f"{operation}_{cube.measure}"
    kernel = REDUCE_OPS[operation.lower()]
    return cube.df.select(*cube.explicit_dims, kernel(MEASURE_COL).alias(out))


def oph_reduce2(
    cube: Cube,
    operation: str,
    concept_level: Column | Callable[[Column], Column],
    out_name: str | None = None,
) -> Cube:
    """Grouped reduction along the implicit dim by a concept level
    (oph_reduce2, oph_json_objkeys.h:97) — e.g. daily -> monthly means.

    concept_level maps an implicit coordinate to its group (e.g. month of a
    day index). Implemented explode -> groupBy(explicit, group) -> re-pack;
    one shuffle, partial agg map-side. For time hierarchies pass
    `lambda d: F.date_trunc('month', d)`-style mappings.
    """
    if len(cube.implicit_dims) != 1:
        raise NotImplementedError("reduce2 on composite implicit dim")
    dim = cube.implicit_dims[0]
    lf = cube.long()
    grp = concept_level(F.col(dim)) if callable(concept_level) else concept_level
    out = out_name or cube.measure
    aggfn = AGG_FNS[operation.lower()]
    cells = lf.groupBy(*cube.explicit_dims, grp.alias("__d")).agg(
        aggfn(F.col(cube.measure)).alias("__v")
    )
    packed = (
        cells.groupBy(*cube.explicit_dims)
        .agg(F.array_sort(F.collect_list(F.struct("__d", "__v"))).alias("__z"))
        .select(
            *cube.explicit_dims,
            F.col("__z.__d").alias(DIM_COL),
            F.col("__z.__v").alias(MEASURE_COL),
        )
    )
    return replace(cube, df=packed, implicit_dims=(dim,), measure=out, level=cube.level + 1)


# ---------------------------------------------------------------------------
# oph_aggregate / oph_aggregate2
# ---------------------------------------------------------------------------

def oph_aggregate(cube: Cube, operation: str, collapse_dims: list[str]) -> Cube:
    """Collapse explicit dimensions (oph_aggregate, oph_json_objkeys.h:98),
    applying `operation` element-wise across rows for each implicit coordinate.

    Implemented as explode -> hash-agg by (kept dims, coordinate) -> re-pack.
    This is the scalable strategy: Catalyst does partial aggregation map-side,
    so the shuffle carries one partial per (kept, coord) per partition, not the
    raw cells. (The alternative — collect_list of whole arrays then zip-reduce —
    ships full arrays through the shuffle and skews on wide groups.)
    """
    kept = [d for d in cube.explicit_dims if d not in collapse_dims]
    if len(cube.implicit_dims) != 1:
        raise NotImplementedError("aggregate on composite implicit dim: permute/drilldown first")
    lf = cube.long()
    dim = cube.implicit_dims[0]
    aggfn = AGG_FNS[operation.lower()]
    cells = lf.groupBy(*kept, F.col(dim).alias("__d")).agg(
        aggfn(F.col(cube.measure)).alias("__v")
    )
    packed = (
        cells.groupBy(*kept)
        .agg(F.array_sort(F.collect_list(F.struct("__d", "__v"))).alias("__z"))
        .select(*kept, F.col("__z.__d").alias(DIM_COL), F.col("__z.__v").alias(MEASURE_COL))
    )
    return Cube(
        df=packed,
        explicit_dims=tuple(kept),
        implicit_dims=cube.implicit_dims,
        measure=cube.measure,
        level=cube.level + 1,
    )


def oph_aggregate2(
    cube: Cube, operation: str, dim: str, concept_level: Callable[[Column], Column],
) -> Cube:
    """oph_aggregate2 (oph_json_objkeys.h:99): collapse an explicit dimension
    to a coarser concept level (e.g. daily rows -> monthly rows), aggregating
    measure cells element-wise within each coarse group."""
    if dim not in cube.explicit_dims:
        raise KeyError(dim)
    kept = [d for d in cube.explicit_dims if d != dim]
    lf = cube.long()
    idim = cube.implicit_dims[0]
    aggfn = AGG_FNS[operation.lower()]
    cells = lf.groupBy(
        *kept, concept_level(F.col(dim)).alias(dim), F.col(idim).alias("__d")
    ).agg(aggfn(F.col(cube.measure)).alias("__v"))
    packed = (
        cells.groupBy(*kept, dim)
        .agg(F.array_sort(F.collect_list(F.struct("__d", "__v"))).alias("__z"))
        .select(*kept, dim, F.col("__z.__d").alias(DIM_COL), F.col("__z.__v").alias(MEASURE_COL))
    )
    return Cube(
        df=packed, explicit_dims=(*kept, dim), implicit_dims=cube.implicit_dims,
        measure=cube.measure, level=cube.level + 1,
    )


# ---------------------------------------------------------------------------
# oph_drilldown / oph_rollup / oph_permute
# ---------------------------------------------------------------------------

def oph_drilldown(cube: Cube, n: int = 1) -> DataFrame:
    """Implicit -> explicit (oph_drilldown, oph_json_objkeys.h:100): explode the
    packed array into rows. Returns the long form (all implicit dims exploded)."""
    return cube.long()


def oph_rollup(cube: Cube, dim: str) -> Cube:
    """Explicit -> implicit (oph_rollup, oph_json_objkeys.h:101): pack explicit
    dimension `dim` into the array. The new `__dim` is an array of structs
    (rolled dim outermost, previous implicit dims after), sorted by coordinate.

    One shuffle (groupBy remaining dims); arrays grow by |dim| factor — callers
    should keep total array size bounded (see cube.py scale notes).
    """
    if dim not in cube.explicit_dims:
        raise KeyError(dim)
    kept = [d for d in cube.explicit_dims if d != dim]
    lf = cube.long()
    new_implicit = (dim, *cube.implicit_dims)
    key = F.struct(*[F.col(d) for d in new_implicit])
    cells = lf.groupBy(*kept).agg(
        F.array_sort(F.collect_list(F.struct(key.alias("d"), F.col(cube.measure).alias("m")))).alias("__z")
    )
    packed = cells.select(
        *kept, F.col("__z.d").alias(DIM_COL), F.col("__z.m").alias(MEASURE_COL)
    )
    return Cube(
        df=packed,
        explicit_dims=tuple(kept),
        implicit_dims=new_implicit,
        measure=cube.measure,
        level=cube.level + 1,
    )


def oph_permute(cube: Cube, order: list[str]) -> Cube:
    """Reorder implicit dimensions inside the array (oph_permute,
    oph_json_objkeys.h:93). Re-sorts each row's array by the permuted coordinate
    key — per-row array_sort over re-built structs, shuffle-free."""
    if sorted(order) != sorted(cube.implicit_dims):
        raise ValueError(f"order {order} must permute {cube.implicit_dims}")
    if len(cube.implicit_dims) == 1:
        return cube
    zipped = F.arrays_zip(F.col(DIM_COL).alias("d"), F.col(MEASURE_COL).alias("m"))
    rekeyed = F.transform(
        zipped,
        lambda s: F.struct(
            F.struct(*[s["d"][n].alias(n) for n in order]).alias("d"), s["m"].alias("m")
        ),
    )
    srt = F.array_sort(rekeyed)
    df = (
        cube.df.withColumn("__z", srt)
        .withColumn(DIM_COL, F.col("__z.d"))
        .withColumn(MEASURE_COL, F.col("__z.m"))
        .drop("__z")
    )
    return replace(cube, df=df, implicit_dims=tuple(order), level=cube.level + 1)


# ---------------------------------------------------------------------------
# oph_intercube / oph_mergecubes
# ---------------------------------------------------------------------------

_BINOPS: dict[str, Callable[[Column, Column], Column]] = {
    # mul keeps natural types: DECIMAL x DECIMAL multiplies exactly (then a
    # decimal ROUND is engine-portable), while ROUND(double, 2) at ~1e14
    # magnitude is implementation-defined noise past double precision.
    # The rest compute in double (div of decimals would otherwise pick an
    # engine-specific quotient scale).
    "sum": lambda a, b: a.cast("double") + b.cast("double"),
    "sub": lambda a, b: a.cast("double") - b.cast("double"),
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a.cast("double") / b.cast("double"),
    "abs": lambda a, b: F.abs(a.cast("double") - b.cast("double")),
    "max": lambda a, b: F.greatest(a.cast("double"), b.cast("double")),
    "min": lambda a, b: F.least(a.cast("double"), b.cast("double")),
}


def oph_intercube(a: Cube, b: Cube, operation: str, measure: str = "measure") -> Cube:
    """Element-wise binary op between two cubes (oph_intercube,
    oph_json_objkeys.h:135). Equi-join on the shared explicit dims, then
    `zip_with` over the aligned measure arrays — the join is the only shuffle,
    and it is co-partitioned when both cubes were built with the same keys.

    Requires positionally-aligned implicit dims (both cubes pack sorted
    coordinates, so same coordinate coverage => aligned). Rows/cells present in
    only one cube are dropped (inner-join semantics, matching the reference's
    same-structure requirement).
    """
    if a.explicit_dims != b.explicit_dims:
        raise ValueError("intercube requires identical explicit dims")
    op = _BINOPS[operation.lower()]
    bt = b.df.select(
        *b.explicit_dims,
        F.col(DIM_COL).alias("__dim_b"),
        F.col(MEASURE_COL).alias("__m_b"),
    )
    j = a.df.join(bt, on=list(a.explicit_dims), how="inner")
    out = j.select(
        *a.explicit_dims,
        F.col(DIM_COL),
        F.zip_with(F.col(MEASURE_COL), F.col("__m_b"), lambda x, y: op(x, y)).alias(
            MEASURE_COL
        ),
    )
    return Cube(
        df=out,
        explicit_dims=a.explicit_dims,
        implicit_dims=a.implicit_dims,
        measure=measure,
        level=max(a.level, b.level) + 1,
    )


def oph_mergecubes(a: Cube, b: Cube, source_dim: str = "src") -> Cube:
    """Append cubes' implicit arrays (oph_mergecubes, oph_json_objkeys.h:136):
    same explicit dims, arrays concatenated. The merged implicit coordinate is
    tagged with the source index (0 = first cube) to keep coordinates unique —
    the reference likewise extends the implicit dimension's index space."""
    if a.explicit_dims != b.explicit_dims:
        raise ValueError("mergecubes requires identical explicit dims")
    if len(a.implicit_dims) != 1 or len(b.implicit_dims) != 1:
        raise NotImplementedError("mergecubes on composite implicit dims")

    inner = a.implicit_dims[0]

    def tag(dim_col: Column, idx: int) -> Column:
        return F.transform(dim_col, lambda d: F.struct(F.lit(idx).alias(source_dim), d.alias(inner)))

    bt = b.df.select(
        *b.explicit_dims,
        F.col(DIM_COL).alias("__dim_b"),
        F.col(MEASURE_COL).alias("__m_b"),
    )
    j = a.df.join(bt, on=list(a.explicit_dims), how="inner")
    out = j.select(
        *a.explicit_dims,
        F.concat(tag(F.col(DIM_COL), 0), tag(F.col("__dim_b"), 1)).alias(DIM_COL),
        F.concat(
            F.transform(MEASURE_COL, lambda x: x.cast("double")),
            F.transform("__m_b", lambda x: x.cast("double")),
        ).alias(MEASURE_COL),
    )
    return Cube(
        df=out,
        explicit_dims=a.explicit_dims,
        implicit_dims=(source_dim, a.implicit_dims[0]),
        measure=a.measure,
        level=max(a.level, b.level) + 1,
    )


def oph_intercube_corr(a: Cube, b: Cube, out: str = "corr") -> DataFrame:
    """oph_intercube operation=corr: Pearson correlation of the two cubes'
    measure arrays per explicit-dim row. One broadcast-able join + per-row
    array folds; returns a relational DataFrame (explicit dims + corr)."""
    if a.explicit_dims != b.explicit_dims:
        raise ValueError("intercube requires identical explicit dims")
    bt = b.df.select(
        *b.explicit_dims,
        F.col(MEASURE_COL).alias("__m_b"),
    )
    j = a.df.join(bt, on=list(a.explicit_dims), how="inner")

    def fold(expr: Column) -> Column:
        return F.aggregate(expr, F.lit(0.0), lambda acc, v: acc + v)

    x = F.transform(F.col(MEASURE_COL), lambda v: v.cast("double"))
    y = F.transform(F.col("__m_b"), lambda v: v.cast("double"))
    staged = j.select(
        *a.explicit_dims,
        F.size(MEASURE_COL).cast("double").alias("__n"),
        fold(x).alias("__sx"),
        fold(y).alias("__sy"),
        fold(F.zip_with(x, y, lambda u, v: u * v)).alias("__sxy"),
        fold(F.transform(x, lambda u: u * u)).alias("__sxx"),
        fold(F.transform(y, lambda v: v * v)).alias("__syy"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    num = n * F.col("__sxy") - sx * sy
    den = F.sqrt((n * F.col("__sxx") - sx * sx) * (n * F.col("__syy") - sy * sy))
    return staged.select(*a.explicit_dims, (num / den).alias(out))


# ---------------------------------------------------------------------------
# oph_apply — array primitive application
# ---------------------------------------------------------------------------

def oph_apply(cube: Cube, primitive: Callable[[Column], Column], measure: str | None = None) -> Cube:
    """Apply an array primitive to each row's measure array (oph_apply,
    oph_json_objkeys.h:103). `primitive` is a Column->Column function from
    ophidia_server_spark.functions.primitives taking the array column and
    returning the transformed array — native higher-order expressions stay
    JVM-side; numpy-backed kernels (fft...) use Pandas UDFs internally.
    """
    df = cube.df.withColumn(MEASURE_COL, primitive(F.col(MEASURE_COL)))
    return replace(cube, df=df, measure=measure or cube.measure, level=cube.level + 1)


# ---------------------------------------------------------------------------
# oph_showgrid / oph_inspectfrag (introspection,
# oph_json_objkeys.h:128-131 showgrid, :60-61 inspectfrag)
# ---------------------------------------------------------------------------

def oph_showgrid(cube: Cube) -> DataFrame:
    """Dimension grid of a cube: one (dim, value) row per distinct coordinate
    of every dimension, explicit and implicit (the reference lists the stored
    dim grids of a container; our grid is derived live from the cube).

    Scale: per-dim distinct is a partial-agg shuffle of the dim column only —
    column pruning means the parquet scan reads one column per branch.
    """
    parts = []
    for d in cube.explicit_dims:
        parts.append(
            cube.df.select(F.lit(d).alias("dim"), F.col(d).cast("string").alias("value")).distinct()
        )
    lf = cube.long()
    for d in cube.implicit_dims:
        parts.append(
            lf.select(F.lit(d).alias("dim"), F.col(d).cast("string").alias("value")).distinct()
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def oph_inspectfrag(
    cube: Cube, frag_id: int = 0, nfrag: int = 4, max_rows: int = 100_000
) -> DataFrame:
    """Dump one logical fragment of a cube (oph_inspectfrag): fragments are
    defined deterministically as row_number over the explicit-dim order modulo
    nfrag, mirroring the reference's hostxdatacube x fragmentxdb row split
    (oph_ophidiadb_query.h:48) with an engine-portable rule.

    Inspection is a debugging peek at one fragment; the single-partition
    row_number window is acceptable ONLY because the input is capped at
    max_rows first (a limit pushes into the scan), so a 100x-scale cube can
    never be accidentally funneled through one task. Physical Spark
    partitions remain the real fragmentation (spark_partition_id) and are
    reported by store.cubeschema.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(d) for d in cube.explicit_dims])
    capped = cube.df.limit(max_rows)
    tagged = capped.withColumn("__frag", (F.row_number().over(w) - 1) % nfrag)
    return tagged.filter(F.col("__frag") == frag_id).drop("__frag")


def oph_mergecubes_n(cubes: list[Cube], source_dim: str = "src") -> Cube:
    """n-ary oph_mergecubes (the reference's `cubes` argument takes a list,
    oph_workflow_structs.h:29-35): one multi-way equi-join on the shared
    explicit dims, arrays concatenated in argument order with the source index
    tagged into the implicit coordinate. A single shuffle per input (all joins
    on the same key are planned into one exchange per side by Catalyst) — no
    pairwise re-merging of already-merged arrays."""
    if len(cubes) < 2:
        raise ValueError("mergecubes needs at least 2 cubes")
    dims = cubes[0].explicit_dims
    for c in cubes[1:]:
        if c.explicit_dims != dims:
            raise ValueError("mergecubes requires identical explicit dims")
        if len(c.implicit_dims) != 1:
            raise NotImplementedError("mergecubes on composite implicit dims")
    inner = cubes[0].implicit_dims[0]

    j = cubes[0].df.select(
        *dims, F.col(DIM_COL).alias("__d0"), F.col(MEASURE_COL).alias("__v0")
    )
    for i, c in enumerate(cubes[1:], 1):
        j = j.join(
            c.df.select(
                *dims, F.col(DIM_COL).alias(f"__d{i}"), F.col(MEASURE_COL).alias(f"__v{i}")
            ),
            on=list(dims),
            how="inner",
        )

    def tag(i: int) -> Column:
        return F.transform(
            F.col(f"__d{i}"),
            lambda d: F.struct(F.lit(i).alias(source_dim), d.alias(inner)),
        )

    out = j.select(
        *dims,
        F.concat(*[tag(i) for i in range(len(cubes))]).alias(DIM_COL),
        F.concat(
            *[
                F.transform(f"__v{i}", lambda x: x.cast("double"))
                for i in range(len(cubes))
            ]
        ).alias(MEASURE_COL),
    )
    return Cube(
        df=out,
        explicit_dims=dims,
        implicit_dims=(source_dim, inner),
        measure=cubes[0].measure,
        level=max(c.level for c in cubes) + 1,
    )
