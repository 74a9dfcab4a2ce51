"""Property-based roundtrip checks for the pure-Python file codecs: any
dataset of random dims/dtypes/values must survive write -> read bit-exactly
through netCDF-4 (HDF5) and Zarr v2, in every layout (contiguous, chunked,
deflate). No Spark involved — these guard the byte-level encoders that the
mapInPandas import tasks run executor-side."""

from __future__ import annotations

import tempfile

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ophidia_server_spark.sources import hdf5, zarr as zr
from ophidia_server_spark.sources.netcdf3 import Dataset, Variable

_DTYPES = ["i1", "i2", "i4", "i8", "u1", "f4", "f8"]

dim_st = st.lists(st.integers(1, 7), min_size=1, max_size=3)


@st.composite
def dataset_st(draw):
    sizes = draw(dim_st)
    dims = {f"d{i}": s for i, s in enumerate(sizes)}
    ds = Dataset()
    ds.dimensions = dict(dims)
    n_vars = draw(st.integers(1, 3))
    for vi in range(n_vars):
        # each variable uses a prefix of the dims (mixed ranks in one file)
        rank = draw(st.integers(1, len(sizes)))
        shape = sizes[:rank]
        dt = np.dtype(draw(st.sampled_from(_DTYPES)))
        count = int(np.prod(shape))
        if dt.kind == "f":
            vals = draw(
                st.lists(
                    st.floats(-1e6, 1e6, allow_nan=False, width=32),
                    min_size=count, max_size=count,
                )
            )
            arr = np.asarray(vals, dt).reshape(shape)
        else:
            info = np.iinfo(dt)
            vals = draw(
                st.lists(
                    st.integers(int(info.min), int(info.max)),
                    min_size=count, max_size=count,
                )
            )
            arr = np.asarray(vals, dt).reshape(shape)
        ds.variables[f"v{vi}"] = Variable(
            f"v{vi}", tuple(f"d{i}" for i in range(rank)), {"idx": vi}, arr
        )
    return ds


def _assert_equal(back: Dataset, ds: Dataset):
    for name, v in ds.variables.items():
        got = back.variables[name]
        assert got.data.dtype.kind == v.data.dtype.kind
        assert got.data.shape == v.data.shape
        assert np.array_equal(got.data, v.data), name
        assert got.dimensions == v.dimensions


@settings(max_examples=25, deadline=None)
@given(dataset_st(), st.sampled_from([None, 1, 6, "zstd"]), st.integers(1, 5))
def test_hdf5_roundtrip_properties(ds, compress, chunk_rows):
    p = tempfile.mktemp(suffix=".nc")
    hdf5.write(p, ds, compress=compress, chunk_rows=chunk_rows)
    _assert_equal(hdf5.read(p), ds)


@settings(max_examples=25, deadline=None)
@given(dataset_st(), st.sampled_from([None, 1, 6, "zstd", "blosc-lz4"]), st.integers(1, 5))
def test_zarr_roundtrip_properties(ds, compress, chunk_rows):
    store = tempfile.mkdtemp() + "/store"
    chunks = {
        n: tuple([min(chunk_rows, v.data.shape[0])] + list(v.data.shape[1:]))
        for n, v in ds.variables.items()
    }
    zr.write(store, ds, chunks=chunks, compress=compress)
    _assert_equal(zr.read(store), ds)


@settings(max_examples=10, deadline=None)
@given(dataset_st())
def test_hdf5_zarr_cross_format(ds):
    # the same Dataset through both containers must agree with itself
    p = tempfile.mktemp(suffix=".nc")
    store = tempfile.mkdtemp() + "/store"
    hdf5.write(p, ds, compress=2, chunk_rows=3)
    zr.write(store, ds, compress=2)
    h, z = hdf5.read(p), zr.read(store)
    for name in ds.variables:
        assert np.array_equal(h.variables[name].data, z.variables[name].data)


@settings(max_examples=25, deadline=None)
@given(dataset_st(), st.sampled_from([None, 1, "zstd", "blosc-lz4"]), st.integers(1, 5))
def test_zarr_v3_roundtrip_properties(ds, compress, chunk_rows):
    # same invariant through the Zarr v3 layout (zarr.json nodes, c/-prefixed
    # chunk keys, bytes+compressor codec chains)
    store = tempfile.mkdtemp() + "/store3"
    chunks = {
        n: tuple([min(chunk_rows, v.data.shape[0])] + list(v.data.shape[1:]))
        for n, v in ds.variables.items()
    }
    zr.write(store, ds, chunks=chunks, compress=compress, zarr_format=3)
    _assert_equal(zr.read(store), ds)
