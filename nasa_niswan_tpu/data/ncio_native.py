"""ctypes binding for the native netCDF3 reader (native/nc3read.cpp).

The scipy backend re-parses headers and byte-swaps through numpy on every
day-file open; the native reader mmaps the file, parses the classic
header in C++, and swap-copies each variable directly into numpy buffers
— measured ~5-10x faster per day-file on the fixture schema
(scripts/bench_ncread.py), which is the host-side floor of the lazy
real-data loaders (reference dataset.py:125-298's per-day reads).

The shared library is built lazily with g++ on first use (cached next to
the source); when the toolchain or build is unavailable every entry
point reports ``available() == False`` and data/ncio falls back to
scipy — behavior, not just API, is identical (byte-parity tested in
tests/test_ncio_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NC_DTYPES = {
    1: np.dtype(np.int8),
    2: np.dtype("S1"),
    3: np.dtype(np.int16),
    4: np.dtype(np.int32),
    5: np.dtype(np.float32),
    6: np.dtype(np.float64),
    # CDF-5 (64-bit data) additions
    7: np.dtype(np.uint8),
    8: np.dtype(np.uint16),
    9: np.dtype(np.uint32),
    10: np.dtype(np.int64),
    11: np.dtype(np.uint64),
}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _build_and_load() -> Optional[ctypes.CDLL]:
    d = _native_dir()
    src = os.path.join(d, "nc3read.cpp")
    so = os.path.join(d, "libnc3read.so")
    if not os.path.exists(src):
        return None
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared",
                 src, "-o", so + ".tmp"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(so + ".tmp", so)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.nc3_open.restype = ctypes.c_void_p
    lib.nc3_open.argtypes = [ctypes.c_char_p]
    lib.nc3_close.argtypes = [ctypes.c_void_p]
    lib.nc3_num_vars.restype = ctypes.c_int
    lib.nc3_num_vars.argtypes = [ctypes.c_void_p]
    lib.nc3_var_name.restype = ctypes.c_char_p
    lib.nc3_var_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.nc3_var_info.restype = ctypes.c_int
    lib.nc3_var_info.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int),
    ]
    lib.nc3_var_dim_name.restype = ctypes.c_char_p
    lib.nc3_var_dim_name.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
    ]
    lib.nc3_var_attr_text.restype = ctypes.c_long
    lib.nc3_var_attr_text.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_long,
    ]
    lib.nc3_read.restype = ctypes.c_int
    lib.nc3_read.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_void_p,
    ]
    lib.nc3_read_levels.restype = ctypes.c_int
    lib.nc3_read_levels.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            _lib = _build_and_load()
    return _lib


def available() -> bool:
    return _get_lib() is not None


def open_nc_native(path: str):
    """Parse a netCDF3 classic file with the native reader; returns the
    same NcFile contract as ncio._open_scipy (all variables materialized
    little-endian, decoded no-leap time axis) or None when the native
    path is unavailable or the file is not parseable."""
    lib = _get_lib()
    if lib is None:
        return None
    from nasa_niswan_tpu.data.ncio import NcFile, decode_noleap_times

    h = lib.nc3_open(path.encode())
    if not h:
        return None
    try:
        variables, dims = {}, {}
        shape = (ctypes.c_uint64 * 8)()
        ndim, typ = ctypes.c_int(), ctypes.c_int()
        file_size = os.path.getsize(path)
        for i in range(lib.nc3_num_vars(h)):
            raw_name = lib.nc3_var_name(h, i)
            if raw_name is None:
                return None
            name = raw_name.decode(errors="replace")
            if lib.nc3_var_info(h, name.encode(), ctypes.byref(ndim), shape,
                                ctypes.byref(typ)):
                return None
            if not 0 <= ndim.value <= 8 or typ.value not in _NC_DTYPES:
                return None  # corrupt header
            shp = tuple(int(shape[k]) for k in range(ndim.value))
            dt = _NC_DTYPES[typ.value]
            # a corrupt header can claim shapes far larger than the file;
            # refuse before np.empty tries to allocate them
            nbytes = dt.itemsize
            for s in shp:
                nbytes *= s
            if nbytes > file_size:
                return None
            arr = np.empty(shp, dt)
            lead = shp[0] if shp else 1
            rc = lib.nc3_read(
                h, name.encode(), 0, lead,
                arr.ctypes.data_as(ctypes.c_void_p),
            )
            if rc:
                return None
            variables[name] = arr
            dim_names = [
                lib.nc3_var_dim_name(h, name.encode(), k)
                for k in range(ndim.value)
            ]
            if any(d is None for d in dim_names):
                return None
            dims[name] = tuple(d.decode(errors="replace") for d in dim_names)
        time = None
        if "time" in variables:
            buf = ctypes.create_string_buffer(256)

            def attr(a, default):
                n = lib.nc3_var_attr_text(h, b"time", a, buf, 256)
                return buf.raw[:n].decode() if n >= 0 else default

            try:
                time = decode_noleap_times(
                    variables["time"],
                    attr(b"units", "days since 1950-01-01"),
                    attr(b"calendar", "noleap"),
                )
            except Exception:  # corrupt units/values: keep data, drop time
                time = None
        return NcFile(variables, dims, time)
    finally:
        lib.nc3_close(h)


def read_vars(path: str, names, *, levels: Optional[int] = None) -> Optional[dict]:
    """Open once and fully read ONLY the named variables (plus the
    decoded time axis under key "time" when present) — the targeted-read
    primitive behind read_day_fields: a taijlh1 day-file holds all three
    species' concentrations, a surface-model day needs one.

    ``levels=k`` keeps only the first k entries of any variable whose
    second dimension is named "level" (the (time, level, lat, lon)
    families), copying just those bytes — a surface (k=1) read of a
    20-level field touches 1/20th of the data."""
    lib = _get_lib()
    if lib is None:
        return None
    from nasa_niswan_tpu.data.ncio import decode_noleap_times

    h = lib.nc3_open(path.encode())
    if not h:
        return None
    try:
        out = {}
        shape = (ctypes.c_uint64 * 8)()
        ndim, typ = ctypes.c_int(), ctypes.c_int()

        file_size = os.path.getsize(path)

        def read_full(name):
            if lib.nc3_var_info(h, name.encode(), ctypes.byref(ndim), shape,
                                ctypes.byref(typ)):
                return None
            if not 0 <= ndim.value <= 8 or typ.value not in _NC_DTYPES:
                return None  # corrupt header
            shp = tuple(int(shape[k]) for k in range(ndim.value))
            nbytes = _NC_DTYPES[typ.value].itemsize
            for s in shp:
                nbytes *= s
            if nbytes > file_size:
                return None  # claims more data than the file holds
            if (
                levels is not None and len(shp) >= 2
                and (lib.nc3_var_dim_name(h, name.encode(), 1) or b"").decode()
                == "level"
            ):
                k = min(levels, shp[1])
                arr = np.empty((shp[0], k) + shp[2:], _NC_DTYPES[typ.value])
                if lib.nc3_read_levels(
                    h, name.encode(), 0, shp[0], 0, k,
                    arr.ctypes.data_as(ctypes.c_void_p),
                ):
                    return None
                return arr
            arr = np.empty(shp, _NC_DTYPES[typ.value])
            if lib.nc3_read(h, name.encode(), 0, shp[0] if shp else 1,
                            arr.ctypes.data_as(ctypes.c_void_p)):
                return None
            return arr

        for n in names:
            arr = read_full(n)
            if arr is None:
                return None
            out[n] = arr
        tvals = read_full("time")
        if tvals is not None:
            buf = ctypes.create_string_buffer(256)

            def attr(a, default):
                k = lib.nc3_var_attr_text(h, b"time", a, buf, 256)
                return buf.raw[:k].decode() if k >= 0 else default

            try:
                out["time"] = decode_noleap_times(
                    tvals,
                    attr(b"units", "days since 1950-01-01"),
                    attr(b"calendar", "noleap"),
                )
            except Exception:  # corrupt units/values: keep data, drop time
                out["time"] = None
        return out
    finally:
        lib.nc3_close(h)


def read_var_slice(
    path: str, name: str, start: int, count: int
) -> Optional[np.ndarray]:
    """Read only records [start, start+count) of one variable — the
    partial-read primitive the full-materialization backends can't offer
    (a day-cache refresh needs one species variable, not the whole file)."""
    lib = _get_lib()
    if lib is None:
        return None
    h = lib.nc3_open(path.encode())
    if not h:
        return None
    try:
        shape = (ctypes.c_uint64 * 8)()
        ndim, typ = ctypes.c_int(), ctypes.c_int()
        if lib.nc3_var_info(h, name.encode(), ctypes.byref(ndim), shape,
                            ctypes.byref(typ)):
            return None
        if not 1 <= ndim.value <= 8 or typ.value not in _NC_DTYPES:
            return None  # corrupt header
        shp = (count,) + tuple(int(shape[k]) for k in range(1, ndim.value))
        nbytes = _NC_DTYPES[typ.value].itemsize
        for s in shp:
            nbytes *= s
        if nbytes > os.path.getsize(path):
            return None
        arr = np.empty(shp, _NC_DTYPES[typ.value])
        if lib.nc3_read(h, name.encode(), start, count,
                        arr.ctypes.data_as(ctypes.c_void_p)):
            return None
        return arr
    finally:
        lib.nc3_close(h)
