"""Native (C++) netCDF3 reader vs the scipy backend: byte parity on
every fixture family, record (unlimited) dims, CDF-2 offsets, partial
record reads, and the graceful-fallback contract."""

import numpy as np
import pytest

from nasa_niswan_tpu.data import ncio
from nasa_niswan_tpu.data.ncfixture import write_fixture_tree
from nasa_niswan_tpu.data.ncio import open_nc
from nasa_niswan_tpu.data.ncio_native import (
    available,
    open_nc_native,
    read_var_slice,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native reader not built (no g++)"
)


def _assert_same(native, scipy_f):
    assert sorted(native.variables) == sorted(scipy_f.variables)
    for n in scipy_f.variables:
        np.testing.assert_array_equal(native[n], scipy_f[n])
        assert native[n].dtype == scipy_f[n].dtype
        assert native.dims[n] == scipy_f.dims[n]
    if scipy_f.time is None:
        assert native.time is None
    else:
        assert list(native.time) == list(scipy_f.time)


def test_fixture_tree_byte_parity(tmp_path):
    root = str(tmp_path / "t")
    write_fixture_tree(root, days=1, steps_per_day=4, H=6, W=8, levels=2)
    import glob

    paths = sorted(glob.glob(root + "/*.nc"))
    assert len(paths) == 5
    for p in paths:
        _assert_same(open_nc_native(p), ncio._open_scipy(p))


def test_open_nc_prefers_native_and_env_optout(tmp_path, monkeypatch):
    root = str(tmp_path / "t")
    write_fixture_tree(root, days=1, steps_per_day=2, H=4, W=5, levels=1)
    import glob

    p = sorted(glob.glob(root + "/*.nc"))[0]
    a = open_nc(p)
    monkeypatch.setenv("NISWAN_NO_NATIVE_NC", "1")
    b = open_nc(p)
    _assert_same(a, b)


def test_record_dimension_and_cdf2(tmp_path):
    """Real ModelE trees use an UNLIMITED time dim (record-interleaved
    layout) — the layout scipy's writer never produces for the fixtures —
    and large files use 64-bit (CDF-2) offsets."""
    from scipy.io import netcdf_file

    for version, name in ((1, "rec1.nc"), (2, "rec2.nc")):
        p = str(tmp_path / name)
        f = netcdf_file(p, "w", version=version)
        f.createDimension("time", None)  # unlimited -> record vars
        f.createDimension("lat", 3)
        f.createDimension("lon", 4)
        v = f.createVariable("conc", "f", ("time", "lat", "lon"))
        w = f.createVariable("emis", "d", ("time", "lat", "lon"))
        t = f.createVariable("time", "d", ("time",))
        t.units = b"hours since 1950-01-01"
        t.calendar = b"noleap"
        rng = np.random.default_rng(version)
        conc = rng.standard_normal((5, 3, 4)).astype(np.float32)
        emis = rng.standard_normal((5, 3, 4))
        for r in range(5):
            v[r] = conc[r]
            w[r] = emis[r]
            t[r] = r * 6.0
        f.close()

        nat, sp = open_nc_native(p), ncio._open_scipy(p)
        _assert_same(nat, sp)
        np.testing.assert_array_equal(nat["conc"], conc)
        np.testing.assert_array_equal(nat["emis"], emis)
        assert nat.time[2].hour == 12


def test_single_record_var_no_padding(tmp_path):
    """Format special case: with exactly ONE record variable the record
    stride is NOT padded to 4 bytes (e.g. an int16 field)."""
    from scipy.io import netcdf_file

    p = str(tmp_path / "one.nc")
    f = netcdf_file(p, "w")
    f.createDimension("time", None)
    f.createDimension("x", 3)
    v = f.createVariable("a", "h", ("time", "x"))  # 6 bytes/record
    for r in range(4):
        v[r] = np.arange(3 * r, 3 * r + 3, dtype=np.int16)
    f.close()
    nat = open_nc_native(p)
    np.testing.assert_array_equal(
        nat["a"], np.arange(12, dtype=np.int16).reshape(4, 3)
    )


def test_partial_record_read(tmp_path):
    root = str(tmp_path / "t")
    write_fixture_tree(root, days=2, steps_per_day=4, H=5, W=6, levels=2)
    import glob

    p = sorted(glob.glob(root + "/*.taijlh1E33oma_ai.nc"))[0]
    full = ncio._open_scipy(p)["BCB"]
    part = read_var_slice(p, "BCB", 1, 2)
    np.testing.assert_array_equal(part, full[1:3])


def test_non_nc3_returns_none(tmp_path):
    p = str(tmp_path / "x.nc")
    with open(p, "wb") as fh:
        fh.write(b"\x89HDF\r\n\x1a\nrest")
    assert open_nc_native(p) is None
    assert read_var_slice(p, "a", 0, 1) is None


def test_read_vars_targeted_and_level_slice(tmp_path):
    """read_vars returns only the requested variables (+ decoded time),
    and levels=k byte-slices level-dimensioned variables to their first
    k levels — parity against the full scipy read."""
    from nasa_niswan_tpu.data.ncio_native import read_vars

    root = str(tmp_path / "t")
    write_fixture_tree(root, days=1, steps_per_day=4, H=5, W=6, levels=3)
    import glob

    vel = sorted(glob.glob(root + "/*.aijlh1E33oma_ai.nc"))[0]
    sp = ncio._open_scipy(vel)

    d = read_vars(vel, ["u", "omega"], levels=2)
    assert sorted(k for k in d if k != "time") == ["omega", "u"]
    np.testing.assert_array_equal(d["u"], sp["u"][:, :2])
    np.testing.assert_array_equal(d["omega"], sp["omega"][:, :2])
    assert list(d["time"]) == list(sp.time)

    # levels=None reads everything; non-level vars are untouched by levels
    pre = sorted(glob.glob(root + "/*.cijh1E33oma_ai.nc"))[0]
    spp = ncio._open_scipy(pre)
    dp = read_vars(pre, ["prec"], levels=1)
    np.testing.assert_array_equal(dp["prec"], spp["prec"])

    # missing variable -> None (caller falls back to the full open)
    assert read_vars(vel, ["nope"]) is None


def test_read_vars_level_slice_record_layout(tmp_path):
    """Level slicing must honor the record stride when time is UNLIMITED
    (record-interleaved layout, the real ModelE case)."""
    from scipy.io import netcdf_file

    from nasa_niswan_tpu.data.ncio_native import read_vars

    p = str(tmp_path / "rec.nc")
    f = netcdf_file(p, "w")
    f.createDimension("time", None)
    f.createDimension("level", 4)
    f.createDimension("lat", 3)
    f.createDimension("lon", 5)
    v = f.createVariable("u", "f", ("time", "level", "lat", "lon"))
    w = f.createVariable("v", "f", ("time", "level", "lat", "lon"))
    rng = np.random.default_rng(7)
    u = rng.standard_normal((6, 4, 3, 5)).astype(np.float32)
    vv = rng.standard_normal((6, 4, 3, 5)).astype(np.float32)
    for r in range(6):
        v[r] = u[r]
        w[r] = vv[r]
    f.close()

    d = read_vars(p, ["u", "v"], levels=2)
    np.testing.assert_array_equal(d["u"], u[:, :2])
    np.testing.assert_array_equal(d["v"], vv[:, :2])


def test_read_day_fields_native_scipy_parity(tmp_path, monkeypatch):
    """The ingestion unit itself: read_day_fields through the native
    targeted-read path must equal the scipy full-open path, surface and
    multi-level."""
    from nasa_niswan_tpu.data.netcdf import load_time_index, read_day_fields

    root = str(tmp_path / "t")
    write_fixture_tree(root, days=1, steps_per_day=4, H=5, W=6, levels=3)
    date = load_time_index(root)[0].strftime("%Y%m%d")

    for levels in (None, 2):
        nat = read_day_fields(root, date, "bcb", levels=levels)
        monkeypatch.setenv("NISWAN_NO_NATIVE_NC", "1")
        ref = read_day_fields(root, date, "bcb", levels=levels)
        monkeypatch.delenv("NISWAN_NO_NATIVE_NC")
        assert sorted(nat) == sorted(ref)
        for k in ref:
            if k == "time":
                assert list(nat[k]) == list(ref[k])
            else:
                np.testing.assert_array_equal(nat[k], ref[k])


def test_cdf5_single_record_var_unpadded(tmp_path):
    """CDF-5 keeps the classic special case: a sole record variable of a
    sub-4-byte type is laid out with an UNPADDED record stride (6 bytes
    per int16 (4,3) record, not 8)."""
    from nasa_niswan_tpu.data.ncio import _write_cdf5, write_nc

    # two record vars (time + a): padded stride
    p = str(tmp_path / "one5.nc")
    a = np.arange(12, dtype=np.int16).reshape(4, 3)  # 6 bytes/record
    write_nc(p, {"x": 3}, {"a": (("time", "x"), a)},
             time_values=np.arange(4) * 6.0, fmt="cdf5")
    nat = open_nc_native(p)
    np.testing.assert_array_equal(nat["a"], a)

    # a truly SOLE record var (record dim without a time coordinate):
    # both the writer's and the reader's nrecvars==1 unpadded branches
    q = str(tmp_path / "only.nc")
    _write_cdf5(q, {"x": 3, "t": 4}, {"a": (("t", "x"), a)},
                time_values=None, time_units="", calendar="",
                record_dim="t")
    nat2 = open_nc_native(q)
    np.testing.assert_array_equal(nat2["a"], a)
    # the stride must really be 6 (unpadded), not 8: the last two records
    # sit back-to-back at EOF with no pad bytes between or after them
    with open(q, "rb") as fh:
        raw = fh.read()
    assert raw[:4] == b"CDF\x05"
    tail = np.frombuffer(raw[-12:], dtype=">i2").astype(np.int16)
    np.testing.assert_array_equal(tail.reshape(2, 3), a[-2:])

    # writer refuses a record var whose leading dim mismatches numrecs
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_nc(str(tmp_path / "bad.nc"), {"x": 3},
                 {"a": (("time", "x"), a[:3])},
                 time_values=np.arange(4) * 6.0, fmt="cdf5")


def test_cdf5_read_vars_level_slice(tmp_path):
    """Targeted reads (read_vars + nc3_read_levels byte slicing) work on
    CDF-5 record-interleaved files exactly as on classic."""
    from nasa_niswan_tpu.data.ncio import write_nc
    from nasa_niswan_tpu.data.ncio_native import read_vars

    p = str(tmp_path / "lev5.nc")
    rng = np.random.default_rng(7)
    u = rng.standard_normal((4, 3, 5, 6)).astype(np.float32)  # t,lev,lat,lon
    v = rng.standard_normal((4, 3, 5, 6)).astype(np.float32)
    write_nc(p, {"level": 3, "lat": 5, "lon": 6},
             {"u": (("time", "level", "lat", "lon"), u),
              "v": (("time", "level", "lat", "lon"), v)},
             time_values=np.arange(4) * 6.0, fmt="cdf5")
    out = read_vars(p, ["u", "v"], levels=2)
    np.testing.assert_array_equal(out["u"], u[:, :2])
    np.testing.assert_array_equal(out["v"], v[:, :2])
    assert "time" in out


def test_fuzz_corrupt_files_never_crash(tmp_path):
    """The native reader parses untrusted bytes in C++; corrupt headers
    (truncations, flipped bytes, wild sizes/dimids/offsets) must come back
    as None or a benign Python exception — never a segfault.  Seeded
    sample of the 12k-case fuzz run that originally found an unchecked
    dimid OOB and pointer-overflow length checks."""
    from nasa_niswan_tpu.data.ncio import write_nc

    rng = np.random.default_rng(123)
    for fmt in ("netcdf3", "cdf5"):
        base = str(tmp_path / f"base_{fmt}.nc")
        write_nc(
            base, {"lat": 3, "lon": 4},
            {"conc": (("time", "lat", "lon"),
                      rng.standard_normal((5, 3, 4)).astype(np.float32)),
             "fix": (("lat", "lon"), rng.standard_normal((3, 4)))},
            time_values=np.arange(5) * 6.0, fmt=fmt,
        )
        raw = open(base, "rb").read()
        p = str(tmp_path / "case.nc")
        for trial in range(600):
            b = bytearray(raw)
            mode = trial % 3
            if mode == 0:
                b = b[: rng.integers(4, len(b))]
            elif mode == 1:
                for _ in range(rng.integers(1, 8)):
                    b[rng.integers(0, min(len(b), 512))] = rng.integers(0, 256)
            else:
                for _ in range(4):
                    b[rng.integers(0, len(b))] = rng.integers(0, 256)
                b = b[: rng.integers(8, len(b))]
            with open(p, "wb") as fh:
                fh.write(bytes(b))
            try:
                open_nc_native(p)
                read_var_slice(p, "conc", 0, 1)
            except Exception:
                pass  # python-level failure is fine; a segfault is not
