"""Host-side day-file read microbench: native C++ reader vs scipy.

The lazy real-data loaders (data/netcdf.py) open five daily files per
cache-miss day; this measures that floor at a realistic day-file size
(48 half-hourly steps at the 90x144 grid, 20-level 4-D families).

    python scripts/bench_ncread.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nasa_niswan_tpu.data import ncio
from nasa_niswan_tpu.data.ncfixture import write_fixture_tree
from nasa_niswan_tpu.data.ncio_native import available, open_nc_native


def timeit(fn, reps=5):
    fn()  # warm page cache
    tic = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - tic) / reps


def main():
    assert available(), "native reader not built"
    with tempfile.TemporaryDirectory() as d:
        write_fixture_tree(d, days=1, steps_per_day=48, H=90, W=144, levels=20)
        paths = sorted(glob.glob(d + "/*.nc"))
        total_mb = sum(os.path.getsize(p) for p in paths) / 1e6

        def read_all(opener, file_paths=None):
            for p in file_paths or paths:
                f = opener(p)
                for n in f.variables:
                    np.asarray(f[n]).sum()  # touch every array

        t_scipy = timeit(lambda: read_all(ncio._open_scipy))
        t_native = timeit(lambda: read_all(open_nc_native))

        # the actual ingestion unit: one surface-species day via the
        # targeted-read path (only the consumed variables)
        from nasa_niswan_tpu.data.netcdf import load_time_index, read_day_fields

        date = load_time_index(d)[0].strftime("%Y%m%d")
        t_day = timeit(lambda: read_day_fields(d, date, "bcb"))
        os.environ["NISWAN_NO_NATIVE_NC"] = "1"
        t_day_scipy = timeit(lambda: read_day_fields(d, date, "bcb"))
        del os.environ["NISWAN_NO_NATIVE_NC"]

        out = {
            "day_files": len(paths),
            "total_MB": round(total_mb, 1),
            "scipy_ms": round(t_scipy * 1e3, 1),
            "native_ms": round(t_native * 1e3, 1),
            "speedup": round(t_scipy / t_native, 2),
            "native_GBps": round(total_mb / 1e3 / t_native, 2),
            "day_fields_scipy_ms": round(t_day_scipy * 1e3, 1),
            "day_fields_native_ms": round(t_day * 1e3, 1),
            "day_fields_speedup": round(t_day_scipy / t_day, 2),
        }

    # on-disk format matrix: the same 2-day surface tree in each format,
    # timed through the SAME open_nc dispatch the lazy loaders use, plus
    # the end-to-end training-feed unit (lazy dataset samples/sec)
    from nasa_niswan_tpu.data.netcdf import LazyE33OMASingleStep

    for fmt in ("netcdf3", "cdf5", "netcdf4"):
        with tempfile.TemporaryDirectory() as d:
            write_fixture_tree(
                d, days=2, steps_per_day=48, H=90, W=144, levels=20, fmt=fmt
            )
            paths = sorted(glob.glob(d + "/*.nc"))
            out[f"{fmt}_open_ms"] = round(
                timeit(lambda: read_all(ncio.open_nc, paths)) * 1e3, 1
            )
            ds = LazyE33OMASingleStep(d, period="train", species="bcb",
                                      padding=None)
            n = min(len(ds), 64)

            def sample_pass():
                for i in range(n):
                    ds[i]

            t = timeit(sample_pass, reps=3)
            out[f"{fmt}_lazy_samples_per_s"] = round(n / t, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
