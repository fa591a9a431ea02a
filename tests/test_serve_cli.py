"""Serving CLI (``python -m nasa_niswan_tpu.rollout``): every snapshot kind
routes to the right rollout, predictions land in readable netCDF, and a
persisted carry resumes the episode bit-exactly — the cross-invocation
in-line-surrogate contract (reference README.md:12,29; test.ipynb cell 8).

The CLI main() is driven in-process: subprocess invocations would recompile
each program per process, and XLA:CPU's compile-time algorithm choice can
differ under load, breaking cross-process bit-exactness that the in-process
contract guarantees (one compiled executable serves all chunks).
"""

import json
import os
import sys

import numpy as np
import pytest

from nasa_niswan_tpu.data.ncio import open_nc
from nasa_niswan_tpu.rollout.__main__ import main as serve_main


def read_pred(path, var="bcb_conc"):
    f = open_nc(path)
    return np.asarray(f.variables[var][:])


def test_open_loop_serve_and_resume(tmp_path, canonical_snap):
    snap = canonical_snap
    full_nc = str(tmp_path / "full.nc")
    summary = serve_main(
        ["--run-dir", snap, "--out", full_nc, "--chunk", "4"]
    )
    assert summary["route"] == "open_loop" and summary["steps"] == 12
    assert summary["cold_start"] and summary["suggested_spinup_steps"] == 2
    full = read_pred(full_nc)
    assert full.shape == (12, 16, 24) and np.isfinite(full).all()
    # coordinate variables + CF no-leap half-hour time axis
    f = open_nc(full_nc)
    assert {"bcb_conc", "lat", "lon", "time"} <= set(f.variables)
    t = np.asarray(f.variables["time"][:])
    np.testing.assert_allclose(t[:3], [0.0, 0.5, 1.0])
    assert os.path.exists(os.path.join(snap, "serve_summary.json"))

    # persisted-carry resume: two invocations == one, bit-exact
    carry = str(tmp_path / "carry.npz")
    serve_main(
        ["--run-dir", snap, "--out", str(tmp_path / "p1.nc"),
         "--steps", "8", "--chunk", "4", "--state-out", carry]
    )
    s2 = serve_main(
        ["--run-dir", snap, "--out", str(tmp_path / "p2.nc"),
         "--skip", "8", "--chunk", "4", "--state-in", carry]
    )
    assert not s2["cold_start"] and s2["suggested_spinup_steps"] == 0
    stitched = np.concatenate(
        [read_pred(str(tmp_path / "p1.nc")), read_pred(str(tmp_path / "p2.nc"))]
    )
    np.testing.assert_array_equal(full, stitched)
    # the resumed half's time axis continues where part 1 stopped
    t2 = np.asarray(open_nc(str(tmp_path / "p2.nc")).variables["time"][:])
    np.testing.assert_allclose(t2[0], 8 * 0.5)


def test_closed_loop_serve_and_resume(tmp_path, seq2seq_snap):
    snap = seq2seq_snap
    full_nc = str(tmp_path / "s2s_full.nc")
    summary = serve_main(
        ["--run-dir", snap, "--out", full_nc, "--chunk", "4"]
    )
    assert summary["route"] == "closed_loop"
    full = read_pred(full_nc)
    assert full.ndim == 3 and np.isfinite(full).all()

    carry = str(tmp_path / "carry.npz")
    serve_main(
        ["--run-dir", snap, "--out", str(tmp_path / "p1.nc"),
         "--steps", "8", "--chunk", "4", "--state-out", carry]
    )
    # the carry persists the feedback frame alongside (h, c)
    with np.load(carry) as z:
        assert "prev_norm" in z.files
    serve_main(
        ["--run-dir", snap, "--out", str(tmp_path / "p2.nc"),
         "--skip", "8", "--chunk", "4", "--state-in", carry]
    )
    stitched = np.concatenate(
        [read_pred(str(tmp_path / "p1.nc")), read_pred(str(tmp_path / "p2.nc"))]
    )
    np.testing.assert_array_equal(full, stitched)


def test_artifact_serve_matches_live(tmp_path, canonical_snap):
    """A frozen jax.export artifact serves the same stream the live jit
    does (rollout/export.py's deployment contract)."""
    from nasa_niswan_tpu.evalx.snapshot import load_snapshot
    from nasa_niswan_tpu.rollout.export import export_rollout

    snap = canonical_snap
    loaded = load_snapshot(snap)
    art = str(tmp_path / "rollout.bin")
    export_rollout(
        loaded.bundle.config, loaded.dataset.normalizer, loaded.params,
        batch=1, chunk_steps=4, n_channels=loaded.cfg.in_channels,
        grid_shape=(16, 24), padded_shape=loaded.padded_shape,
        static=loaded.static, path=art,
    )
    live_nc = str(tmp_path / "live.nc")
    art_nc = str(tmp_path / "art.nc")
    serve_main(["--run-dir", snap, "--out", live_nc, "--chunk", "4"])
    summary = serve_main(
        ["--run-dir", snap, "--out", art_nc, "--artifact", art]
    )
    assert summary["route"] == "open_loop"
    np.testing.assert_allclose(
        read_pred(live_nc), read_pred(art_nc), atol=1e-5
    )


def test_single_step_feedback_serve(tmp_path, unet6_snap):
    """UNet-6ch snapshots serve through the closed-loop feedback forward
    (no recurrent carry); state flags are refused with a clear message."""
    out_nc = str(tmp_path / "u6.nc")
    summary = serve_main(["--run-dir", unet6_snap, "--out", out_nc])
    assert summary["route"] == "single_step"
    assert summary["suggested_spinup_steps"] == 0
    preds = read_pred(out_nc)
    assert preds.ndim == 3 and np.isfinite(preds).all()
    with pytest.raises(SystemExit, match="state"):
        serve_main(
            ["--run-dir", unet6_snap, "--out", out_nc,
             "--state-out", str(tmp_path / "c.npz")]
        )


def test_serve_guards(tmp_path, canonical_snap):
    snap = canonical_snap
    out = str(tmp_path / "x.nc")
    # a repeat-padded tail would advance the carry over padding frames
    with pytest.raises(SystemExit, match="divisible"):
        serve_main(
            ["--run-dir", snap, "--out", out, "--steps", "7",
             "--chunk", "4", "--state-out", str(tmp_path / "c.npz")]
        )
    with pytest.raises(SystemExit, match="skip"):
        serve_main(["--run-dir", snap, "--out", out, "--skip", "99"])
    with pytest.raises(SystemExit, match="steps"):
        serve_main(["--run-dir", snap, "--out", out, "--steps", "99"])


def test_closed_loop_rejects_open_loop_carry(tmp_path, canonical_snap,
                                             seq2seq_snap):
    carry = str(tmp_path / "open_carry.npz")
    serve_main(
        ["--run-dir", canonical_snap, "--out", str(tmp_path / "a.nc"),
         "--steps", "8", "--chunk", "4", "--state-out", carry]
    )
    with pytest.raises(SystemExit, match="prev_norm"):
        serve_main(
            ["--run-dir", seq2seq_snap, "--out", str(tmp_path / "b.nc"),
             "--state-in", carry]
        )


def test_sharded_serve_matches_single_device(tmp_path, canonical_snap,
                                             seq2seq_snap):
    """--sharded LAT LON serves the explicit-halo shard_map rollout over
    the 8-device CPU mesh: open-loop and closed-loop routes both match the
    single-device serve; guards refuse non-recurrent snapshots."""
    plain_nc = str(tmp_path / "plain.nc")
    shard_nc = str(tmp_path / "shard.nc")
    serve_main(["--run-dir", canonical_snap, "--out", plain_nc,
                "--chunk", "4"])
    s = serve_main(["--run-dir", canonical_snap, "--out", shard_nc,
                    "--chunk", "4", "--sharded", "2", "4"])
    assert s["route"] == "open_loop"
    np.testing.assert_allclose(
        read_pred(shard_nc), read_pred(plain_nc), atol=1e-5
    )

    plain2 = str(tmp_path / "plain2.nc")
    shard2 = str(tmp_path / "shard2.nc")
    serve_main(["--run-dir", seq2seq_snap, "--out", plain2, "--chunk", "4"])
    s2 = serve_main(["--run-dir", seq2seq_snap, "--out", shard2,
                     "--chunk", "4", "--sharded", "2", "4"])
    assert s2["route"] == "closed_loop"
    np.testing.assert_allclose(
        read_pred(shard2), read_pred(plain2), atol=1e-5
    )

    with pytest.raises(SystemExit, match="sharded"):
        serve_main(["--run-dir", canonical_snap, "--out", shard_nc,
                    "--sharded", "2", "4", "--artifact", "x.bin"])

    # sharded carry persists (gathered to host npz) and resumes: two
    # sharded invocations == the full sharded serve, bit-exact
    carry = str(tmp_path / "sh_carry.npz")
    serve_main(["--run-dir", seq2seq_snap, "--out", str(tmp_path / "q1.nc"),
                "--steps", "8", "--chunk", "4", "--sharded", "2", "4",
                "--state-out", carry])
    serve_main(["--run-dir", seq2seq_snap, "--out", str(tmp_path / "q2.nc"),
                "--skip", "8", "--chunk", "4", "--sharded", "2", "4",
                "--state-in", carry])
    stitched = np.concatenate(
        [read_pred(str(tmp_path / "q1.nc")), read_pred(str(tmp_path / "q2.nc"))]
    )
    np.testing.assert_array_equal(read_pred(shard2), stitched)


def test_serve_guard_messages(tmp_path, canonical_snap):
    """CLI-grade errors for bad --sharded values; the device-resident
    upload falls back to host streaming when the allocator refuses."""
    out = str(tmp_path / "g.nc")
    with pytest.raises(SystemExit, match="device count"):
        serve_main(["--run-dir", canonical_snap, "--out", out,
                    "--sharded", "2", "3"])
    with pytest.raises(SystemExit, match="tile evenly"):
        serve_main(["--run-dir", canonical_snap, "--out", out,
                    "--sharded", "8", "1"])  # padded H=20 % 8 != 0

    import nasa_niswan_tpu.rollout.__main__ as cli

    class Boom(Exception):
        pass

    import jax as _jax
    orig = _jax.device_put
    try:
        def boom(x):
            raise Boom("RESOURCE_EXHAUSTED (simulated)")
        _jax.device_put = boom
        frames = np.zeros((4, 2, 3, 3), np.float32)
        got = cli._device_resident(frames, 4.0)
        assert got is frames  # fell back to the host array
    finally:
        _jax.device_put = orig
