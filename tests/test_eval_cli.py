"""Train-then-evaluate CLI round trip: the configurations.json contract
carries the run from training into evaluation (test.ipynb cell 3 semantics),
and evaluation writes test-results.npy + evaluation.json."""

import json
import os
import subprocess
import sys


def run(cmd, env):
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                         env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    return out


def test_train_then_evaluate(tmp_path):
    snap = str(tmp_path / "snap")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.train",
            "--model", "LSTM-evalcli", "--hidden-channels", "4",
            "--kernel-size", "3", "--num-layers", "1",
            "--sequence-length", "3", "--num-epochs", "1", "--batch-size", "4",
            "--input-size", "20", "28", "--synthetic-steps", "60",
            "--synthetic-grid", "16", "24", "--snapshot-dir", snap,
            "--checkpoint-every", "1",
        ],
        env,
    )
    out = run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.evalx",
            "--run-dir", snap, "--mode", "windowed",
        ],
        env,
    )
    assert "temporal R2" in out.stdout
    assert os.path.exists(os.path.join(snap, "test-results.npy"))
    report = json.load(open(os.path.join(snap, "evaluation.json")))
    assert "temporal_r2_summary" in report and "regional_r2" in report

    # rollout mode too, plus the frozen serving artifact
    artifact = str(tmp_path / "rollout.bin")
    out2 = run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.evalx",
            "--run-dir", snap, "--mode", "rollout",
            "--export-artifact", artifact, "--artifact-chunk", "3",
        ],
        env,
    )
    assert "temporal R2" in out2.stdout
    assert "serving artifact" in out2.stdout
    assert os.path.getsize(artifact) > 1000


def test_eval_cli_export_hidden_and_oat(tmp_path):
    """--export-hidden writes HSs.npy (cell 8's hidden-state buffer);
    --oat writes the sensitivity npz (+ boxplot when mpl present)."""
    import numpy as np

    snap = str(tmp_path / "snap2")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.train",
            "--model", "LSTM-hss", "--hidden-channels", "4",
            "--kernel-size", "3", "--num-layers", "1",
            "--sequence-length", "3", "--num-epochs", "1", "--batch-size", "4",
            "--input-size", "20", "28", "--synthetic-steps", "60",
            "--synthetic-grid", "16", "24", "--snapshot-dir", snap,
            "--checkpoint-every", "1",
        ],
        env,
    )
    run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.evalx",
            "--run-dir", snap, "--mode", "windowed",
            "--export-hidden", "--oat",
        ],
        env,
    )
    hss = np.load(os.path.join(snap, "HSs.npy"))
    assert hss.ndim == 4 and hss.shape[1] == 3  # (N, T, h, w)
    with np.load(os.path.join(snap, "oat_sensitivity.npz")) as f:
        assert set(f.files) == {"u", "v", "w", "prec", "src"}
        assert (f["u"] >= 0).all()
