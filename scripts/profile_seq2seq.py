"""Profile the seq2seq scheduled-sampling train step (config #3).

Measures the jitted step at canonical 6ch surface shapes and isolates the
cost of the per-step feedback pad (rollout/seq2seq.py scan body) by
comparing against an ablation whose pad_geo is replaced by a zero-cost
passthrough (numerics differ at the margins — timing ablation only).

    python scripts/profile_seq2seq.py [--T 48] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=48)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
    from nasa_niswan_tpu.rollout import seq2seq
    from nasa_niswan_tpu.train.loop import make_optimizer

    B, T = args.batch, args.T
    GRID, PADDED = (90, 144), (100, 154)
    cfg = ConvLSTMConfig(
        in_channels=6, hidden_channels=(64, 32, 16), kernel_sizes=(5, 3, 3),
        compute_dtype="bfloat16", remat=True,
    )
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    norm = Normalizer(
        x_mean=np.zeros(5, np.float32), x_std=np.ones(5, np.float32),
        y_mean=0.0, y_std=1.0,
    )
    opt = make_optimizer(1e-3, (0.5, 0.999))
    opt_state = opt.init(params)
    rng0 = jax.random.PRNGKey(1)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, T, 5, *GRID)).astype(np.float32))
    p0 = jnp.asarray(r.standard_normal((B, *GRID)).astype(np.float32))
    y = jnp.asarray(r.standard_normal((B, T, *GRID)).astype(np.float32))

    def timed(step):
        nonlocal params, opt_state
        p, o, m = step(params, opt_state, x, p0, y, rng0, 0.8)
        np.asarray(m["loss"])
        tic = time.perf_counter()
        for _ in range(args.reps):
            p, o, m = step(p, o, x, p0, y, rng0, 0.8)
            np.asarray(m["loss"])
        return (time.perf_counter() - tic) / args.reps

    out = {}
    step = seq2seq.make_seq2seq_train_step(
        cfg, norm, opt, padded_shape=PADDED, grid_shape=GRID
    )
    out["step_s"] = round(timed(step), 4)
    print(json.dumps({"baseline_xla": out["step_s"]}), flush=True)

    # fused whole-chunk BPTT (ops/seq2seq_bptt.py): pallas2 cells + the
    # fused Pallas backward, one custom VJP over the entire feedback chunk
    import dataclasses

    cfg_p2 = dataclasses.replace(cfg, cell_impl="pallas2")
    step_p2 = seq2seq.make_seq2seq_train_step(
        cfg_p2, norm, opt, padded_shape=PADDED, grid_shape=GRID
    )
    out["step_fused_s"] = round(timed(step_p2), 4)
    print(json.dumps({
        "fused_bptt": out["step_fused_s"],
        "speedup_vs_xla": round(out["step_s"] / out["step_fused_s"], 3),
    }), flush=True)

    # ablation: feedback pad replaced by a static slice-free broadcast pad
    real_pad = seq2seq.pad_geo

    def fake_pad(xx, shape):
        if xx.ndim == 3 and xx.shape[-2:] != tuple(shape):  # the feedback map
            H, W = shape
            h, w = xx.shape[-2:]
            return jnp.pad(xx, ((0, 0), (0, H - h), (0, W - w)))
        return real_pad(xx, shape)

    seq2seq.pad_geo = fake_pad
    try:
        step2 = seq2seq.make_seq2seq_train_step(
            cfg, norm, opt, padded_shape=PADDED, grid_shape=GRID
        )
        out["step_nopad_s"] = round(timed(step2), 4)
    finally:
        seq2seq.pad_geo = real_pad
    print(json.dumps({
        "B": B, "T": T, "step_s": out["step_s"],
        "step_fused_s": out["step_fused_s"],
        "step_zero_pad_s": out["step_nopad_s"],
        "pad_share": round(1 - out["step_nopad_s"] / out["step_s"], 4),
        "ms_per_scan_step": round(out["step_s"] / T * 1e3, 3),
        "ms_per_scan_step_fused": round(out["step_fused_s"] / T * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
