"""Decompose the north-star rollout step time on the real chip.

Times the full rollout and ablations (no taps, no preprocessing, layer
prefixes, hoist on/off, cell impls) to attribute the per-step cost, plus an
optional jax.profiler trace:

    python scripts/profile_rollout.py [--steps 384] [--trace /tmp/trace]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, sync, reps=3):
    fn()  # compile + warm
    sync()
    tic = time.perf_counter()
    for _ in range(reps):
        fn()
        sync()
    return (time.perf_counter() - tic) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=384)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--impl", default="xla")
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
    )
    from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn

    C, PADDED, GRID = 62, (100, 154), (90, 144)
    T, B = args.steps, args.batch
    norm = Normalizer(
        x_mean=np.zeros(C, np.float32), x_std=np.ones(C, np.float32),
        y_mean=0.0, y_std=1.0,
    )
    rng = np.random.default_rng(0)
    forcings = jnp.asarray(
        rng.standard_normal((B, T, C, *GRID)).astype(np.float32)
    )
    full_cfg = ConvLSTMConfig(
        in_channels=C, hidden_channels=(64, 32, 16), kernel_sizes=(5, 3, 3),
        compute_dtype="bfloat16", cell_impl=args.impl,
    )
    params = convlstm_init(jax.random.PRNGKey(0), full_cfg)
    out = {}

    def report(name, seconds):
        out[name] = round(seconds / T * 1e3, 4)
        print(json.dumps({name: out[name]}), flush=True)

    # full rollout, hoist auto/on/off
    for label, hoist in (("full_hoist", True), ("full_scan", False)):
        r = make_rollout_fn(
            full_cfg, norm, padded_shape=PADDED, grid_shape=GRID,
            precompute_input_conv=hoist, cell_impl=None,
        )
        box = {}
        def run(r=r, box=box):
            box["p"], _ = r(params, forcings)
        report(label, timed(run, lambda: np.asarray(box["p"][0, -1])))

    # pre-prepped frames: cells + taps only (no normalize/pad/transpose)
    H, W = PADDED
    xs_pre = jnp.asarray(
        rng.standard_normal((B, T, H, W, C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def bare(cfg, taps, hoist):
        f = jax.jit(
            lambda p, x: convlstm_apply(
                p, x, cfg, return_per_step=taps, precompute_input_conv=hoist
            )
        )
        box = {}
        def run():
            o = f(params, xs_pre)
            box["o"] = o[1] if taps else o
        sync = lambda: np.asarray(
            box["o"][0, -1] if taps else box["o"][0]
        )
        return timed(run, sync)

    report("cells_taps_hoist", bare(full_cfg, True, True))
    report("cells_taps_scan", bare(full_cfg, True, False))
    report("cells_notaps_hoist", bare(full_cfg, False, True))

    # layer-prefix ablation (cells only, no taps, hoisted)
    for n in (1, 2):
        cfg_n = ConvLSTMConfig(
            in_channels=C,
            hidden_channels=full_cfg.hidden_channels[:n],
            kernel_sizes=full_cfg.kernel_sizes[:n],
            compute_dtype="bfloat16", cell_impl=args.impl,
        )
        p_n = {
            "cells": params["cells"][:n],
            "head": convlstm_init(jax.random.PRNGKey(1), cfg_n)["head"],
        }
        f = jax.jit(
            lambda p, x: convlstm_apply(
                p, x, cfg_n, precompute_input_conv=True
            )
        )
        box = {}
        def run(f=f, p_n=p_n, box=box):
            box["o"] = f(p_n, xs_pre)
        report(f"cells_notaps_hoist_L{n}", timed(run, lambda: np.asarray(box["o"][0])))

    if args.trace:
        r = make_rollout_fn(
            full_cfg, norm, padded_shape=PADDED, grid_shape=GRID,
            cell_impl=None,
        )
        p, _ = r(params, forcings)
        np.asarray(p[0, -1])
        with jax.profiler.trace(args.trace):
            p, _ = r(params, forcings)
            np.asarray(p[0, -1])
        print("trace written to", args.trace)

    print(json.dumps({"impl": args.impl, "batch": B, "ms_per_step": out}))


if __name__ == "__main__":
    main()
