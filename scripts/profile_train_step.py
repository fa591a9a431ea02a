"""Decompose the canonical TRAINING step time on the real chip.

Serving has committed traces + a roofline (docs/profile/, 53.6% bf16
peak); this does the same for the canonical training step
(launcher.sh config: bs 8, T=48, 100x154 padded, 8 channels,
bf16 + remat + fused Pallas BPTT — /root/reference/train.py:82-145):
per-variant ms/step for the production path and its ablations, a
days/min figure for each, and an optional jax.profiler trace of the
production step.

    python scripts/profile_train_step.py [--trace /tmp/ttrace] \
        [--out docs/profile/train_step.json]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=48)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from nasa_niswan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.models.registry import build_model
    from nasa_niswan_tpu.train.loop import make_optimizer, make_train_step

    B, T = args.batch, args.seq
    C, PADDED, GRID = 8, (100, 154), (90, 144)
    norm = Normalizer(
        x_mean=np.zeros(C, np.float32), x_std=np.ones(C, np.float32),
        y_mean=0.0, y_std=1.0,
    )
    rng = np.random.default_rng(0)
    # device-resident raw batch: the step's own preprocessing (normalize,
    # pad_geo, transpose, margin layout) is measured as part of the step,
    # exactly as in production; only the host pipeline is excluded
    x = jnp.asarray(rng.standard_normal((B, T, C, *GRID)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, *GRID)).astype(np.float32))
    opt = make_optimizer(1e-3, (0.5, 0.999))

    out = {"config": f"bs {B}, T={T}, {PADDED[0]}x{PADDED[1]}, {C}ch"}

    def timed(step, params, state, opt_state, key):
        # warm/compile, then time a dispatch chain with one final sync
        p, s, o = params, state, opt_state
        p, s, o, m = step(p, s, o, x, y, key)
        np.asarray(m["loss"])
        tic = time.perf_counter()
        for _ in range(args.reps):
            p, s, o, m = step(p, s, o, x, y, key)
        np.asarray(m["loss"])
        return (time.perf_counter() - tic) / args.reps

    variants = [
        # the production path first (its compile warms the cache for the
        # trace below)
        ("pallas2_fused_remat", dict(cell_impl="pallas2", remat=True)),
        ("pallas2_bwd_xla_remat",
         dict(cell_impl="pallas2", remat=True, bptt_bwd="xla")),
        ("xla_remat", dict(cell_impl="xla", remat=True)),
        ("xla_noremat", dict(cell_impl="xla", remat=False)),
    ]
    prod_step = None
    prod_tree = None
    for name, kw in variants:
        bundle = build_model(
            f"LSTM-prof-{name}", in_channels=C,
            hidden_channels=(64, 32, 16), kernel_sizes=(5, 3, 3),
            compute_dtype="bfloat16", **kw,
        )
        params, state = bundle.init(jax.random.PRNGKey(0))
        opt_state = opt.init(params)
        step = make_train_step(
            bundle, norm, opt, padded_shape=PADDED, grid_shape=GRID,
            donate=False,
        )
        try:
            sec = timed(step, params, state, opt_state, jax.random.PRNGKey(1))
        except Exception as e:  # e.g. OOM for a non-production variant
            out[name] = {"error": str(e)[:200]}
            print(json.dumps({name: out[name]}), flush=True)
            continue
        days_min = (B * T / 48.0) / (sec / 60.0)
        out[name] = {
            "step_ms": round(sec * 1e3, 2),
            "days_per_min": round(days_min, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
        if name == "pallas2_fused_remat":
            prod_step = step
            prod_tree = (params, state, opt_state)

    if args.trace and prod_step is not None:
        params, state, opt_state = prod_tree
        _, _, _, m = prod_step(params, state, opt_state, x, y,
                               jax.random.PRNGKey(2))
        np.asarray(m["loss"])
        with jax.profiler.trace(args.trace):
            _, _, _, m = prod_step(params, state, opt_state, x, y,
                                   jax.random.PRNGKey(2))
            np.asarray(m["loss"])
        print(f"trace written to {args.trace}", flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
