"""Profile the CLOSED-LOOP serving chunk on the real chip and commit the
roofline evidence (companion to the open-loop traces in docs/profile/).

Config #3's production mode — the model feeds its own previous prediction
back through the feedback channel (test.ipynb cell 8 run continuously) —
at canonical surface shapes (6ch: 5 met + feedback, ConvLSTM 64/32/16,
bf16, B=1), device-resident forcings.

    python scripts/profile_closed_loop.py [--steps 480] [--impl auto]
        [--trace docs/profile/closed_loop_trace]

Summarize with:

    python scripts/trace_summary.py <trace_dir> --steps 480 \
        --label closed_loop_pallas2 --config closedloop6 \
        --out docs/profile/closed_loop.json
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=480)
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--trace", default=None)
    ap.add_argument("--chain", type=int, default=1,
                    help="chunks chained through the on-device carry per "
                         "measurement (sync once at the end) — the decadal "
                         "runner's dispatch pattern; 1 = single-dispatch "
                         "latency, >1 = sustained serving rate")
    args = ap.parse_args()
    if args.chain < 1:
        ap.error("--chain must be >= 1")

    import jax
    import jax.numpy as jnp

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.evalx.evaluate import (
        make_closed_loop_chunk,
        zero_closed_loop_state,
    )
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init
    from nasa_niswan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = ConvLSTMConfig(
        6, (64, 32, 16), (5, 3, 3),
        compute_dtype="bfloat16", cell_impl=args.impl,
    )
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    norm = Normalizer(
        np.zeros(5, np.float32), np.ones(5, np.float32), 0.0, 1.0
    )
    run = make_closed_loop_chunk(
        cfg, norm, padded_shape=(100, 154), grid_shape=(90, 144)
    )
    rng = np.random.default_rng(0)
    T = args.steps
    met = jnp.asarray(rng.standard_normal((T, 5, 90, 144)).astype(np.float32))
    prev0 = jnp.asarray(rng.standard_normal((1, 90, 144)).astype(np.float32))
    jax.block_until_ready(met)
    st = zero_closed_loop_state(cfg, (100, 154))

    out = run(params, st, prev0, met)
    np.asarray(out[1])  # compile + warm; sync on the tiny prev frame
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s, p = st, prev0
        for _ in range(args.chain):
            s, p, preds = run(params, s, p, met)
        np.asarray(p)  # one sync per chain: dispatches queue asynchronously
        best = min(best, time.perf_counter() - t0)
    n = T * args.chain
    print(
        f"closed-loop impl={args.impl} chain={args.chain}: "
        f"{best*1000/n:.3f} ms/step wall (device-resident) -> "
        f"{n/48/(best/60):.0f} model-days/min"
    )

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = run(params, st, prev0, met)
            np.asarray(out[1])
        print(f"trace written under {args.trace}")


if __name__ == "__main__":
    main()
