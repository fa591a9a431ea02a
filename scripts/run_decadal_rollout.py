"""The BASELINE config #5 headline: a DECADAL multi-tracer rollout.

Serves three tracers (BCB / sea salt / clay) through the shared-meteorology
multitracer rollout over a 10-model-year horizon (175,200 half-hour steps,
one carried state, no resets).  The forcing year lives device-resident (one
upload) and is cycled; the emulators were trained on a DIFFERENT synthetic
realization (scripts/run_multitracer_demo.py checkpoints), so year-1 skill
is out-of-realization generalization, and per-cycle skill tracks whether a
decade of closed-loop feedback degrades the state.

    python scripts/run_decadal_rollout.py \
        [--ckpt-root /tmp/multitracer_demo] [--years 10]

Writes results_decadal.json: per-year R² by species, sustained aggregate
species-days/min, carried-state norm trace.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPECIES = ("bcb", "seasalt", "clay")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-root", default="/tmp/multitracer_demo")
    ap.add_argument("--train-steps", type=int, default=1440,
                    help="fixture length the checkpoints were trained on")
    ap.add_argument("--train-seed", type=int, default=11)
    ap.add_argument("--year-steps", type=int, default=17520)
    ap.add_argument("--year-seed", type=int, default=23)
    ap.add_argument("--years", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=1752)
    ap.add_argument("--epochs", type=int, default=8,
                    help="epoch number of the checkpoint to load")
    ap.add_argument("--out", default="/tmp/decadal_demo")
    ap.add_argument("--sharded", nargs=2, type=int, metavar=("LAT", "LON"),
                    default=None,
                    help="shard the grid (lat, lon) over the device mesh "
                         "(parallel/spatial.make_sharded_multitracer_"
                         "rollout_shared) — config #5's full composition; "
                         "default: single-device multitracer program")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from nasa_niswan_tpu.data.dataset import SequenceDataset
    from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
    from nasa_niswan_tpu.rollout.autoregressive import model_days_per_min
    from nasa_niswan_tpu.rollout.multitracer import (
        make_multitracer_rollout_shared,
        stack_params,
    )
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig
    from nasa_niswan_tpu.train.checkpoint import load_checkpoint

    # normalizers: rebuild from the training realization (cheap, exact)
    t0 = time.time()
    train_data = synthetic_e33oma_90d(
        T=args.train_steps, seed=args.train_seed, species=SPECIES
    )
    norms = [
        SequenceDataset(
            train_data, period="train", sequence_length=48, species=sp,
            in_channels=5,
        ).normalizer
        for sp in SPECIES
    ]
    print(f"normalizers rebuilt: {time.time()-t0:.0f}s", flush=True)

    cfg = ConvLSTMConfig(
        in_channels=5, hidden_channels=(64, 32, 16), kernel_sizes=(5, 3, 3),
        compute_dtype="bfloat16",
    )
    from nasa_niswan_tpu.models.convlstm import convlstm_init

    template = convlstm_init(jax.random.PRNGKey(0), cfg)
    params_list = []
    for sp in SPECIES:
        ckpt = os.path.join(
            args.ckpt_root, f"run_{sp}", f"epoch-{args.epochs:03d}"
        )
        if not os.path.isdir(ckpt):
            raise SystemExit(
                f"no checkpoint at {ckpt} — train the per-species "
                f"emulators first:\n  python scripts/run_multitracer_demo"
                f".py --epochs {args.epochs} --out {args.ckpt_root}"
            )
        params, _, _ = load_checkpoint(ckpt, template)
        params_list.append(params)
    stacked = stack_params(params_list)
    if args.sharded:
        from nasa_niswan_tpu.parallel.mesh import make_mesh
        from nasa_niswan_tpu.parallel.spatial import (
            make_sharded_multitracer_rollout_shared,
        )

        lat, lon = args.sharded
        mesh = make_mesh(
            dp=1, lat=lat, lon=lon, devices=jax.devices()[: lat * lon]
        )
        print(f"sharded serving mesh: lat={lat} lon={lon}", flush=True)
        rollout = make_sharded_multitracer_rollout_shared(
            cfg, norms, mesh, padded_shape=(100, 154), grid_shape=(90, 144)
        )
    else:
        rollout = make_multitracer_rollout_shared(
            cfg, norms, padded_shape=(100, 154), grid_shape=(90, 144)
        )

    # the serving year: a FRESH realization of the same climate
    t0 = time.time()
    year = synthetic_e33oma_90d(
        T=args.year_steps, seed=args.year_seed, species=SPECIES
    )
    print(f"serving-year fixture: {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    met_dev = jnp.asarray(
        np.stack([year["u"], year["v"], year["omega"], year["prec"]], axis=1)
        .astype(np.float32)
    )  # (T, 4, H, W) device-resident
    emis_dev = jnp.asarray(
        np.stack([year[f"{sp}_src"] for sp in SPECIES]).astype(np.float32)
    )  # (S, T, H, W)
    # ground truth device-resident in bf16 (halves HBM; R² to ~3 decimals)
    gt_dev = jnp.asarray(
        np.stack([year[f"{sp}_conc"] for sp in SPECIES]).astype(np.float32)
    ).astype(jnp.bfloat16)  # (S, T, h, w)
    jax.block_until_ready((emis_dev, gt_dev))
    print(f"device upload: {time.time()-t0:.0f}s", flush=True)

    @jax.jit
    def chunk_r2_terms(preds, gt_chunk):
        """Per-step residual and total sums over the grid, on device.

        preds (S, t, h, w) f32; gt_chunk (S, t, h, w) bf16 ->
        (S, t) ss_res and ss_tot (vs the per-step spatial mean, matching
        evalx.metrics.r2_temporal).
        """
        y = gt_chunk.astype(jnp.float32)
        ss_res = jnp.sum((y - preds) ** 2, axis=(-2, -1))
        ybar = jnp.mean(y, axis=(-2, -1), keepdims=True)
        ss_tot = jnp.sum((y - ybar) ** 2, axis=(-2, -1))
        return ss_res, ss_tot

    # Measured note: folding the per-chunk slices + rollout + R² terms
    # into ONE jitted dispatch (the scripts/run_northstar_year.py trick)
    # was tried and REVERTED here — at 3 species x 1752-step chunks the
    # merged program's compile ballooned past the dispatch savings
    # (1,289 s total vs 811 s for this simpler loop).
    T = args.year_steps
    state = None
    yearly = []
    state_norms = []
    total_steps = 0
    t_serve = time.time()
    for yr in range(args.years):
        res_terms, tot_terms = [], []
        for s in range(0, T, args.chunk):
            m = met_dev[s : s + args.chunk][None]
            e = emis_dev[:, None, s : s + args.chunk]
            p, state = rollout(stacked, m, e, state)
            ss_res, ss_tot = chunk_r2_terms(p[:, 0], gt_dev[:, s : s + args.chunk])
            # keep the (S, t) terms ON DEVICE: fetching them here would
            # block the dispatch queue once per chunk (a tunnel RTT each);
            # deferred to one fetch per year the chunks chain asynchronously
            res_terms.append(ss_res)
            tot_terms.append(ss_tot)
            total_steps += m.shape[1]
        r2_t = 1.0 - np.asarray(
            jnp.concatenate(res_terms, axis=1)
        ) / np.asarray(jnp.concatenate(tot_terms, axis=1))  # (S, T)
        r2 = {sp: float(np.nanmean(r2_t[i])) for i, sp in enumerate(SPECIES)}
        # crop the carry to its valid columns so the diagnostic is layout-
        # independent (the pallas2 cell carries zero-margin padded columns)
        h1 = np.asarray(state[0][0], np.float32)
        if h1.shape[-2] != 154:
            from nasa_niswan_tpu.ops.convlstm_pallas2 import col_margin

            o2 = col_margin((5, 3, 3))
            h1 = h1[..., o2 : o2 + 154, :]
        h_norm = float(np.sqrt(np.mean(h1**2)))
        state_norms.append(h_norm)
        yearly.append(r2)
        print(f"year {yr+1}: R2 {r2}  |h1|_rms {h_norm:.4f}", flush=True)
    elapsed = time.time() - t_serve

    days_min = model_days_per_min(total_steps, elapsed, batch=len(SPECIES))
    result = {
        "config": "decadal 3-species shared-met rollout, one carried state",
        "years": args.years,
        "total_steps": int(total_steps),
        "serving_wall_s": round(elapsed, 1),
        "aggregate_species_days_per_min": round(days_min, 1),
        "per_year_r2": yearly,
        "layer1_h_rms_by_year": [round(x, 5) for x in state_norms],
    }
    print(json.dumps(result, indent=2), flush=True)
    with open(os.path.join(args.out, "results_decadal.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
