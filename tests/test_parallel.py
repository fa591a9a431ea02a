"""Sharding tests on the virtual 8-device CPU mesh.

Every parallel path is checked for numerical parity against its
single-device counterpart — sharding must be a pure layout decision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from nasa_niswan_tpu.data.dataset import SequenceDataset
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
from nasa_niswan_tpu.models.convlstm import (
    ConvLSTMConfig,
    convlstm_apply,
    convlstm_init,
)
from nasa_niswan_tpu.models.registry import build_model
from nasa_niswan_tpu.ops.conv import conv2d
from nasa_niswan_tpu.parallel.dp import make_dp_train_step
from nasa_niswan_tpu.parallel.halo import sharded_conv2d
from nasa_niswan_tpu.parallel.mesh import make_mesh
from nasa_niswan_tpu.parallel.spatial import (
    convlstm_apply_sharded,
    make_spatial_train_step,
)
from nasa_niswan_tpu.train.loop import make_optimizer, make_train_step


def test_mesh_construction():
    mesh = make_mesh(dp=2, lat=2, lon=2)
    assert mesh.shape == {"dp": 2, "lat": 2, "lon": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3)


def test_sharded_conv_matches_dense(rng):
    """halo_exchange_zero + VALID conv == SAME zero-pad conv, on a 2x2
    spatial mesh (with dp=2 batch split as well)."""
    mesh = make_mesh(dp=2, lat=2, lon=2)
    x = rng.standard_normal((4, 16, 24, 5)).astype(np.float32)
    k = rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.1
    b = rng.standard_normal((7,)).astype(np.float32)

    want = np.asarray(conv2d(x, k, b, padding=1))

    fn = jax.shard_map(
        lambda xl: sharded_conv2d(xl, k, b, pad=1),
        mesh=mesh,
        in_specs=(P("dp", "lat", "lon", None),),
        out_specs=P("dp", "lat", "lon", None),
    )
    got = np.asarray(jax.jit(fn)(x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_convlstm_matches_single_device(rng):
    mesh = make_mesh(dp=2, lat=2, lon=2)
    cfg = ConvLSTMConfig(in_channels=3, hidden_channels=(4, 4), kernel_sizes=(3, 3))
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    x = rng.standard_normal((2, 3, 16, 24, 3)).astype(np.float32)

    want = np.asarray(convlstm_apply(params, x, cfg))
    got = np.asarray(convlstm_apply_sharded(params, x, cfg, mesh))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.fixture(scope="module")
def tiny_setup():
    data = synthetic_e33oma_90d(T=40, seed=2, H=16, W=24)
    ds = SequenceDataset(data, period="train", sequence_length=3)
    bundle = build_model(
        "LSTM-t", in_channels=5, hidden_channels=(4,), kernel_sizes=(3,)
    )
    params, state = bundle.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, (0.5, 0.999))
    opt_state = opt.init(params)
    xs, ys = zip(*(ds[i] for i in range(8)))
    batch = (np.stack(xs), np.stack(ys))
    return ds, bundle, opt, params, state, opt_state, batch


def _run(step, params, state, opt_state, batch):
    x, y = batch
    rng = jax.random.PRNGKey(7)
    p, s, o, m = step(params, state, opt_state, x, y, rng)
    return p, m


def test_dp_train_step_matches_single_device(tiny_setup):
    ds, bundle, opt, params, state, opt_state, batch = tiny_setup
    kw = dict(padded_shape=(20, 28), grid_shape=(16, 24))
    single = make_train_step(bundle, ds.normalizer, opt, **kw)
    p1, m1 = _run(single, params, state, opt_state, batch)

    mesh = make_mesh(dp=8)
    dp = make_dp_train_step(bundle, ds.normalizer, opt, mesh, **kw)
    p2, m2 = _run(dp, params, state, opt_state, batch)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["head"]["w"]), np.asarray(p2["head"]["w"]), atol=1e-6
    )


def test_spatial_train_step_matches_single_device(tiny_setup):
    ds, bundle, opt, params, state, opt_state, batch = tiny_setup
    kw = dict(padded_shape=(20, 28), grid_shape=(16, 24))
    single = make_train_step(bundle, ds.normalizer, opt, **kw)
    p1, m1 = _run(single, params, state, opt_state, batch)

    mesh = make_mesh(dp=2, lat=2, lon=2)
    spatial = make_spatial_train_step(bundle, ds.normalizer, opt, mesh, **kw)
    p2, m2 = _run(spatial, params, state, opt_state, batch)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(p1["head"]["w"]), np.asarray(p2["head"]["w"]), atol=1e-5
    )


def test_halo_exchange_geo_cyclic_lon(rng):
    """Geo-topology halos: cyclic in longitude (ring wrap), zero toward the
    poles — matches a manual roll-based construction on the gathered grid."""
    from nasa_niswan_tpu.parallel.halo import halo_exchange_geo

    mesh = make_mesh(dp=2, lat=2, lon=2)
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    pad = 2

    fn = jax.shard_map(
        lambda xl: halo_exchange_geo(xl, pad),
        mesh=mesh,
        in_specs=(P("dp", "lat", "lon", None),),
        out_specs=P("dp", "lat", "lon", None),
    )
    got = np.asarray(jax.jit(fn)(x))
    # local tiles are (8/2, 12/2) = (4, 6); haloed tiles (8, 10); gathered
    # output interleaves halos, so check one tile directly: device tile
    # (lat=0, lon=0) holds rows 0..3, cols 0..5 of the global grid
    tile = got[:1, : 4 + 2 * pad, : 6 + 2 * pad, :]  # dp shard 0, tile (0,0)
    # lon halo: left neighbor on the ring is the LAST lon shard (cols 6..11)
    np.testing.assert_allclose(tile[0, pad : pad + 4, :pad], x[0, 0:4, 12 - pad : 12])
    np.testing.assert_allclose(tile[0, pad : pad + 4, pad : pad + 6], x[0, 0:4, 0:6])
    # lat halo at the pole edge is zero
    np.testing.assert_allclose(tile[0, :pad, pad : pad + 6], 0.0)


def test_rollout_with_spatial_input_sharding(rng):
    """The compiled rollout runs unchanged with spatially sharded forcings:
    GSPMD propagates (dp, lat, lon) shardings through preprocessing, the
    scan, and the taps — the decadal sharded-rollout path (config #5)."""
    from jax.sharding import NamedSharding

    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn

    cfg = ConvLSTMConfig(5, (4,), (3,))
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    norm = Normalizer(
        x_mean=np.zeros(5, np.float32), x_std=np.ones(5, np.float32),
        y_mean=0.0, y_std=2.0,
    )
    rollout = make_rollout_fn(cfg, norm, padded_shape=(20, 28),
                              grid_shape=(16, 24))
    forcings = rng.standard_normal((2, 4, 5, 16, 24)).astype(np.float32)

    want, _ = rollout(params, forcings)

    mesh = make_mesh(dp=2, lat=2, lon=2)
    sharded = jax.device_put(
        forcings, NamedSharding(mesh, P("dp", None, None, "lat", "lon"))
    )
    got, _ = rollout(params, sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_manual_sharded_rollout_parity_and_continuation(rng):
    """The explicit-halo shard_map rollout (parallel/spatial.
    make_sharded_rollout_fn) matches the single-device compiled rollout
    bit-for-bit, including chunked state continuation — the hand-tuned
    serving path for the decadal config #5."""
    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.parallel.spatial import make_sharded_rollout_fn
    from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn

    cfg = ConvLSTMConfig(5, (8, 8), (5, 3))
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    norm = Normalizer(
        x_mean=np.zeros(5, np.float32), x_std=np.ones(5, np.float32),
        y_mean=0.5, y_std=2.0,
    )
    grid, padded = (24, 36), (32, 44)
    f1 = rng.standard_normal((2, 6, 5, *grid)).astype(np.float32)
    f2 = rng.standard_normal((2, 6, 5, *grid)).astype(np.float32)

    ref = make_rollout_fn(cfg, norm, padded_shape=padded, grid_shape=grid)
    want1, s_ref = ref(params, f1)
    want2, _ = ref(params, f2, s_ref)

    mesh = make_mesh(dp=2, lat=2, lon=2)
    sh = make_sharded_rollout_fn(
        cfg, norm, mesh, padded_shape=padded, grid_shape=grid
    )
    got1, s_sh = sh(params, f1)
    got2, _ = sh(params, f2, s_sh)

    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-5)


def test_sharded_rollout_pallas2_cell_parity(rng):
    """The fused pallas2 cell composed with explicit halo exchange inside
    shard_map (margins repurposed as halo columns) matches BOTH the XLA
    sharded path and the single-device rollout, including chunked state
    continuation (round-2 verdict item #3).  Interpret-mode kernel on the
    CPU mesh; the same composition runs compiled on TPU."""
    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.parallel.spatial import make_sharded_rollout_fn
    from nasa_niswan_tpu.rollout.autoregressive import make_rollout_fn

    cfg = ConvLSTMConfig(5, (8, 8), (5, 3))
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    norm = Normalizer(
        x_mean=np.zeros(5, np.float32), x_std=np.ones(5, np.float32),
        y_mean=0.5, y_std=2.0,
    )
    # odd local lon tiles: 42/2 = 21 cols/shard (the canonical 154/2 = 77
    # case is odd too); wp rounds to 16 internally.  Rows chosen so the
    # halo-extended local tile (28/2 + 2p = 18 or 16) row-tiles cleanly —
    # the kernel path engages rather than the small-shape fallback.
    grid, padded = (20, 34), (28, 42)
    f1 = rng.standard_normal((2, 5, 5, *grid)).astype(np.float32)
    f2 = rng.standard_normal((2, 5, 5, *grid)).astype(np.float32)

    ref = make_rollout_fn(
        cfg, norm, padded_shape=padded, grid_shape=grid, cell_impl=None
    )
    want1, s_ref = ref(params, f1)
    want2, _ = ref(params, f2, s_ref)

    mesh = make_mesh(dp=2, lat=2, lon=2)
    sh = make_sharded_rollout_fn(
        cfg, norm, mesh, padded_shape=padded, grid_shape=grid,
        cell_impl="pallas2",
    )
    got1, s_sh = sh(params, f1)
    got2, _ = sh(params, f2, s_sh)

    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-5)


def test_init_distributed_single_process():
    """parallel/mesh.init_distributed drives jax.distributed.initialize for
    real (single-process coordinator) — in a subprocess, since distributed
    init is once-per-process global state.  Covers the multi-host launch
    helper (SURVEY §2.5 multi-host row) to the extent one host allows."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    code = f"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from nasa_niswan_tpu.parallel.mesh import init_distributed, make_mesh
idx = init_distributed("localhost:{port}", num_processes=1, process_id=0)
assert idx == 0, idx
assert jax.process_count() == 1
mesh = make_mesh(dp=2, devices=jax.devices()[:2])
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
x = jax.device_put(np.ones((4, 3), np.float32), NamedSharding(mesh, P("dp")))
assert float(jnp.sum(x)) == 12.0
print("DIST-OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "DIST-OK" in out.stdout, (out.stdout, out.stderr)


def test_dp_shardmap_matches_gspmd(tiny_setup):
    """The manual shard_map DP step — the path that runs the fused pallas2
    kernels multi-chip (GSPMD treats pallas_call as opaque) — must match
    the GSPMD DP step (XLA cell — gspmd_safe_bundle forbids Pallas there):
    loss/R² exactly, params to SGD-conditioned f32 reduction-order
    tolerance, for BOTH cell impls (pallas2 runs the fused whole-scan BPTT
    inside the shard)."""
    import optax

    from nasa_niswan_tpu.parallel.dp import make_dp_train_step_shardmap

    ds, _, _, _, _, _, batch = tiny_setup
    kw = dict(padded_shape=(20, 28), grid_shape=(16, 24))
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    opt = optax.sgd(1e-2)  # Adam's step-1 update is sign-like for
    # near-zero grads, amplifying f32 reduction noise; SGD keeps the
    # param comparison proportional to the actual grad difference
    bundle_ref = build_model(
        "LSTM-dpm", in_channels=5, hidden_channels=(4, 4),
        kernel_sizes=(5, 3), cell_impl="xla",
    )
    params, state = bundle_ref.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    gspmd = make_dp_train_step(bundle_ref, ds.normalizer, opt, mesh, **kw)
    pg, mg = _run(gspmd, params, state, opt_state, batch)
    for impl, remat, tol in (("xla", False, 1e-7), ("pallas2", True, 1e-7)):
        bundle = build_model(
            "LSTM-dpm", in_channels=5, hidden_channels=(4, 4),
            kernel_sizes=(5, 3), cell_impl=impl, remat=remat,
        )
        manual = make_dp_train_step_shardmap(
            bundle, ds.normalizer, opt, mesh, **kw
        )
        pm, mm = _run(manual, params, state, opt_state, batch)
        assert float(mg["loss"]) == pytest.approx(float(mm["loss"]), abs=1e-6)
        assert float(mg["r2"]) == pytest.approx(float(mm["r2"]), abs=1e-5)
        for a, b in zip(jax.tree.leaves(pg), jax.tree.leaves(pm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)


def test_sharded_multitracer_rollout_parity_and_continuation(rng):
    """BASELINE config #5 composed end to end: S species unrolled at trace
    time INSIDE one jitted program with the grid sharded over the mesh.
    Must match (a) the per-species sharded rollouts and (b) the unsharded
    multitracer rollout, including chunked carry continuation."""
    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.parallel.spatial import (
        make_sharded_multitracer_rollout,
        make_sharded_rollout_fn,
    )
    from nasa_niswan_tpu.rollout.multitracer import (
        make_multitracer_rollout,
        stack_params,
    )

    cfg = ConvLSTMConfig(5, (8, 8), (5, 3))
    S = 2
    params_list = [
        convlstm_init(jax.random.PRNGKey(i), cfg) for i in range(S)
    ]
    norms = [
        Normalizer(
            x_mean=np.zeros(5, np.float32),
            x_std=np.ones(5, np.float32) * (1.0 + 0.2 * i),
            y_mean=0.3 * i, y_std=1.5 + i,
        )
        for i in range(S)
    ]
    grid, padded = (24, 36), (32, 44)
    f1 = rng.standard_normal((S, 2, 4, 5, *grid)).astype(np.float32)
    f2 = rng.standard_normal((S, 2, 4, 5, *grid)).astype(np.float32)

    mesh = make_mesh(dp=2, lat=2, lon=2)
    stacked = stack_params(params_list)
    mt = make_sharded_multitracer_rollout(
        cfg, norms, mesh, padded_shape=padded, grid_shape=grid
    )
    got1, st = mt(stacked, f1)
    got2, _ = mt(stacked, f2, st)
    assert got1.shape == (S, 2, 4, *grid)

    # (a) per-species sharded rollouts
    for s in range(S):
        sh = make_sharded_rollout_fn(
            cfg, norms[s], mesh, padded_shape=padded, grid_shape=grid
        )
        w1, ss = sh(params_list[s], f1[s])
        w2, _ = sh(params_list[s], f2[s], ss)
        np.testing.assert_allclose(np.asarray(got1[s]), np.asarray(w1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got2[s]), np.asarray(w2),
                                   atol=1e-5)

    # (b) the unsharded multitracer program
    ref = make_multitracer_rollout(
        cfg, norms, padded_shape=padded, grid_shape=grid, cell_impl=None
    )
    r1, rst = ref(stacked, jnp.asarray(f1))
    r2, _ = ref(stacked, jnp.asarray(f2), rst)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(r2), atol=1e-5)


def test_sharded_multitracer_shared_met_parity(rng):
    """The de-duplicated-forcings sharded multitracer (shared met tensor,
    per-step emission concat inside the shard_map body) matches both the
    per-species-forcings sharded program and the unsharded shared-met
    program, incl. carry continuation."""
    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.parallel.spatial import (
        make_sharded_multitracer_rollout_shared,
    )
    from nasa_niswan_tpu.rollout.multitracer import (
        make_multitracer_rollout_shared,
        stack_params,
    )

    cfg = ConvLSTMConfig(5, (8, 8), (5, 3))
    S = 2
    params_list = [
        convlstm_init(jax.random.PRNGKey(i), cfg) for i in range(S)
    ]
    # met stats are SHARED across species (same variables; species JSONs
    # differ only in the src/conc slots) — the shared-met program relies
    # on that and uses species 0's met constants
    met_mean = np.linspace(-0.1, 0.2, 4).astype(np.float32)
    met_std = np.linspace(0.9, 1.3, 4).astype(np.float32)
    norms = [
        Normalizer(
            x_mean=np.concatenate([met_mean, [0.05 * (i + 1)]]).astype(
                np.float32
            ),
            x_std=np.concatenate([met_std, [1.0 + 0.3 * i]]).astype(
                np.float32
            ),
            y_mean=0.2 * i, y_std=1.0 + i,
        )
        for i in range(S)
    ]
    grid, padded = (24, 36), (32, 44)
    met1 = rng.standard_normal((2, 4, 4, *grid)).astype(np.float32)
    met2 = rng.standard_normal((2, 4, 4, *grid)).astype(np.float32)
    em1 = rng.standard_normal((S, 2, 4, *grid)).astype(np.float32)
    em2 = rng.standard_normal((S, 2, 4, *grid)).astype(np.float32)

    mesh = make_mesh(dp=2, lat=2, lon=2)
    stacked = stack_params(params_list)
    sh = make_sharded_multitracer_rollout_shared(
        cfg, norms, mesh, padded_shape=padded, grid_shape=grid
    )
    got1, st = sh(stacked, met1, em1)
    got2, _ = sh(stacked, met2, em2, st)

    # (a) unsharded shared-met program
    ref = make_multitracer_rollout_shared(
        cfg, norms, padded_shape=padded, grid_shape=grid, cell_impl=None
    )
    r1, rst = ref(stacked, jnp.asarray(met1), jnp.asarray(em1))
    r2, _ = ref(stacked, jnp.asarray(met2), jnp.asarray(em2), rst)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(r2), atol=1e-5)

    # per-species-forcings equivalence is covered by
    # test_sharded_multitracer_rollout_parity_and_continuation (both match
    # the unsharded programs, which match each other on identical inputs)


def test_sharded_feedback_rollout_matches_closed_loop(rng):
    """The sharded CLOSED-LOOP (seq2seq feedback) chunk — conv halos by ring
    ppermute, per-step feedback rebuilt from an all_gather of the tap tiles
    — matches evalx's single-device closed loop bit-for-bit in contract:
    predictions, the final (h, c) carry, AND the prev_norm feedback frame,
    including continuation across chunk boundaries."""
    from nasa_niswan_tpu.data.dataset import Normalizer
    from nasa_niswan_tpu.evalx.evaluate import (
        make_closed_loop_chunk,
        run_chunked_episode_carry,
        zero_closed_loop_state,
    )
    from nasa_niswan_tpu.parallel.spatial import make_sharded_feedback_rollout

    mesh = make_mesh(dp=2, lat=2, lon=2)
    grid, padded = (12, 20), (16, 24)
    cfg = ConvLSTMConfig(4, (4, 3), (3, 3))  # 3 met channels + feedback
    params = convlstm_init(jax.random.PRNGKey(3), cfg)
    norm = Normalizer(
        x_mean=np.linspace(-0.2, 0.1, 3).astype(np.float32),
        x_std=np.linspace(0.8, 1.2, 3).astype(np.float32),
        y_mean=0.3, y_std=2.0,
    )
    frames = rng.standard_normal((8, 3, *grid)).astype(np.float32)
    prev0 = rng.standard_normal((1, *grid)).astype(np.float32)

    ref_chunk = make_closed_loop_chunk(
        cfg, norm, padded_shape=padded, grid_shape=grid
    )
    want, (st_ref, prev_ref) = run_chunked_episode_carry(
        lambda st, pv, x: ref_chunk(params, st, pv, x),
        [zero_closed_loop_state(cfg, padded), prev0], frames, 4,
    )

    sh_chunk = make_sharded_feedback_rollout(
        cfg, norm, mesh, padded_shape=padded, grid_shape=grid
    )
    got, (st_sh, prev_sh) = run_chunked_episode_carry(
        lambda st, pv, x: sh_chunk(params, st, pv, x),
        [zero_closed_loop_state(cfg, padded), prev0], frames, 4,
    )

    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(prev_sh), np.asarray(prev_ref), atol=5e-5
    )
    for (h1, c1), (h2, c2) in zip(st_sh, st_ref):
        np.testing.assert_allclose(
            np.asarray(h1), np.asarray(h2), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(c1), np.asarray(c2), atol=5e-5
        )
