"""Second-gen fused Pallas ConvLSTM cell (padded-column layout) vs the XLA
reference cell.  Interpreter mode on the CPU CI mesh; the compiled path is
exercised on real TPU by bench.py / scripts/bench_cell.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nasa_niswan_tpu.ops.convlstm_pallas2 import (
    _cell_reference_v2,
    col_margin,
    fused_cell_forward_v2,
    pad_cols,
    padded_cols,
)


def _mk(rng, B, H, W, C, hid, k, o):
    wp = padded_cols(W, o)
    xh = pad_cols(rng.standard_normal((B, H, W, C)).astype(np.float32), o, wp)
    c = pad_cols(rng.standard_normal((B, H, W, hid)).astype(np.float32), o, wp)
    w = (rng.standard_normal((k, k, C, 4 * hid)) * 0.1).astype(np.float32)
    b = rng.standard_normal((4 * hid,)).astype(np.float32)
    return xh, c, w, b, wp


@pytest.mark.parametrize(
    "B,H,W,C,hid,k",
    [(1, 16, 24, 9, 8, 3), (2, 20, 28, 13, 16, 5), (1, 10, 12, 5, 4, 1)],
)
def test_v2_matches_reference(rng, B, H, W, C, hid, k):
    o = max(k // 2, 1)
    xh, c, w, b, wp = _mk(rng, B, H, W, C, hid, k, o)
    h1, c1 = fused_cell_forward_v2(xh, c, w, b, k, o, W, interpret=True)
    h2, c2 = _cell_reference_v2(xh, c, w, b, k, o, W)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_v2_reference_matches_plain_cell_on_valid_cols(rng):
    """The margin-masked padded-column reference must agree with the plain
    cell on the valid columns (the margins ARE the SAME zero padding)."""
    from nasa_niswan_tpu.ops.convlstm_pallas import _cell_reference

    B, H, W, C, hid, k = 1, 12, 20, 7, 8, 3
    o = 2  # larger than k//2, as in a mixed-kernel stack
    xh_std = rng.standard_normal((B, H, W, C)).astype(np.float32)
    c_std = rng.standard_normal((B, H, W, hid)).astype(np.float32)
    w = (rng.standard_normal((k, k, C, 4 * hid)) * 0.1).astype(np.float32)
    b = rng.standard_normal((4 * hid,)).astype(np.float32)
    wp = padded_cols(W, o)
    h2, c2 = _cell_reference_v2(
        pad_cols(xh_std, o, wp), pad_cols(c_std, o, wp), w, b, k, o, W
    )
    h1, c1 = _cell_reference(xh_std, c_std, w, b, k)
    np.testing.assert_allclose(
        np.asarray(h2)[:, :, o : o + W], np.asarray(h1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c2)[:, :, o : o + W], np.asarray(c1), atol=1e-5
    )
    # margins stay hard zero
    assert np.all(np.asarray(h2)[:, :, :o] == 0)
    assert np.all(np.asarray(h2)[:, :, o + W :] == 0)


def test_v2_xg_mode_matches_reference(rng):
    """Hoisted-input-conv mode: kernel consumes precomputed input gates."""
    B, H, W, Cx, hid, k = 1, 16, 24, 6, 8, 3
    o = k // 2
    wp = padded_cols(W, o)
    from nasa_niswan_tpu.ops.conv import conv2d

    x = pad_cols(rng.standard_normal((B, H, W, Cx)).astype(np.float32), o, wp)
    h = pad_cols(rng.standard_normal((B, H, W, hid)).astype(np.float32), o, wp)
    c = pad_cols(rng.standard_normal((B, H, W, hid)).astype(np.float32), o, wp)
    wx = (rng.standard_normal((k, k, Cx, 4 * hid)) * 0.1).astype(np.float32)
    wh = (rng.standard_normal((k, k, hid, 4 * hid)) * 0.1).astype(np.float32)
    b = rng.standard_normal((4 * hid,)).astype(np.float32)
    xg = conv2d(jnp.asarray(x), jnp.asarray(wx), padding=o)

    h1, c1 = fused_cell_forward_v2(h, c, wh, b, k, o, W, xg, interpret=True)
    # reference: full concat cell, masked
    xh = jnp.concatenate([jnp.asarray(x), jnp.asarray(h)], axis=-1)
    w_full = np.concatenate([wx, wh], axis=2)
    h2, c2 = _cell_reference_v2(xh, c, w_full, b, k, o, W)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_v2_custom_vjp_matches_xla_grads(rng):
    import nasa_niswan_tpu.ops.convlstm_pallas2 as cp2

    B, H, W, C, hid, k = 1, 8, 12, 5, 4, 3
    o = k // 2
    xh, c, w, b, wp = _mk(rng, B, H, W, C, hid, k, o)
    xh, c, w, b = map(jnp.asarray, (xh, c, w, b))

    orig = cp2.fused_cell_forward_v2
    cp2.fused_cell_forward_v2 = lambda *a, **kw: orig(*a, interpret=True, **kw)
    try:
        def loss_pallas(xh, c, w, b):
            h, cn = cp2._fused_cell_v2(xh, c, w, b, k, o, W)
            return jnp.sum(h**2) + jnp.sum(cn * 0.5)

        def loss_ref(xh, c, w, b):
            h, cn = cp2._cell_reference_v2(xh, c, w, b, k, o, W)
            return jnp.sum(h**2) + jnp.sum(cn * 0.5)

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(xh, c, w, b)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xh, c, w, b)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)
    finally:
        cp2.fused_cell_forward_v2 = orig


@pytest.mark.parametrize("hoist", [False, True])
def test_full_model_with_pallas2_cell(rng, hoist):
    """cell_impl='pallas2' through convlstm_apply matches the XLA path,
    including per-step taps, state continuation, and the hoisted mode."""
    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
    )

    x = rng.standard_normal((1, 3, 16, 24, 5)).astype(np.float32)
    base = ConvLSTMConfig(5, (4, 4), (5, 3))
    params = convlstm_init(jax.random.PRNGKey(0), base)
    want, want_taps, want_state = convlstm_apply(
        params, x, base, return_per_step=True, return_state=True,
        precompute_input_conv=hoist,
    )
    cfg = ConvLSTMConfig(5, (4, 4), (5, 3), cell_impl="pallas2")
    got, got_taps, got_state = convlstm_apply(
        params, x, cfg, return_per_step=True, return_state=True,
        precompute_input_conv=hoist,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_taps), np.asarray(want_taps), atol=1e-5
    )
    # continuation: feed the returned (padded-column) state back in
    x2 = rng.standard_normal((1, 2, 16, 24, 5)).astype(np.float32)
    want2 = convlstm_apply(params, x2, base, initial_state=want_state)
    got2 = convlstm_apply(params, x2, cfg, initial_state=got_state)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-5)
    # and a standard-layout state must be accepted too
    got3 = convlstm_apply(params, x2, cfg, initial_state=want_state)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want2), atol=1e-5)


def test_full_model_with_pallas2_tuple_inputs(rng):
    """Tuple x_parts (the multitracer shared-met layout) through the
    pallas2 path: per-part padded-column conversion + in-scan concat must
    match the XLA path on the channel-concatenated input."""
    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
    )

    met = rng.standard_normal((1, 3, 16, 24, 4)).astype(np.float32)
    emis = rng.standard_normal((1, 3, 16, 24, 1)).astype(np.float32)
    full = np.concatenate([met, emis], axis=-1)
    base = ConvLSTMConfig(5, (4, 4), (5, 3))
    cfg = ConvLSTMConfig(5, (4, 4), (5, 3), cell_impl="pallas2")
    params = convlstm_init(jax.random.PRNGKey(0), base)

    want, want_state = convlstm_apply(
        params, full, base, return_state=True
    )
    got, got_state = convlstm_apply(
        params, (jnp.asarray(met), jnp.asarray(emis)), cfg, return_state=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # continuation across chunks with tuple inputs
    met2 = rng.standard_normal((1, 2, 16, 24, 4)).astype(np.float32)
    emis2 = rng.standard_normal((1, 2, 16, 24, 1)).astype(np.float32)
    want2 = convlstm_apply(
        params, np.concatenate([met2, emis2], -1), base,
        initial_state=want_state,
    )
    got2 = convlstm_apply(
        params, (jnp.asarray(met2), jnp.asarray(emis2)), cfg,
        initial_state=got_state,
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-5)


def test_bptt_scan_matches_xla_grads(rng):
    """The whole-scan BPTT (ops/convlstm_bptt.py — the pallas2+remat
    training path) must produce the same loss value AND parameter/input/
    state gradients as XLA autodiff through the plain cell.  The loss taps
    both the final pred and the returned carry, so every cotangent route
    (head crop, state crop, cross-layer, cross-step) is exercised."""
    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
    )

    x = jnp.asarray(rng.standard_normal((2, 4, 16, 24, 5)).astype(np.float32))
    base = ConvLSTMConfig(5, (4, 4), (5, 3), remat=True)
    bptt = ConvLSTMConfig(5, (4, 4), (5, 3), cell_impl="pallas2", remat=True)
    params = convlstm_init(jax.random.PRNGKey(0), base)
    state0 = [
        (
            jnp.asarray(rng.standard_normal((2, 16, 24, 4)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((2, 16, 24, 4)).astype(np.float32)),
        )
        for _ in range(2)
    ]

    def loss(cfg):
        def f(params, x, state0):
            pred, st = convlstm_apply(
                params, x, cfg, initial_state=state0, return_state=True
            )
            return (
                jnp.sum(pred**2)
                + sum(jnp.sum(h) + jnp.sum(c * c) for h, c in st)
            )

        return f

    v1, g1 = jax.value_and_grad(loss(base), argnums=(0, 1, 2))(
        params, x, state0
    )
    v2, g2 = jax.value_and_grad(loss(bptt), argnums=(0, 1, 2))(
        params, x, state0
    )
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )


def test_bptt_scan_zero_state_pred_only(rng):
    """BPTT grads with the default zero carry and a pred-only loss (the
    canonical train step, train/loop.py) match XLA autodiff."""
    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
    )

    x = jnp.asarray(rng.standard_normal((1, 3, 16, 24, 5)).astype(np.float32))
    base = ConvLSTMConfig(5, (4,), (3,), remat=True)
    bptt = ConvLSTMConfig(5, (4,), (3,), cell_impl="pallas2", remat=True)
    params = convlstm_init(jax.random.PRNGKey(0), base)

    g1 = jax.grad(lambda p: jnp.sum(convlstm_apply(p, x, base) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(convlstm_apply(p, x, bptt) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )


def test_cell_impl_auto_resolution(rng, monkeypatch):
    """cell_impl='auto' resolves at trace time: pallas2 at B<=4 on TPU,
    xla otherwise (measured crossover, docs/PERFORMANCE.md) — and both
    resolutions produce the XLA path's numbers."""
    import nasa_niswan_tpu.models.convlstm as mc

    x = jnp.asarray(rng.standard_normal((2, 3, 16, 24, 5)).astype(np.float32))
    base = ConvLSTMConfig = mc.ConvLSTMConfig(5, (4,), (3,))
    auto = mc.ConvLSTMConfig(5, (4,), (3,), cell_impl="auto")
    params = mc.convlstm_init(jax.random.PRNGKey(0), base)
    want = mc.convlstm_apply(params, x, base)

    # on CPU auto -> xla
    got = mc.convlstm_apply(params, x, auto)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # pretend we are on TPU: B<=4 must route to the pallas2 (padded-column)
    # path, whose interpret-mode result still matches
    monkeypatch.setattr(mc.jax, "default_backend", lambda: "tpu")
    seen = {}
    import nasa_niswan_tpu.ops.convlstm_pallas2 as cp2
    orig = cp2.fused_cell_forward_v2

    def spy(*a, **kw):
        seen["pallas2"] = True
        kw["interpret"] = True  # the faked backend would try to compile
        return orig(*a, **kw)

    monkeypatch.setattr(cp2, "fused_cell_forward_v2", spy)
    got2 = mc.convlstm_apply(params, x, auto)
    assert seen.get("pallas2"), "auto at B<=4 on TPU must pick pallas2"
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=1e-5)

    # B>4 stays on the XLA cell for forward-only traces
    seen.clear()
    x8 = jnp.asarray(rng.standard_normal((8, 2, 16, 24, 5)).astype(np.float32))
    mc.convlstm_apply(params, x8, auto)
    assert "pallas2" not in seen

    # ... but the TRAINING crossover differs: the fused BPTT backward wins
    # at every measured batch size, so auto_mode="train" keeps pallas2
    # through B=8 — ONLY when the whole-scan BPTT route can engage.  With
    # remat=False (here) pallas2 training would mean per-cell custom VJPs
    # (measured 3.7x slower, residual-stacking), so auto resolves xla:
    seen.clear()
    mc.convlstm_apply(params, x8, auto, auto_mode="train")
    assert "pallas2" not in seen, (
        "train-mode auto without the BPTT route must fall back to xla"
    )
    # same fallback when the route is blocked by the hoist
    auto_remat = mc.ConvLSTMConfig(
        5, (4,), (3,), cell_impl="auto", remat=True
    )
    import nasa_niswan_tpu.ops.convlstm_bptt as bptt

    class _RoutedBPTT(Exception):
        pass

    def bptt_spy(*a, **kw):
        raise _RoutedBPTT

    monkeypatch.setattr(bptt, "scan_cells_pallas2", bptt_spy)
    with pytest.raises(_RoutedBPTT):  # remat + no taps/hoist -> fused BPTT
        mc.convlstm_apply(params, x8, auto_remat, auto_mode="train")
    seen.clear()
    mc.convlstm_apply(  # hoist blocks the BPTT route -> xla, not pallas2
        params, x8, auto_remat, auto_mode="train", precompute_input_conv=True
    )
    assert "pallas2" not in seen
    assert mc.resolve_auto_impl(8, backend="tpu") == "xla"
    assert mc.resolve_auto_impl(8, backend="tpu", mode="train") == "pallas2"
    assert mc.resolve_auto_impl(9, backend="tpu", mode="train") == "xla"
    assert mc.resolve_auto_impl(1, backend="cpu", mode="train") == "xla"


@pytest.mark.parametrize(
    "B,H,W,C,hid,k",
    [(1, 16, 24, 9, 8, 3), (2, 20, 28, 13, 16, 5), (1, 10, 12, 5, 4, 1)],
)
def test_cell_grads_pallas_matches_xla_vjp(rng, B, H, W, C, hid, k):
    """The fused backward kernels (ops/convgrad_pallas.py) must reproduce
    XLA autodiff through the margin-masked reference cell: dxh on the valid
    columns (the Pallas path zeroes dxh margins — those cotangents feed
    structurally-zero pad columns), dc/dw/db everywhere."""
    from nasa_niswan_tpu.ops.convgrad_pallas import cell_grads_pallas

    o = max(k // 2, 1)
    xh, c, w, b, wp = _mk(rng, B, H, W, C, hid, k, o)
    dh = rng.standard_normal((B, H, wp, hid)).astype(np.float32)
    dc = rng.standard_normal((B, H, wp, hid)).astype(np.float32)

    _, vjp = jax.vjp(
        lambda xh_, c_, w_, b_: _cell_reference_v2(xh_, c_, w_, b_, k, o, W),
        jnp.asarray(xh), jnp.asarray(c), jnp.asarray(w), jnp.asarray(b),
    )
    dxh_r, dc_r, dw_r, db_r = vjp((jnp.asarray(dh), jnp.asarray(dc)))

    dxh_p, dc_p, dw_p, db_p = cell_grads_pallas(
        jnp.asarray(xh), jnp.asarray(c), jnp.asarray(dh), jnp.asarray(dc),
        jnp.asarray(w), jnp.asarray(b), k, o, W, interpret=True,
    )
    sl = np.s_[:, :, o : o + W]
    np.testing.assert_allclose(
        np.asarray(dxh_p)[sl], np.asarray(dxh_r)[sl], atol=2e-5
    )
    # dxh margins are hard zero (layout invariant)
    assert np.all(np.asarray(dxh_p)[:, :, :o] == 0)
    np.testing.assert_allclose(np.asarray(dc_p), np.asarray(dc_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r), atol=2e-4)


def test_bptt_bwd_impls_agree(rng):
    """bptt_bwd='fused' (Pallas backward kernels) and 'xla' (emit-gates
    replay + XLA conv grads) produce the same gradients through the full
    model, and both match plain XLA autodiff."""
    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
    )

    x = jnp.asarray(rng.standard_normal((2, 4, 16, 24, 5)).astype(np.float32))
    base = ConvLSTMConfig(5, (4, 4), (5, 3), remat=True)
    params = convlstm_init(jax.random.PRNGKey(0), base)

    def grads(cfg):
        return jax.grad(lambda p: jnp.sum(convlstm_apply(p, x, cfg) ** 2))(
            params
        )

    g_ref = grads(base)
    for impl in ("fused", "xla"):
        cfg = ConvLSTMConfig(
            5, (4, 4), (5, 3), cell_impl="pallas2", remat=True, bptt_bwd=impl
        )
        g = grads(cfg)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
            )


def test_bptt_fused_bwd_bf16_smoke(rng):
    """bf16 compute through the fused backward: grads finite and directionally
    consistent with the f32 path (loose tolerance — bf16 has ~3 decimal
    digits; this pins the dtype plumbing, not the numerics)."""
    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
    )

    x = jnp.asarray(rng.standard_normal((1, 3, 16, 24, 5)).astype(np.float32))
    params = convlstm_init(
        jax.random.PRNGKey(0), ConvLSTMConfig(5, (4,), (3,))
    )

    def grads(dtype):
        cfg = ConvLSTMConfig(
            5, (4,), (3,), cell_impl="pallas2", remat=True,
            compute_dtype=dtype,
        )
        return jax.grad(lambda p: jnp.sum(convlstm_apply(p, x, cfg) ** 2))(
            params
        )

    g16, g32 = grads("bfloat16"), grads("float32")
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 0.1


def test_bptt_fwd_xla_matches_fused(rng):
    """The hybrid seam: bptt_fwd='xla' (the XLA cell body running the
    whole-scan-BPTT forward) must walk the same loss/grads as the fused
    kernel forward — the production TPU default resolves to 'xla'
    (resolve_bptt_fwd), so this pins the two bodies to each other on the
    CPU suite too."""
    import dataclasses

    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
        resolve_bptt_fwd,
    )

    # policy resolution: explicit settings pass through; auto resolves
    # 'fused' off-TPU (kernel coverage) and 'xla' on TPU (measured faster)
    assert resolve_bptt_fwd("fused") == "fused"
    assert resolve_bptt_fwd("xla") == "xla"
    assert resolve_bptt_fwd("auto") in ("fused", "xla")

    x = jnp.asarray(rng.standard_normal((2, 4, 16, 24, 5)).astype(np.float32))
    base = ConvLSTMConfig(5, (4, 3), (5, 3), cell_impl="pallas2", remat=True)
    params = convlstm_init(jax.random.PRNGKey(1), base)

    def loss_grads(fwd):
        cfg = dataclasses.replace(base, bptt_fwd=fwd)
        f = lambda p: jnp.sum(convlstm_apply(p, x, cfg) ** 2)
        return jax.value_and_grad(f)(params)

    lf, gf = loss_grads("fused")
    lx, gx = loss_grads("xla")
    np.testing.assert_allclose(float(lx), float(lf), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_unroll_of_split():
    """_unroll_of: an int applies to both directions; a (primal, train)
    pair routes the serving unroll to the primal scan and the training
    unroll to the differentiated scans."""
    from nasa_niswan_tpu.ops.convlstm_bptt import _unroll_of

    assert _unroll_of(3, train=False) == 3
    assert _unroll_of(3, train=True) == 3
    assert _unroll_of((1, 2), train=False) == 1
    assert _unroll_of((1, 2), train=True) == 2


def test_residual_stacks_are_lane_packed(rng):
    """The BPTT residual carry stacks must stay PACKED to (T, B, H, wp*C):
    unpacked (T, B, H, wp, C) stacks re-incur the TPU's 128-lane channel
    padding — 2-8x the payload in HBM, which OOM'd the year campaign
    (docs/STATUS.md round-5 §38)."""
    from nasa_niswan_tpu.ops.convlstm_bptt import _scan_fwd

    T, B, H, WP = 3, 2, 8, 16
    ks = (3, 3)
    hid = (4, 3)
    from nasa_niswan_tpu.models.convlstm import ConvLSTMConfig, convlstm_init

    params = convlstm_init(jax.random.PRNGKey(0), ConvLSTMConfig(5, hid, ks))
    xs = jnp.asarray(
        rng.standard_normal((T, B, H, WP, 5)).astype(np.float32)
    )
    state0 = [
        (jnp.zeros((B, H, WP, h), jnp.float32),
         jnp.zeros((B, H, WP, h), jnp.float32))
        for h in hid
    ]
    _, res = _scan_fwd(params, xs, state0, ks, 1, WP - 2, "float32", 1)
    state_stack = res[3]
    for li, (hs, cs) in enumerate(state_stack):
        assert hs.shape == (T, B, H, WP * hid[li]), (li, hs.shape)
        assert cs.shape == (T, B, H, WP * hid[li]), (li, cs.shape)
