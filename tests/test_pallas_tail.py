"""Fused tail kernel (last two ConvLSTM cells in one pallas_call,
ops/convlstm_tail.py) vs the per-layer fused kernels.  Interpreter mode on
the CPU CI mesh; compiled-path A/B runs on real TPU via
scripts/bench_cell.py (pallas2t / pallas2st specs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nasa_niswan_tpu.ops.convlstm_pallas2 import (
    fused_cell_forward_v2,
    pad_cols,
    padded_cols,
)
from nasa_niswan_tpu.ops.convlstm_tail import (
    fused_tail_forward,
    tail_reference,
)


def _mk_tail(rng, B, H, W, Cx2, hid2, hid3, k2, k3, o):
    wp = padded_cols(W, o)
    f = lambda ch: pad_cols(
        rng.standard_normal((B, H, W, ch)).astype(np.float32), o, wp
    )
    x2, h2, c2, h3, c3 = f(Cx2), f(hid2), f(hid2), f(hid3), f(hid3)
    w2 = (rng.standard_normal((k2, k2, Cx2 + hid2, 4 * hid2)) * 0.1).astype(
        np.float32
    )
    b2 = rng.standard_normal((4 * hid2,)).astype(np.float32)
    w3 = (rng.standard_normal((k3, k3, hid2 + hid3, 4 * hid3)) * 0.1).astype(
        np.float32
    )
    b3 = rng.standard_normal((4 * hid3,)).astype(np.float32)
    return x2, h2, c2, h3, c3, w2, b2, w3, b3, wp


def _per_layer(x2, h2, c2, h3, c3, w2, b2, w3, b3, k2, k3, o, W, dt):
    xh2 = jnp.concatenate(
        [jnp.asarray(x2).astype(dt), jnp.asarray(h2).astype(dt)], axis=-1
    )
    h2n, c2n = fused_cell_forward_v2(
        xh2, jnp.asarray(c2), jnp.asarray(w2).astype(dt), b2, k2, o, W,
        interpret=True,
    )
    xh3 = jnp.concatenate([h2n.astype(dt), jnp.asarray(h3).astype(dt)], -1)
    h3n, c3n = fused_cell_forward_v2(
        xh3, jnp.asarray(c3), jnp.asarray(w3).astype(dt), b3, k3, o, W,
        interpret=True,
    )
    return h2n, c2n, h3n, c3n


@pytest.mark.parametrize(
    "B,H,W,Cx2,hid2,hid3,k2,k3",
    [
        (1, 20, 24, 8, 8, 4, 3, 3),   # 2 row tiles — tile-edge halo
        (1, 30, 24, 8, 8, 4, 3, 3),   # 3 tiles — interior tile both sides
        (2, 16, 28, 12, 8, 8, 5, 3),  # mixed kernels, batch grid
        (1, 20, 24, 8, 8, 4, 3, 1),   # k3=1: zero tail halo
    ],
)
@pytest.mark.parametrize("dt", [np.float32, jnp.bfloat16])
def test_tail_matches_per_layer_kernels(rng, B, H, W, Cx2, hid2, hid3,
                                        k2, k3, dt):
    o = max(k2 // 2, k3 // 2, 1)
    x2, h2, c2, h3, c3, w2, b2, w3, b3, wp = _mk_tail(
        rng, B, H, W, Cx2, hid2, hid3, k2, k3, o
    )
    want = _per_layer(x2, h2, c2, h3, c3, w2, b2, w3, b3, k2, k3, o, W, dt)
    got = fused_tail_forward(
        jnp.asarray(x2), jnp.asarray(h2), jnp.asarray(c2),
        jnp.asarray(h3), jnp.asarray(c3),
        jnp.asarray(w2).astype(dt), jnp.asarray(b2),
        jnp.asarray(w3).astype(dt), jnp.asarray(b3),
        k2, k3, o, W, interpret=True,
    )
    for g, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=1e-6)
    # margins stay hard zero
    assert np.all(np.asarray(got[0])[:, :, :o] == 0)
    assert np.all(np.asarray(got[2])[:, :, o + W :] == 0)


def test_tail_matches_reference_composition(rng):
    B, H, W, Cx2, hid2, hid3, k2, k3 = 1, 20, 24, 6, 8, 4, 3, 3
    o = 2  # wider margin than either k needs (mixed-kernel stacks)
    x2, h2, c2, h3, c3, w2, b2, w3, b3, wp = _mk_tail(
        rng, B, H, W, Cx2, hid2, hid3, k2, k3, o
    )
    want = tail_reference(
        *map(jnp.asarray, (x2, h2, c2, h3, c3, w2, b2, w3, b3)),
        k2, k3, o, W,
    )
    got = fused_tail_forward(
        *map(jnp.asarray, (x2, h2, c2, h3, c3, w2, b2, w3, b3)),
        k2, k3, o, W, interpret=True,
    )
    for g, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=1e-5)


@pytest.mark.parametrize("n_layers", [2, 3])
@pytest.mark.parametrize("split", [False, True])
def test_full_model_fuse_tail(rng, n_layers, split):
    """convlstm_apply(fuse_tail=True) matches the per-layer pallas2 path —
    taps, state continuation, 2-layer (tail IS the whole stack) and
    3-layer stacks, composed with split_xh."""
    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
    )

    hidden = (4, 4) if n_layers == 2 else (6, 4, 4)
    ks = (5, 3) if n_layers == 2 else (5, 3, 3)
    x = rng.standard_normal((1, 3, 20, 24, 5)).astype(np.float32)
    base = ConvLSTMConfig(5, hidden, ks, cell_impl="pallas2")
    fused = ConvLSTMConfig(
        5, hidden, ks, cell_impl="pallas2", fuse_tail=True, split_xh=split
    )
    params = convlstm_init(jax.random.PRNGKey(0), base)
    want, want_taps, want_state = convlstm_apply(
        params, x, base, return_per_step=True, return_state=True
    )
    got, got_taps, got_state = convlstm_apply(
        params, x, fused, return_per_step=True, return_state=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_taps), np.asarray(want_taps), atol=1e-6
    )
    for (hw, cw), (hg, cg) in zip(want_state, got_state):
        np.testing.assert_allclose(np.asarray(hg), np.asarray(hw), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cg), np.asarray(cw), atol=1e-6)
    # continuation across chunks
    x2 = rng.standard_normal((1, 2, 20, 24, 5)).astype(np.float32)
    want2 = convlstm_apply(params, x2, base, initial_state=want_state)
    got2 = convlstm_apply(params, x2, fused, initial_state=got_state)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-6)


def test_tail_grads_match_per_layer(rng):
    """Gradients through the fused tail's custom VJP (reference-composition
    backward) equal autodiff through the per-layer custom VJPs."""
    import nasa_niswan_tpu.ops.convlstm_pallas2 as cp2
    from nasa_niswan_tpu.ops.convlstm_tail import _fused_tail

    B, H, W, Cx2, hid2, hid3, k2, k3 = 1, 10, 12, 5, 4, 4, 3, 3
    o = 1
    x2, h2, c2, h3, c3, w2, b2, w3, b3, wp = _mk_tail(
        rng, B, H, W, Cx2, hid2, hid3, k2, k3, o
    )
    args = tuple(map(jnp.asarray, (x2, h2, c2, h3, c3, w2, b2, w3, b3)))

    def loss_tail(*a):
        h2n, c2n, h3n, c3n = _fused_tail(*a, k2, k3, o, W)
        return (
            jnp.sum(h3n**2) + jnp.sum(c3n * 0.5)
            + jnp.sum(h2n * 0.25) + jnp.sum(c2n * 0.125)
        )

    def loss_layers(x2, h2, c2, h3, c3, w2, b2, w3, b3):
        xh2 = jnp.concatenate([x2, h2], axis=-1)
        h2n, c2n = cp2._fused_cell_v2(xh2, c2, w2, b2, k2, o, W)
        xh3 = jnp.concatenate([h2n, h3], axis=-1)
        h3n, c3n = cp2._fused_cell_v2(xh3, c3, w3, b3, k3, o, W)
        return (
            jnp.sum(h3n**2) + jnp.sum(c3n * 0.5)
            + jnp.sum(h2n * 0.25) + jnp.sum(c2n * 0.125)
        )

    g1 = jax.grad(loss_tail, argnums=tuple(range(9)))(*args)
    g2 = jax.grad(loss_layers, argnums=tuple(range(9)))(*args)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-5)
