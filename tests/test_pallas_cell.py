"""Fused Pallas ConvLSTM cell: semantics vs the XLA reference cell.

On the CPU CI mesh the kernel runs in Pallas interpreter mode (bit-accurate
semantics, no Mosaic compilation); the compiled path is exercised on real
TPU by bench.py / the driver's entry check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nasa_niswan_tpu.ops.convlstm_pallas import _cell_reference, fused_cell_forward


@pytest.mark.parametrize(
    "B,H,W,C,hid,k",
    [(1, 16, 24, 9, 8, 3), (2, 20, 28, 13, 16, 5), (1, 10, 12, 5, 4, 1)],
)
def test_fused_cell_matches_reference(rng, B, H, W, C, hid, k):
    xh = rng.standard_normal((B, H, W, C)).astype(np.float32)
    c = rng.standard_normal((B, H, W, hid)).astype(np.float32)
    w = (rng.standard_normal((k, k, C, 4 * hid)) * 0.1).astype(np.float32)
    b = rng.standard_normal((4 * hid,)).astype(np.float32)
    h1, c1 = fused_cell_forward(xh, c, w, b, k, interpret=True)
    h2, c2 = _cell_reference(xh, c, w, b, k)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_custom_vjp_matches_xla_grads(rng):
    """Gradients of the pallas cell (XLA-backed custom VJP) must equal the
    reference cell's gradients."""
    import nasa_niswan_tpu.ops.convlstm_pallas as cp

    B, H, W, C, hid, k = 1, 8, 12, 5, 4, 3
    xh = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B, H, W, hid)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((k, k, C, 4 * hid)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4 * hid,)).astype(np.float32))

    # interpret-mode pallas forward inside the custom_vjp
    orig = cp.fused_cell_forward
    cp_fwd = lambda *a, **kw: orig(*a, interpret=True, **kw)
    cp.fused_cell_forward = cp_fwd
    try:
        def loss_pallas(xh, c, w, b):
            h, cn = cp._fused_cell(xh, c, w, b, k)
            return jnp.sum(h**2) + jnp.sum(cn * 0.5)

        def loss_ref(xh, c, w, b):
            h, cn = _cell_reference(xh, c, w, b, k)
            return jnp.sum(h**2) + jnp.sum(cn * 0.5)

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(xh, c, w, b)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xh, c, w, b)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)
    finally:
        cp.fused_cell_forward = orig


def test_full_model_with_pallas_cell(rng):
    """cell_impl='pallas' through convlstm_apply matches the XLA path
    (auto-interpret off-TPU)."""
    from nasa_niswan_tpu.models.convlstm import (
        ConvLSTMConfig,
        convlstm_apply,
        convlstm_init,
    )

    x = rng.standard_normal((1, 3, 16, 24, 5)).astype(np.float32)
    base = ConvLSTMConfig(5, (4, 4), (3, 3))
    params = convlstm_init(jax.random.PRNGKey(0), base)
    want = convlstm_apply(params, x, base)
    cfg = ConvLSTMConfig(5, (4, 4), (3, 3), cell_impl="pallas")
    got = convlstm_apply(params, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
