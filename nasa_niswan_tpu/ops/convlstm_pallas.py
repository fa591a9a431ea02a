"""Fused ConvLSTM cell — Pallas TPU kernel.

One cell step (the inner kernel of the whole framework; reference math at
model.py:216-231) is:

    gates = conv2d([x; h], W, pad k//2) + b        # MXU
    i,f,g,o = split(gates); c' = c*sig(f)+sig(i)*tanh(g); h' = sig(o)*tanh(c')

The XLA path materializes the 4H-channel ``gates`` tensor in HBM between
the conv and the elementwise block and pays per-op overheads that dominate
at batch 1 (measured ~0.75 ms/step on v5e for ~35 GFLOP).  This kernel
computes the conv as k*k shifted matmuls accumulating in a VMEM f32
scratch and applies the gate nonlinearities + state update in the same
kernel, so per step only x, h, c are read and h', c' written.

Layout: NHWC with channels on the lane axis.  The caller pre-concatenates
[x; h] and zero-pads columns and channels (SAME-conv semantics; channels
to a 128-lane multiple, free on the MXU).  Grid: (batch, row-tiles).  A
conv row tile needs k//2 halo rows from its neighbors; rather than
overlapping blocks (not expressible as a BlockSpec tiling) or manual HBM
DMA, the kernel takes the SAME array three times with shifted index maps —
previous / current / next row tile — and assembles the haloed slab in VMEM
with zero masking at the domain edges.  All streaming is Pallas-pipelined
standard block traffic.

Training: ``cell_step_pallas`` carries a custom VJP whose backward
re-derives gradients from the plain-XLA reference cell (jax.vjp of
_cell_reference) — Pallas forward speed with autodiff correctness.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nasa_niswan_tpu.ops.conv import conv2d


def _pick_row_tile(h: int, max_tile: int = 10) -> int:
    """Largest divisor of h that is <= max_tile (static grid, no remainder)."""
    for t in range(min(h, max_tile), 0, -1):
        if h % t == 0:
            return t
    return h


def _cell_kernel(
    prev_ref, cur_ref, next_ref, c_ref, w_ref, b_ref, h_out_ref, c_out_ref,
    slab, acc_ref, *, k: int, th: int, w_cols: int, hidden: int,
):
    """One (batch, row-tile) grid cell.

    prev/cur/next_ref: (1, th, Wp, C) VMEM blocks of the column-padded
        input — row tiles ti-1, ti, ti+1 (clamped at the edges).
    c_ref:  (1, th, w_cols, hidden) VMEM block
    w_ref:  (k, k, C, 4*hidden) VMEM (whole array)
    b_ref:  (1, 4*hidden) VMEM
    slab:   (th + 2p, Wp, C) VMEM scratch — haloed row slab
    acc_ref:(th * w_cols, 4*hidden) f32 scratch
    """
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    p = k // 2

    # assemble the haloed slab; zeros beyond the domain edge (SAME zero pad)
    slab[p : p + th] = cur_ref[0]
    if p:
        top = prev_ref[0, th - p :, :, :]
        slab[:p] = jnp.where(ti == 0, jnp.zeros_like(top), top)
        bot = next_ref[0, :p, :, :]
        slab[p + th :] = jnp.where(ti == n_tiles - 1, jnp.zeros_like(bot), bot)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(k):
        for dx in range(k):
            window = slab[dy : dy + th, dx : dx + w_cols, :]
            lhs = window.reshape(th * w_cols, window.shape[-1])
            acc_ref[:] += jnp.dot(
                lhs, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    gates = acc_ref[:] + b_ref[0].astype(jnp.float32)
    gates = gates.reshape(th, w_cols, 4 * hidden)
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden : 2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden :])
    c_new = c_ref[0] * f + i * g
    h_out_ref[0] = o * jnp.tanh(c_new)
    c_out_ref[0] = c_new


def fused_cell_forward(
    xh: jnp.ndarray,  # (B, H, W, C) compute dtype (bf16 recommended)
    c: jnp.ndarray,  # (B, H, W, hidden) f32
    w: jnp.ndarray,  # (k, k, C, 4*hidden) same dtype as xh
    b: jnp.ndarray,  # (4*hidden,)
    k: int,
    *,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SAME-zero-pad fused conv-gate cell.  Returns (h', c') f32.

    interpret=None auto-selects: compiled Mosaic on TPU backends, the
    Pallas interpreter elsewhere (CPU tests / debugging).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = xh.shape
    hidden = c.shape[-1]
    p = k // 2
    th = _pick_row_tile(H)
    if th <= p:
        # degenerate tiny grids: halo spans beyond one neighbor tile; the
        # XLA cell handles these (tests/small models only)
        from nasa_niswan_tpu.models.convlstm import gate_update

        gates = conv2d(xh, w, padding=p) + b
        return gate_update(gates, c)
    n_tiles = H // th

    # Lane alignment: channel (lane) dim to a 128 multiple — free on the
    # MXU (K is consumed in 128-wide chunks either way).
    C_pad = -(-C // 128) * 128
    if C_pad != C:
        xh = jnp.pad(xh, ((0, 0), (0, 0), (0, 0), (0, C_pad - C)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, C_pad - C), (0, 0)))
        C = C_pad

    # SAME-conv column zero padding, materialized once per step.
    xh_p = jnp.pad(xh, ((0, 0), (0, 0), (p, p), (0, 0)))
    Wp = W + 2 * p

    def clamp(i):
        return jnp.clip(i, 0, n_tiles - 1)

    in_block = lambda index_map: pl.BlockSpec(
        (1, th, Wp, C), index_map, memory_space=pltpu.VMEM
    )
    state_block = pl.BlockSpec(
        (1, th, W, hidden), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(_cell_kernel, k=k, th=th, w_cols=W, hidden=hidden)
    h_new, c_new = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            in_block(lambda bi, ti: (bi, clamp(ti - 1), 0, 0)),  # prev tile
            in_block(lambda bi, ti: (bi, ti, 0, 0)),  # current tile
            in_block(lambda bi, ti: (bi, clamp(ti + 1), 0, 0)),  # next tile
            state_block,  # c
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (whole array)
            pl.BlockSpec(
                (1, 4 * hidden), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[state_block, state_block],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, hidden), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 2 * p, Wp, C), xh.dtype),
            pltpu.VMEM((th * W, 4 * hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xh_p, xh_p, xh_p, c, w, b.reshape(1, -1))
    return h_new, c_new


def _cell_reference(xh, c, w, b, k):
    """Plain-XLA reference cell (identical math; backward-pass source)."""
    from nasa_niswan_tpu.models.convlstm import gate_update

    gates = conv2d(xh, w, padding=k // 2) + b
    return gate_update(gates, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_cell(xh, c, w, b, k):
    return fused_cell_forward(xh, c, w, b, k)


def _fused_fwd(xh, c, w, b, k):
    out = fused_cell_forward(xh, c, w, b, k)
    return out, (xh, c, w, b)


def _fused_bwd(k, res, grads):
    xh, c, w, b = res
    _, vjp = jax.vjp(
        lambda xh, c, w, b: _cell_reference(xh, c, w, b, k), xh, c, w, b
    )
    return vjp(grads)


_fused_cell.defvjp(_fused_fwd, _fused_bwd)


def cell_step_pallas(
    cell, x, h, c, k: int, compute_dtype, *, x_already_conved: bool = False
):
    """Drop-in replacement for models.convlstm._cell_step_xla.

    x_already_conved (the hoisted-input-conv mode) falls back to XLA — the
    fused kernel covers the standard concat path.
    """
    if x_already_conved:
        from nasa_niswan_tpu.models.convlstm import _cell_step_xla

        return _cell_step_xla(cell, x, h, c, k, compute_dtype, True)
    dt = jnp.dtype(compute_dtype)
    xh = jnp.concatenate([x.astype(dt), h.astype(dt)], axis=-1)
    w = jnp.concatenate([cell["w_x"], cell["w_h"]], axis=2).astype(dt)
    return _fused_cell(xh, c, w, cell["b"].astype(jnp.float32), k)
