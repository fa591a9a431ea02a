"""Fused Pallas backward kernels for the ConvLSTM cell (padded-column layout).

The whole-scan BPTT (ops/convlstm_bptt.py) previously rebuilt each step's
pre-activation gates by re-running the fused FORWARD kernel with
``emit_gates`` (a full extra forward per step, incl. the 4*hidden gate
tensor round-tripping HBM) and then routed both conv cotangents through
XLA's generic conv grads.  These two kernels replace all of that with the
same deep-tap matmul structure that makes the forward fast
(ops/convlstm_pallas2.py):

  * ``fused_cell_bwd_v2`` — ONE kernel that recomputes the gates from
    (xh, w, b) with k contraction-deep matmuls, applies the hand-written
    elementwise backward of the gate nonlinearity + state update
    (reference model.py:221-229 via train.py:108-110), and accumulates the
    weight/bias gradients across the whole (batch, row-tile) grid:
      dw[dy,dx] = sum_i slab[dy*wp + i + dx - p] (x) dgates[i]
                = lhs_cat^T @ roll(dgates, dx - p)   -- one deep matmul
    per column tap, sharing ``lhs_cat`` with the gates recompute.  The
    pre-activation gates never leave VMEM.  Outputs: dgates (compute
    dtype, margin columns hard zero), dc_prev (f32), dw, db (f32).
  * ``conv_same_v2`` — a standalone deep-tap SAME convolution in the
    padded-column layout; with the flipped/transposed kernel
    w'[dy,dx,g,c] = w[k-1-dy, k-1-dx, c, g] it is exactly the data
    gradient  dxh = conv_same(dgates, w').

Roll-wraparound correctness is inherited from the forward's invariant:
every wrapped row multiplies a zero margin row (xh margins are hard zero;
dgates margins are zeroed because the elementwise backward masks its
cotangents), so no output mask is needed for dw and the dxh mask only
kills conv-edge garbage.

Grid-wide accumulation (dw, db) relies on the sequential TPU grid: the
output block's index map is constant, so it stays resident in VMEM and is
zero-initialised at the first grid cell, accumulated at every cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nasa_niswan_tpu.ops.conv import conv2d
from nasa_niswan_tpu.ops.convlstm_pallas2 import (
    _deep_tap_conv,
    _elementwise_bwd,
    _fold_lhs,
    _margin_mask,
    _pick_row_tile,
    _round_up,
)


def _conv_same_kernel(prev_ref, cur_ref, next_ref, w_ref, out_ref, *,
                      k, th, wp, o, w_valid):
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    p = k // 2
    cout = out_ref.shape[-1]
    lhs = _fold_lhs(prev_ref, cur_ref, next_ref, k, th, wp, p, ti, n_tiles)
    acc = _deep_tap_conv(lhs, w_ref, k, th, wp, cout)
    out = acc.reshape(1, th, wp, cout)
    mask = _margin_mask(th, wp, cout, o, w_valid)[None]
    out_ref[:] = jnp.where(mask, out, 0.0)


def conv_same_v2(x, w2, k: int, o: int, w_valid: int, *,
                 interpret: bool | None = None, th_max: int = 5):
    """SAME convolution in the padded-column layout via deep-tap matmuls.

    x: (B, H, wp, Cin) with hard-zero column margins outside [o, o+w_valid);
    w2: (k, k, Cin, Cout).  Returns (B, H, wp, Cout) f32, margins zeroed.
    With w2 = flip(w, (0,1)).swapaxes(2,3) this is the conv data gradient.

    th_max=5 keeps VMEM comfortably under the ~16 MB/core budget with
    double-buffered input blocks at the canonical backward shapes; total
    matmul FLOPs are tile-size-independent (only the slab-copy halo
    fraction grows), so the smaller tile costs little.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, wp, Cin = x.shape
    Cout = w2.shape[-1]
    p = k // 2
    th = _pick_row_tile(H, th_max)
    if th <= p or wp % 8 or o < p or wp - o - w_valid < p:
        mask = _margin_mask(1, wp, 1, o, w_valid)[0]
        return conv2d(x, w2, padding=p, preferred_dtype=jnp.float32) * mask
    n_tiles = H // th

    cin_p = _round_up(Cin, 128)
    if cin_p != Cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_p - Cin)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, cin_p - Cin), (0, 0)))

    def clamp(i):
        return jnp.clip(i, 0, n_tiles - 1)

    in_block = lambda index_map: pl.BlockSpec(
        (1, th, wp, cin_p), index_map, memory_space=pltpu.VMEM
    )
    vma = frozenset(getattr(jax.typeof(x), "vma", ()) or ())
    out = pl.pallas_call(
        functools.partial(
            _conv_same_kernel, k=k, th=th, wp=wp, o=o, w_valid=w_valid
        ),
        grid=(B, n_tiles),
        in_specs=[
            in_block(lambda bi, ti: (bi, clamp(ti - 1), 0, 0)),
            in_block(lambda bi, ti: (bi, ti, 0, 0)),
            in_block(lambda bi, ti: (bi, clamp(ti + 1), 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wp, Cout), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, wp, Cout), jnp.float32, vma=vma),
        interpret=interpret,
    )(x, x, x, w2)
    return out


def _cell_bwd_kernel(prev_ref, cur_ref, next_ref, c_ref, dh_ref, dc_ref,
                     w_ref, b_ref, dg_ref, dcp_ref, dw_ref, db_ref, *,
                     k, th, wp, hidden, o, w_valid):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    p = k // 2
    rows = th * wp
    first = jnp.logical_and(bi == 0, ti == 0)

    lhs_cat = _fold_lhs(
        prev_ref, cur_ref, next_ref, k, th, wp, p, ti, n_tiles
    )

    # --- gates recompute (shared lhs_cat with the dw taps below)
    acc = _deep_tap_conv(lhs_cat, w_ref, k, th, wp, 4 * hidden)
    gates = acc + b_ref[0].astype(jnp.float32)  # (rows, 4h) f32

    # --- elementwise backward (margin-masked cotangents => dgates and
    # dc_prev are hard zero in the margins, keeping the layout invariant)
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    og = jax.nn.sigmoid(gates[:, 3 * hidden :])
    c32 = c_ref[:].reshape(rows, hidden)
    tc = jnp.tanh(c32 * f + i * g)
    mask = _margin_mask(th, wp, 1, o, w_valid).reshape(th * wp, 1)
    dh = dh_ref[:].reshape(rows, hidden) * mask
    dc = dc_ref[:].reshape(rows, hidden) * mask
    dct = dc + dh * og * (1.0 - tc * tc)
    d_i = dct * g * i * (1.0 - i)
    d_f = dct * c32 * f * (1.0 - f)
    d_g = dct * i * (1.0 - g * g)
    d_o = dh * tc * og * (1.0 - og)
    dgates32 = jnp.concatenate([d_i, d_f, d_g, d_o], axis=-1)
    dg_ref[:] = dgates32.reshape(1, th, wp, 4 * hidden).astype(dg_ref.dtype)
    dcp_ref[:] = (dct * f).reshape(1, th, wp, hidden)

    # --- grid-wide accumulators
    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    db_ref[...] += dgates32.sum(axis=0, keepdims=True)
    dt = dg_ref.dtype
    for dx in range(k):
        # dw[:, dx] = lhs_cat^T @ roll(dgates, dx - p): roll(x, s)[j] =
        # x[j - s], so the rolled operand aligns slab row i+dx-p with
        # dgates row i.  Wraparound rows multiply lhs_cat's zero margin
        # rows (longitude column < p <= o or >= wp - p), contributing 0.
        shift = (dx - p) % rows
        d_dx = pltpu.roll(dgates32, shift, 0) if shift else dgates32
        dw_ref[dx] += jax.lax.dot_general(
            lhs_cat, d_dx.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _cell_bwd_reference(xh, c, dh, dc, w, b, k, o, w_valid):
    """Plain-XLA oracle / small-shape fallback: identical math."""
    from nasa_niswan_tpu.ops.convlstm_pallas2 import _conv_grads

    gates = conv2d(xh, w, padding=k // 2) + b
    dgates32, dc_prev = _elementwise_bwd(gates, c, dh, dc, o, w_valid)
    dgates = dgates32.astype(xh.dtype)
    _, dw = _conv_grads(xh, w, dgates, k)
    db = dgates32.sum(axis=(0, 1, 2))
    return dgates, dc_prev, dw.astype(jnp.float32), db


def fused_cell_bwd_v2(xh, c, dh, dc, w, b, k: int, o: int, w_valid: int, *,
                      interpret: bool | None = None, th_max: int = 5):
    """Fused cell backward: gates recompute + elementwise backward + weight
    and bias gradient accumulation in one kernel.

    xh: (B, H, wp, C) compute dtype (margin layout, hard-zero margins);
    c/dh/dc: (B, H, wp, hidden) f32; w: (k, k, C, 4h); b: (4h,).
    Returns (dgates (B,H,wp,4h) compute dtype, dc_prev (B,H,wp,hidden) f32,
    dw (k,k,C,4h) f32, db (4h,) f32).  The data gradient dxh is a separate
    ``conv_same_v2`` call on dgates with the flipped kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, wp, C = xh.shape
    hidden = c.shape[-1]
    p = k // 2
    th = _pick_row_tile(H, th_max)
    if th <= p or wp % 8 or o < p or wp - o - w_valid < p:
        return _cell_bwd_reference(xh, c, dh, dc, w, b, k, o, w_valid)
    n_tiles = H // th

    c_pad = _round_up(C, 128)
    if c_pad != C:
        xh = jnp.pad(xh, ((0, 0), (0, 0), (0, 0), (0, c_pad - C)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad - C), (0, 0)))

    def clamp(i):
        return jnp.clip(i, 0, n_tiles - 1)

    xh_block = lambda index_map: pl.BlockSpec(
        (1, th, wp, c_pad), index_map, memory_space=pltpu.VMEM
    )
    state_block = pl.BlockSpec(
        (1, th, wp, hidden), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    acc_spec = lambda shape: pl.BlockSpec(
        shape, lambda bi, ti: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    vma = frozenset(getattr(jax.typeof(xh), "vma", ()) or ()) | frozenset(
        getattr(jax.typeof(c), "vma", ()) or ()
    )
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, vma=vma)
    dgates, dc_prev, dw, db = pl.pallas_call(
        functools.partial(
            _cell_bwd_kernel, k=k, th=th, wp=wp, hidden=hidden, o=o,
            w_valid=w_valid,
        ),
        grid=(B, n_tiles),
        in_specs=[
            xh_block(lambda bi, ti: (bi, clamp(ti - 1), 0, 0)),
            xh_block(lambda bi, ti: (bi, ti, 0, 0)),
            xh_block(lambda bi, ti: (bi, clamp(ti + 1), 0, 0)),
            state_block,  # c
            state_block,  # dh
            state_block,  # dc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec(
                (1, 4 * hidden), lambda bi, ti: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, wp, 4 * hidden), lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            state_block,
            acc_spec((k, k * c_pad, 4 * hidden)),
            acc_spec((1, 4 * hidden)),
        ],
        out_shape=[
            sds((B, H, wp, 4 * hidden), xh.dtype),
            sds((B, H, wp, hidden), jnp.float32),
            sds((k, k * c_pad, 4 * hidden), jnp.float32),
            sds((1, 4 * hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xh, xh, xh, c, dh, dc, w, b.reshape(1, -1))
    # dw rows are [dx, dy*C + c] -> (dy, dx, c, g)
    dw = dw.reshape(k, k, c_pad, 4 * hidden).transpose(1, 0, 2, 3)[:, :, :C]
    return dgates, dc_prev, dw, db[0]


def cell_grads_pallas(xh, c, dh, dc, w, b, k: int, o: int, w_valid: int, *,
                      interpret: bool | None = None):
    """Complete per-cell backward: (dxh, dc_prev, dw, db) from the output
    cotangents, via the fused backward kernel + the deep-tap data-grad conv
    (margins of dxh zeroed — the forward's h/c mask would kill those
    cotangents downstream anyway, and xh margins are structurally zero)."""
    dgates, dc_prev, dw, db = fused_cell_bwd_v2(
        xh, c, dh, dc, w, b, k, o, w_valid, interpret=interpret
    )
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3).astype(dgates.dtype)
    dxh = conv_same_v2(dgates, w_flip, k, o, w_valid, interpret=interpret)
    return dxh, dc_prev, dw, db
