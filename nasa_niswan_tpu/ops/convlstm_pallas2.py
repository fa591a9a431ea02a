"""Fused ConvLSTM cell, second-generation Pallas TPU kernel.

The first kernel (ops/convlstm_pallas.py) computes the gate conv as k*k
shifted-window matmuls, where every window ``slab[dy:dy+th, dx:dx+W, :]``
starts at a column (sublane) offset ``dx`` and therefore needs a VMEM
relayout before it can be an MXU operand — measured 1.34 ms/step vs XLA's
0.69 at the north-star rollout shapes (docs/STATUS.md).  This kernel keeps
the same cell math (reference model.py:216-231) but restructures the conv
so every matmul operand is tile-aligned:

  * All tensors live in a **padded-column layout**: longitude is padded to
    ``wp`` (a multiple of 8 = the f32 sublane tile) with the valid data at
    columns ``[o, o + W)`` and hard zeros in the margins.  The margins play
    the role of the conv's SAME zero padding, and because ``wp % 8 == 0``
    a (rows, wp, C) block flattens to (rows*wp, C) with NO relayout.
  * The k*k taps become **k sublane rolls + k free row-block slices**: for
    each column tap dx, roll the flattened haloed slab by (k//2 - dx) rows
    of lanes (one cheap VPU rotation); each row tap dy is then the slice
    ``rolled[dy*wp : dy*wp + th*wp]`` — offsets are multiples of wp (hence
    of 8), so the slice and the (th*wp, C) matmul operand are aligned.
  * Roll wraparound lands only in margin columns, which are masked to zero
    when h'/c' are written, so the invariant (zero margins) carries across
    scan steps for free.

Gate nonlinearities + state update fuse in the same kernel, so per step the
only HBM traffic is x/h/c in and h'/c' out — no 4*hidden-channel gate
tensor ever round-trips HBM.  Two entry modes:

  * standard: input is the channel-concat [x; h] (reference's fused conv);
  * ``xg`` mode: layer 0 with the input conv hoisted out of the scan
    (models/convlstm.py precompute_input_conv) — the kernel consumes the
    precomputed input gates and computes only the h-conv.

Training runs through a custom VJP whose backward differentiates the
margin-masked XLA reference cell (Pallas forward speed, autodiff
correctness), same strategy as v1.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nasa_niswan_tpu.ops.conv import conv2d


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fold_lhs(prev_ref, cur_ref, next_ref, k, th, wp, p, ti, n_tiles):
    """The (th*wp, k*C) deep-tap operand: the haloed slab's k row-tap
    slices lane-concatenated into one contraction-deep matmul LHS.  Shared
    by the forward kernel and both backward kernels (convgrad_pallas).

    A batch-block fold (several batch elements concatenated along the
    matmul row axis) was built and measured a dead end on hardware — ~1%
    at training B=8, worse at bb=4, pathological serving compiles; see
    docs/PERFORMANCE.md "Retired variants"."""
    return _lhs_cat(
        _build_slab(prev_ref, cur_ref, next_ref, th, wp, p, ti, n_tiles),
        k, th, wp,
    )


def col_margin(kernel_sizes) -> int:
    """Uniform left-column margin shared by every layer of a stack: the
    largest conv half-width, so one padded layout serves all layers."""
    return max(int(k) // 2 for k in kernel_sizes)


def padded_cols(w: int, o: int) -> int:
    """Total column count: valid data [o, o+w), right margin >= o, and a
    multiple of 16 so (rows, wp, C) flattens without relayout for BOTH
    compute dtypes (sublane tile: 8 for f32, 16 for bf16 — the kernel runs
    bf16 operands, so alignment must follow the larger tile; canonical
    154 -> 160 is unchanged)."""
    return _round_up(w + 2 * o, 16)


def pad_cols(x: jnp.ndarray, o: int, wp: int) -> jnp.ndarray:
    """Zero-pad the column axis (-2 of an NHWC tensor) into the margin
    layout: data at [o, o + W)."""
    w = x.shape[-2]
    cfg = [(0, 0)] * x.ndim
    cfg[-2] = (o, wp - o - w)
    return jnp.pad(x, cfg)


def _pick_row_tile(h: int, max_tile: int = 10) -> int:
    for t in range(min(h, max_tile), 0, -1):
        if h % t == 0:
            return t
    return h


def _margin_mask(th: int, wp: int, ch: int, o: int, w_valid: int):
    col = jax.lax.broadcasted_iota(jnp.int32, (th, wp, ch), 1)
    return (col >= o) & (col < o + w_valid)


def _build_slab(prev_ref, cur_ref, next_ref, th, wp, p, ti, n_tiles):
    """Haloed, flattened ((th+2p)*wp, C) slab from the clamped neighbor-tile
    blocks, with domain edges zeroed (rows beyond the grid are the conv's
    SAME zero padding).  Shared by the forward and backward kernels — the
    halo/margin invariant lives HERE only."""
    C = cur_ref.shape[-1]
    cur = cur_ref[0].reshape(th * wp, C)
    if not p:
        return cur
    top = prev_ref[0, th - p :].reshape(p * wp, C)
    top = jnp.where(ti == 0, jnp.zeros_like(top), top)
    bot = next_ref[0, :p].reshape(p * wp, C)
    bot = jnp.where(ti == n_tiles - 1, jnp.zeros_like(bot), bot)
    return jnp.concatenate([top, cur, bot], axis=0)


def _lhs_cat(slab, k, th, wp):
    """Fuse the k row-tap slices into one contraction-deep (th*wp, k*C)
    operand: lane-axis concat of aligned slices (free relayout when C is a
    128-lane multiple)."""
    return jnp.concatenate(
        [slab[dy * wp : dy * wp + th * wp] for dy in range(k)], axis=1
    )


def _deep_tap_conv(lhs_cat, w_ref, k, th, wp, n_out):
    """The SAME conv of the slab as k contraction-deep matmuls + f32
    partial rolls.  Column tap dx = a row shift of dx - p; rolling rows
    commutes with a row-wise matmul, so instead of rolling the (possibly
    bf16) input slab — Mosaic only implements rotates on 32-bit data — each
    tap is ONE deep matmul against w[:, dx] flattened to (k*C, n_out) and
    the f32 partial is rolled: roll(partial, p-dx)[i] = partial[i + dx - p]
    = sum_dy slab[dy*wp + i + dx - p] @ w[dy, dx].  Roll wraparound touches
    only rows whose longitude column lies in the zero margins
    (|dx-p| <= p <= o), which the caller's output mask kills."""
    p = k // 2
    acc = jnp.zeros((th * wp, n_out), jnp.float32)
    kc = lhs_cat.shape[-1]
    for dx in range(k):
        w_dx = w_ref[:, dx].reshape(kc, n_out)
        partial = jnp.dot(lhs_cat, w_dx, preferred_element_type=jnp.float32)
        shift = (p - dx) % (th * wp)
        acc = acc + (pltpu.roll(partial, shift, 0) if shift else partial)
    return acc


def _finish_cell(gates, c_ref, h_out_ref, c_out_ref, g_out_ref,
                 hidden: int, th: int, wp: int, o: int, w_valid: int):
    """Shared kernel epilogue: gate nonlinearities + state update
    (reference model.py:221-229) and the margin re-zeroing that carries the
    padded-column invariant to the next step.  ``gates`` is (1, th, wp,
    4*hidden) f32 pre-activation."""
    if g_out_ref is not None:
        # margin values are roll/conv-edge garbage but the VJP masks its
        # cotangents to the valid columns, so they are never read
        g_out_ref[:] = gates.astype(g_out_ref.dtype)
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden : 2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
    og = jax.nn.sigmoid(gates[..., 3 * hidden :])
    c_new = c_ref[:] * f + i * g
    h_new = og * jnp.tanh(c_new)
    # zero the margins so the layout invariant carries to the next step
    # (kills both conv-edge garbage and roll wraparound)
    mask = _margin_mask(th, wp, hidden, o, w_valid)[None]
    h_out_ref[:] = jnp.where(mask, h_new, 0.0)
    c_out_ref[:] = jnp.where(mask, c_new, 0.0)


def _cell_kernel_v2(*refs, k: int, th: int, wp: int, hidden: int, o: int,
                    w_valid: int, has_xg: bool, emit_gates: bool = False):
    """One (batch, row-tile) grid cell.

    refs (inputs): prev, cur, next — (1, th, wp, C) row tiles of the
    padded-column input (tile ti-1 / ti / ti+1, clamped at the domain
    edges); c (1, th, wp, hidden) f32; w (k, k, C, 4*hidden); b (1, 4h);
    [xg (1, th, wp, 4h) when has_xg].  Outputs: h', c' (1, th, wp,
    hidden); [pre-activation gates (1, th, wp, 4h) when emit_gates — the
    training residual that lets the VJP skip the forward-conv recompute].
    """
    g_out_ref = None
    if has_xg and emit_gates:
        prev_ref, cur_ref, next_ref, c_ref, w_ref, b_ref, xg_ref, \
            h_out_ref, c_out_ref, g_out_ref = refs
    elif has_xg:
        prev_ref, cur_ref, next_ref, c_ref, w_ref, b_ref, xg_ref, \
            h_out_ref, c_out_ref = refs
    elif emit_gates:
        prev_ref, cur_ref, next_ref, c_ref, w_ref, b_ref, \
            h_out_ref, c_out_ref, g_out_ref = refs
        xg_ref = None
    else:
        prev_ref, cur_ref, next_ref, c_ref, w_ref, b_ref, \
            h_out_ref, c_out_ref = refs
        xg_ref = None

    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    p = k // 2

    # k matmuls per cell instead of k*k shallow ones keeps the MXU
    # pipeline fed (measured: the K=C-per-tap form spends ~half its time
    # outside the systolic array at these shapes).
    lhs = _fold_lhs(prev_ref, cur_ref, next_ref, k, th, wp, p, ti, n_tiles)
    acc = _deep_tap_conv(lhs, w_ref, k, th, wp, 4 * hidden)
    if has_xg:
        acc = acc + xg_ref[:].reshape(th * wp, 4 * hidden).astype(
            jnp.float32
        )

    gates = (acc + b_ref[0].astype(jnp.float32)).reshape(
        1, th, wp, 4 * hidden
    )
    _finish_cell(gates, c_ref, h_out_ref, c_out_ref, g_out_ref,
                 hidden, th, wp, o, w_valid)


def fused_cell_forward_v2(
    xh: jnp.ndarray,  # (B, H, wp, C) compute dtype, margin layout
    c: jnp.ndarray,  # (B, H, wp, hidden) f32, margin layout
    w: jnp.ndarray,  # (k, k, C, 4*hidden)
    b: jnp.ndarray,  # (4*hidden,)
    k: int,
    o: int,
    w_valid: int,
    xg: Optional[jnp.ndarray] = None,  # (B, H, wp, 4*hidden) hoisted gates
    *,
    interpret: bool | None = None,
    emit_gates: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Fused conv-gate cell in the padded-column layout; returns (h', c')
    f32 in the same layout (margins zeroed); with ``emit_gates`` also the
    pre-activation gates (compute dtype) as a third output — the residual
    that lets the training VJP skip the forward-conv recompute."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, wp, C = xh.shape
    hidden = c.shape[-1]
    p = k // 2
    th = _pick_row_tile(H)
    if th <= p or wp % 8 or o < p or wp - o - w_valid < p:
        return _cell_reference_v2(
            xh, c, w, b, k, o, w_valid, xg, emit_gates=emit_gates
        )
    n_tiles = H // th

    # channels to a 128-lane multiple (free on the MXU, keeps every
    # operand's lane tiling exact)
    C_pad = _round_up(C, 128)
    if C_pad != C:
        xh = jnp.pad(xh, ((0, 0), (0, 0), (0, 0), (0, C_pad - C)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, C_pad - C), (0, 0)))
        C = C_pad

    def clamp(i):
        return jnp.clip(i, 0, n_tiles - 1)

    in_block = lambda index_map: pl.BlockSpec(
        (1, th, wp, C), index_map, memory_space=pltpu.VMEM
    )
    state_block = pl.BlockSpec(
        (1, th, wp, hidden), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        in_block(lambda bi, ti: (bi, clamp(ti - 1), 0, 0)),
        in_block(lambda bi, ti: (bi, ti, 0, 0)),
        in_block(lambda bi, ti: (bi, clamp(ti + 1), 0, 0)),
        state_block,
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole array
        pl.BlockSpec(
            (1, 4 * hidden), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = [xh, xh, xh, c, w, b.reshape(1, -1)]
    if xg is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, th, wp, 4 * hidden), lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(xg)

    kernel = functools.partial(
        _cell_kernel_v2, k=k, th=th, wp=wp, hidden=hidden, o=o,
        w_valid=w_valid, has_xg=xg is not None, emit_gates=emit_gates,
    )
    # Inside shard_map (the explicit-halo sharded serving path) the outputs
    # vary over the same mesh axes as the local-tile inputs; propagate the
    # operands' vma so shard_map's varying-axes typing accepts the call.
    vma = frozenset(getattr(jax.typeof(xh), "vma", ()) or ()) | frozenset(
        getattr(jax.typeof(c), "vma", ()) or ()
    )
    out_sds = jax.ShapeDtypeStruct((B, H, wp, hidden), jnp.float32, vma=vma)
    out_specs = [state_block, state_block]
    out_shape = [out_sds, out_sds]
    if emit_gates:
        out_specs.append(
            pl.BlockSpec(
                (1, th, wp, 4 * hidden), lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((B, H, wp, 4 * hidden), xh.dtype, vma=vma)
        )
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


def _cell_reference_v2(xh, c, w, b, k, o, w_valid, xg=None, *,
                       emit_gates: bool = False):
    """Margin-masked plain-XLA cell in the padded-column layout (identical
    math; small-shape fallback and grad-test oracle)."""
    from nasa_niswan_tpu.models.convlstm import gate_update

    gates = conv2d(xh, w, padding=k // 2) + b
    if xg is not None:
        gates = gates + xg.astype(gates.dtype)
    h_new, c_new = gate_update(gates, c)
    mask = _margin_mask(1, xh.shape[-2], 1, o, w_valid)[0, :, :]
    if emit_gates:
        return h_new * mask, c_new * mask, gates.astype(xh.dtype)
    return h_new * mask, c_new * mask


def _conv_grads(x, w, dgates, k):
    """Cotangents (dx, dw) of the linear SAME conv through XLA's optimized
    conv grads — the shared glue of every backward variant."""
    _, lin_vjp = jax.vjp(
        lambda x_, w_: conv2d(x_, w_, padding=k // 2), x, w
    )
    return lin_vjp(dgates)


def _elementwise_bwd(gates, c, dh, dc, o, w_valid):
    """Hand-written backward of the gate nonlinearity + state update
    (model.py:221-229 math): output cotangents (dh', dc') -> pre-activation
    gate cotangents + dc_prev.  Pure VPU work; the conv halves of the
    backward go through XLA's optimized conv grads.  Cotangents are
    margin-masked first, so garbage gate values in the margins (roll
    wraparound) never propagate."""
    hid = c.shape[-1]
    g32 = gates.astype(jnp.float32)
    i = jax.nn.sigmoid(g32[..., :hid])
    f = jax.nn.sigmoid(g32[..., hid : 2 * hid])
    g = jnp.tanh(g32[..., 2 * hid : 3 * hid])
    og = jax.nn.sigmoid(g32[..., 3 * hid :])
    c32 = c.astype(jnp.float32)
    tc = jnp.tanh(c32 * f + i * g)
    mask = _margin_mask(1, c.shape[-2], 1, o, w_valid)[0, :, :]
    dh = dh * mask
    dc = dc * mask
    dct = dc + dh * og * (1.0 - tc * tc)
    d_i = dct * g * i * (1.0 - i)
    d_f = dct * c32 * f * (1.0 - f)
    d_g = dct * i * (1.0 - g * g)
    d_o = dh * tc * og * (1.0 - og)
    dgates = jnp.concatenate([d_i, d_f, d_g, d_o], axis=-1)
    return dgates, dct * f


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_cell_v2(xh, c, w, b, k, o, w_valid):
    return fused_cell_forward_v2(xh, c, w, b, k, o, w_valid)


def _v2_fwd(xh, c, w, b, k, o, w_valid):
    # the forward kernel additionally spills the pre-activation gates
    # (compute dtype) — the residual that makes the backward recompute-free
    h_new, c_new, gates = fused_cell_forward_v2(
        xh, c, w, b, k, o, w_valid, emit_gates=True
    )
    return (h_new, c_new), (xh, c, gates, w)


def _v2_bwd(k, o, w_valid, res, grads):
    xh, c, gates, w = res
    dgates32, dc_prev = _elementwise_bwd(gates, c, *grads, o, w_valid)
    dxh, dw = _conv_grads(xh, w, dgates32.astype(xh.dtype), k)
    db = dgates32.sum(axis=(0, 1, 2))
    return dxh, dc_prev, dw, db


_fused_cell_v2.defvjp(_v2_fwd, _v2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_cell_v2_xg(xg, h, c, w_h, b, k, o, w_valid):
    return fused_cell_forward_v2(h, c, w_h, b, k, o, w_valid, xg)


def _v2_xg_fwd(xg, h, c, w_h, b, k, o, w_valid):
    h_new, c_new, gates = fused_cell_forward_v2(
        h, c, w_h, b, k, o, w_valid, xg, emit_gates=True
    )
    return (h_new, c_new), (h, c, gates, w_h)


def _v2_xg_bwd(k, o, w_valid, res, grads):
    h, c, gates, w_h = res
    dgates32, dc_prev = _elementwise_bwd(gates, c, *grads, o, w_valid)
    dgates = dgates32.astype(h.dtype)
    dh, dw_h = _conv_grads(h, w_h, dgates, k)
    db = dgates32.sum(axis=(0, 1, 2))
    # xg enters in the compute dtype (the hoisted conv's output == h.dtype)
    return dgates, dh, dc_prev, dw_h, db


_fused_cell_v2_xg.defvjp(_v2_xg_fwd, _v2_xg_bwd)


def cell_step_pallas2(
    cell, x, h, c, k: int, compute_dtype, o: int, w_valid: int,
    *, x_already_conved: bool = False,
):
    """Cell step in the padded-column layout (models/convlstm.py 'pallas2'
    path).  With ``x_already_conved``, x is the hoisted input-gate tensor
    (B, H, wp, 4*hidden) and only the h-conv runs in the kernel."""
    dt = jnp.dtype(compute_dtype)
    if x_already_conved:
        return _fused_cell_v2_xg(
            x, h.astype(dt), c, cell["w_h"].astype(dt),
            cell["b"].astype(jnp.float32), k, o, w_valid,
        )
    w = jnp.concatenate([cell["w_x"], cell["w_h"]], axis=2).astype(dt)
    xh = jnp.concatenate([x.astype(dt), h.astype(dt)], axis=-1)
    return _fused_cell_v2(
        xh, c, w, cell["b"].astype(jnp.float32), k, o, w_valid
    )
