"""Fused tail kernel: the stack's last TWO ConvLSTM cells in ONE pallas_call.

Motivation (docs/profile/pallas2_deeptap.json, 384-step serving chunk on a
v5e chip): layer 1's kernel is near the MXU roofline (53 ms), but layers 2
and 3 cost ~12 ms EACH despite layer 3 having a quarter of layer 2's
FLOPs — the small-channel tail is launch/DMA-bound, and its inter-layer
h tensor round-trips HBM between the two pallas_calls.  Fusing the tail
removes one kernel launch per scan step and keeps layer 2's output h in
VMEM as layer 3's input operand.

The hard part is the cross-layer halo: layer 3's conv at row r needs layer
2's output at rows r±p3, which under a row-tiled grid belongs to the
neighboring grid cell.  Instead of cross-cell communication (impossible
inside one pallas_call) each tile RECOMPUTES layer 2 on ``e = k3//2`` extra
rows per side — +2·e/th redundant layer-2 work (+20% of the cheap layer at
canonical th=10) in exchange for the launch + HBM round-trip.  Domain-edge
extension rows are zeroed (they play layer 3's SAME zero padding), so the
composition is bit-identical to the per-layer kernels.

Both cells use the split-operand slab assembly (ops/convlstm_pallas2
._cell_kernel_v2s): x/h arrive as separate refs, lanes concatenated in VMEM
against zero-padded weight rows — no HBM concat for either layer.

Reference semantics: two chained ConvLSTMCells (model.py:216-231 via the
layer loop at model.py:265-271).  Serving-path only: the training BPTT
(ops/convlstm_bptt.py) keeps per-layer kernels, whose backward needs each
layer's gates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nasa_niswan_tpu.ops.convlstm_pallas2 import (
    _build_slab,
    _cell_reference_v2,
    _deep_tap_conv,
    _lhs_cat,
    _margin_mask,
    _pick_row_tile,
    _round_up,
)


def _gate_update_rows(gates, c, hidden):
    """Gate nonlinearity + state update on a (rows, wp, ·) block."""
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden : 2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
    og = jax.nn.sigmoid(gates[..., 3 * hidden :])
    c_new = c * f + i * g
    return og * jnp.tanh(c_new), c_new


def _assemble(parts, P, dt):
    """Lane-concat ``parts`` (cast to dt) and zero-pad to P lanes — the
    split-operand slab, matching zero-padded weight rows."""
    parts = [p.astype(dt) for p in parts]
    pad = P - sum(p.shape[-1] for p in parts)
    if pad:
        parts.append(jnp.zeros((parts[0].shape[0], pad), dt))
    return jnp.concatenate(parts, axis=-1)


def _tail_kernel(px, cx, nx, ph2, ch2, nh2, pc2, cc2, nc2,
                 ph3, ch3, nh3, c3_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 h2_out, c2_out, h3_out, c3_out,
                 *, k2: int, k3: int, th: int, wp: int,
                 hid2: int, hid3: int, o: int, w_valid: int):
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    p2, e = k2 // 2, k3 // 2
    hp = p2 + e          # input halo for the extended layer-2 rows
    th2e = th + 2 * e    # layer-2 output rows (tile + layer-3's halo)
    dt = w2_ref.dtype

    # ---- layer 2 on th2e rows (halo recompute) ----
    sx = _build_slab(px, cx, nx, th, wp, hp, ti, n_tiles)
    sh2 = _build_slab(ph2, ch2, nh2, th, wp, hp, ti, n_tiles)
    P2 = w2_ref.shape[2]
    slab2 = _assemble([sx, sh2], P2, dt)
    lhs2 = _lhs_cat(slab2, k2, th2e, wp)
    acc2 = _deep_tap_conv(lhs2, w2_ref, k2, th2e, wp, 4 * hid2)
    gates2 = (acc2 + b2_ref[0].astype(jnp.float32)).reshape(
        th2e, wp, 4 * hid2
    )
    c2ext = _build_slab(pc2, cc2, nc2, th, wp, e, ti, n_tiles).reshape(
        th2e, wp, hid2
    )
    h2_new, c2_new = _gate_update_rows(gates2, c2ext, hid2)
    # margin columns: conv-edge garbage + roll wraparound; extension rows
    # beyond the domain edge: they are layer 3's SAME zero padding AND the
    # per-layer kernels never produce them — zero both.  Masks span the
    # full channel lanes: 1-lane iota broadcasts lower to an unsupported
    # gather in Mosaic.
    colmask = _margin_mask(th2e, wp, hid2, o, w_valid)
    row = jax.lax.broadcasted_iota(jnp.int32, (th2e, wp, hid2), 0)
    grow = ti * th - e + row
    mask2 = colmask & (grow >= 0) & (grow < n_tiles * th)
    h2_new = jnp.where(mask2, h2_new, 0.0)
    c2_new = jnp.where(mask2, c2_new, 0.0)
    # value-indexing with None lowers to an unsupported gather in Mosaic;
    # slice + reshape lower cleanly
    h2_out[:] = jax.lax.slice_in_dim(h2_new, e, e + th, axis=0).reshape(
        1, th, wp, hid2
    )
    c2_out[:] = jax.lax.slice_in_dim(c2_new, e, e + th, axis=0).reshape(
        1, th, wp, hid2
    )

    # ---- layer 3 on th rows, consuming h2_new from VMEM ----
    sh3 = _build_slab(ph3, ch3, nh3, th, wp, e, ti, n_tiles)
    P3 = w3_ref.shape[2]
    slab3 = _assemble([h2_new.reshape(th2e * wp, hid2), sh3], P3, dt)
    lhs3 = _lhs_cat(slab3, k3, th, wp)
    acc3 = _deep_tap_conv(lhs3, w3_ref, k3, th, wp, 4 * hid3)
    gates3 = (acc3 + b3_ref[0].astype(jnp.float32)).reshape(
        1, th, wp, 4 * hid3
    )
    h3_new, c3_new = _gate_update_rows(gates3, c3_ref[:], hid3)
    mask3 = _margin_mask(th, wp, hid3, o, w_valid)[None]
    h3_out[:] = jnp.where(mask3, h3_new, 0.0)
    c3_out[:] = jnp.where(mask3, c3_new, 0.0)


def tail_reference(x2, h2, c2, h3, c3, w2, b2, w3, b3, k2, k3, o, w_valid):
    """Two chained margin-masked XLA reference cells — the fallback path
    and the grad/test oracle for the fused tail."""
    dt = w2.dtype
    xh2 = jnp.concatenate([x2.astype(dt), h2.astype(dt)], axis=-1)
    h2n, c2n = _cell_reference_v2(xh2, c2, w2, b2, k2, o, w_valid)
    xh3 = jnp.concatenate([h2n.astype(dt), h3.astype(dt)], axis=-1)
    h3n, c3n = _cell_reference_v2(xh3, c3, w3, b3, k3, o, w_valid)
    return h2n, c2n, h3n, c3n


def fused_tail_forward(
    x2: jnp.ndarray,  # (B, H, wp, Cx2) f32 — the previous layer's h carry
    h2: jnp.ndarray,  # (B, H, wp, hid2) f32, margin layout
    c2: jnp.ndarray,
    h3: jnp.ndarray,  # (B, H, wp, hid3) f32
    c3: jnp.ndarray,
    w2: jnp.ndarray,  # (k2, k2, Cx2 + hid2, 4*hid2) compute dtype
    b2: jnp.ndarray,  # (4*hid2,) f32
    w3: jnp.ndarray,  # (k3, k3, hid2 + hid3, 4*hid3) compute dtype
    b3: jnp.ndarray,
    k2: int,
    k3: int,
    o: int,
    w_valid: int,
    *,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Both tail cells in one pallas_call; returns (h2', c2', h3', c3')
    f32 in the margin layout, bit-identical to two per-layer kernel calls."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, wp, Cx2 = x2.shape
    hid2, hid3 = c2.shape[-1], c3.shape[-1]
    p2, e = k2 // 2, k3 // 2
    hp = p2 + e
    th = _pick_row_tile(H)
    if (
        th <= hp
        or wp % 8
        or o < max(p2, e)
        or wp - o - w_valid < max(p2, e)
    ):
        return tail_reference(
            x2, h2, c2, h3, c3, w2, b2, w3, b3, k2, k3, o, w_valid
        )
    n_tiles = H // th

    P2 = _round_up(Cx2 + hid2, 128)
    if P2 != Cx2 + hid2:
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, P2 - Cx2 - hid2), (0, 0)))
    P3 = _round_up(hid2 + hid3, 128)
    if P3 != hid2 + hid3:
        w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, P3 - hid2 - hid3), (0, 0)))

    def clamp(i):
        return jnp.clip(i, 0, n_tiles - 1)

    def triple(ch_count):
        blk = lambda index_map: pl.BlockSpec(
            (1, th, wp, ch_count), index_map, memory_space=pltpu.VMEM
        )
        return [
            blk(lambda bi, ti: (bi, clamp(ti - 1), 0, 0)),
            blk(lambda bi, ti: (bi, ti, 0, 0)),
            blk(lambda bi, ti: (bi, clamp(ti + 1), 0, 0)),
        ]

    def center(ch_count):
        return pl.BlockSpec(
            (1, th, wp, ch_count), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        )

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    bias = lambda n: pl.BlockSpec(
        (1, n), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        triple(Cx2) + triple(hid2) + triple(hid2) + triple(hid3)
        + [center(hid3), whole, bias(4 * hid2), whole, bias(4 * hid3)]
    )
    kernel = functools.partial(
        _tail_kernel, k2=k2, k3=k3, th=th, wp=wp, hid2=hid2, hid3=hid3,
        o=o, w_valid=w_valid,
    )
    vma = frozenset()
    for t in (x2, h2, c2, h3, c3):
        vma = vma | frozenset(getattr(jax.typeof(t), "vma", ()) or ())
    sds = lambda ch: jax.ShapeDtypeStruct((B, H, wp, ch), jnp.float32, vma=vma)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=[center(hid2), center(hid2), center(hid3), center(hid3)],
        out_shape=[sds(hid2), sds(hid2), sds(hid3), sds(hid3)],
        interpret=interpret,
    )(x2, x2, x2, h2, h2, h2, c2, c2, c2, h3, h3, h3, c3, w2,
      b2.reshape(1, -1), w3, b3.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _fused_tail(x2, h2, c2, h3, c3, w2, b2, w3, b3, k2, k3, o, w_valid):
    return fused_tail_forward(
        x2, h2, c2, h3, c3, w2, b2, w3, b3, k2, k3, o, w_valid
    )


def _tail_fwd(x2, h2, c2, h3, c3, w2, b2, w3, b3, k2, k3, o, w_valid):
    out = fused_tail_forward(
        x2, h2, c2, h3, c3, w2, b2, w3, b3, k2, k3, o, w_valid
    )
    return out, (x2, h2, c2, h3, c3, w2, b2, w3, b3)


def _tail_bwd(k2, k3, o, w_valid, res, grads):
    # serving never differentiates the tail; tests/occasional grads go
    # through the reference composition (identical math)
    primals = res
    _, vjp = jax.vjp(
        lambda *a: tail_reference(*a, k2, k3, o, w_valid), *primals
    )
    return vjp(grads)


_fused_tail.defvjp(_tail_fwd, _tail_bwd)


def tail_step_pallas2(cell2, cell3, x2, h2, c2, h3, c3, k2: int, k3: int,
                      compute_dtype, o: int, w_valid: int):
    """Both tail cells in one kernel (models/convlstm.py ``fuse_tail``):
    drop-in for two consecutive ``cell_step_pallas2`` calls."""
    dt = jnp.dtype(compute_dtype)
    w2 = jnp.concatenate([cell2["w_x"], cell2["w_h"]], axis=2).astype(dt)
    w3 = jnp.concatenate([cell3["w_x"], cell3["w_h"]], axis=2).astype(dt)
    return _fused_tail(
        x2, h2, c2, h3, c3,
        w2, cell2["b"].astype(jnp.float32),
        w3, cell3["b"].astype(jnp.float32),
        k2, k3, o, w_valid,
    )
