"""Hand-written BPTT for the fused pallas2 ConvLSTM scan.

Why this exists: the per-cell custom VJP (ops/convlstm_pallas2.py) is
opaque to ``jax.checkpoint`` — remat cannot recompute through a custom_vjp,
so its residuals (xh, c, gates per cell per step) get stacked across the
whole ``lax.scan``, ~2x the XLA path's training footprint (measured +3.5
GiB at B=4 canonical shapes; OOM at the canonical B=8).  Here the custom
VJP wraps the ENTIRE multi-layer scan instead:

  * primal: the plain forward scan through ``fused_cell_forward_v2`` —
    nothing stored (serving stays O(1) in T);
  * fwd (under differentiation): the same scan additionally stacks each
    step's INPUT carry as scan ys — residuals are (params, xs, state0,
    carry_stack), exactly the storage XLA's scan autodiff keeps for the
    rematerialized step;
  * bwd: one reverse scan.  The default ``bwd_impl="fused"`` runs the
    fused Pallas backward (ops/convgrad_pallas.py): ONE kernel per cell
    recomputes the gates, applies the elementwise backward, and
    accumulates dw/db — the gates never leave VMEM — plus a deep-tap
    data-grad conv for dxh.  Each layer's forward input is recovered from
    the stored state stack (layer l>0's input at step t IS layer l-1's
    carry at step t+1), carried one step through the reverse scan — so
    NO forward replay happens at all.  ``bwd_impl="xla"`` keeps the
    round-2 strategy (emit-gates forward replay + XLA conv grads) as the
    measured fallback/oracle.

Net: pallas2 forward speed in BOTH directions, XLA-remat memory.
Measured at canonical training shapes (B=8, T=48, 100x154->160, bf16,
hidden 64/32/16): the per-cell-VJP path OOMs; this path fits and beats
the XLA cell (see docs/STATUS.md r3).  Gradient parity vs XLA autodiff
is golden-tested in tests/test_pallas_cell_v2.py.

Backward math per cell (reference model.py:221-229 via train.py:108-110):
the gate cotangents come from _elementwise_bwd; the conv cotangents are
d[xh] = conv_transpose(dgates, W) and dW = xcorr(xh, dgates), obtained by
jax.vjp of the linear conv (no nonlinearity recompute).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from nasa_niswan_tpu.ops.convlstm_pallas2 import (
    _conv_grads,
    _elementwise_bwd,
    fused_cell_forward_v2,
)
from nasa_niswan_tpu.ops.vma import vary_like


def _cells_step(params, x_t, state, ks, o, w_valid, dt, emit: bool,
                impl: str = "fused"):
    """One timestep through all layers (padded-column layout).

    Returns (new_state, recs) where recs[l] = (layer input, gates) when
    ``emit`` (the transient quantities the backward needs), else [].

    ``impl`` picks the cell body: "fused" (the Pallas kernel) or "xla"
    (``_cell_reference_v2`` — identical margin-masked contract through
    XLA's batched convs; at large batch XLA's convs are more
    MXU-efficient than the per-(batch, row-tile) kernel grid, so the
    training forward scan can choose per measured batch size while the
    fused BACKWARD kernels stay either way).
    """
    from nasa_niswan_tpu.ops.convlstm_pallas2 import _cell_reference_v2

    cell_fn = fused_cell_forward_v2 if impl == "fused" else _cell_reference_v2
    inp = x_t
    new_state, recs = [], []
    for li, k in enumerate(ks):
        cell = params["cells"][li]
        h, c = state[li]
        w = jnp.concatenate([cell["w_x"], cell["w_h"]], axis=2).astype(dt)
        xh = jnp.concatenate([inp.astype(dt), h.astype(dt)], axis=-1)
        out = cell_fn(
            xh, c, w, cell["b"].astype(jnp.float32), k, o, w_valid,
            emit_gates=emit,
        )
        if emit:
            recs.append((inp, out[2]))
        new_state.append((out[0], out[1]))
        inp = out[0]
    return new_state, recs


def _unroll_of(unroll, train: bool) -> int:
    """``unroll`` may be an int (both directions) or a (primal, train)
    pair: the PRIMAL scan (forward-only eval through the custom_vjp) keeps
    the serving unroll, while the differentiated fwd/bwd scans — which
    carry per-step stack slice/update machinery — use the training unroll
    (measured +9.6% at unroll=2; serving measured slower >1)."""
    if isinstance(unroll, tuple):
        return unroll[1] if train else unroll[0]
    return unroll


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def scan_cells_pallas2(params, xs, state0, ks, o, w_valid, dtype_str, unroll,
                       bwd_impl="fused", fwd_impl="fused"):
    """Forward scan over time through the fused cells; returns the final
    per-layer (h, c) carry (f32, padded-column layout).

    xs: (T, B, H, wp, C) compute-dtype frames in the margin layout;
    state0: per-layer [(h, c)] f32.  ks/o/w_valid/dtype_str/unroll/
    bwd_impl/fwd_impl are static (hashable); unroll: int or a
    (primal, train) pair (see _unroll_of); bwd_impl: "fused" (Pallas
    backward kernels) | "xla" (emit-gates replay + XLA conv grads);
    fwd_impl: "fused" | "xla" — which cell body runs the forward scans
    (see _cells_step; the backward kernels are unaffected).
    """
    dt = jnp.dtype(dtype_str)

    def step(carry, x_t):
        new, _ = _cells_step(params, x_t, carry, ks, o, w_valid, dt, False,
                             fwd_impl)
        return new, None

    final, _ = jax.lax.scan(step, state0, xs,
                            unroll=_unroll_of(unroll, train=False))
    return final


def _pack_state(state):
    """Merge each carry's minor (wp, C) dims into one lane axis for the
    residual stack: TPU tiling pads the minor-most dim to 128 lanes, so a
    stacked (T, B, H, wp, C) f32 carry with C=16 allocates (and WRITES) 8x
    its data — measured 2.93 GiB per stack for 375 MiB of payload at the
    canonical year-campaign shapes, an HBM OOM.  (B, H, wp*C) is exactly
    lane-aligned (wp is a multiple of 8, C >= 16 on every layer... and any
    remainder still beats the per-channel pad)."""
    return [(h.reshape(*h.shape[:2], -1), c.reshape(*c.shape[:2], -1))
            for h, c in state]


def _unpack_state(state, shapes):
    """Inverse of _pack_state; ``shapes`` = per-layer (wp, C)."""
    return [
        (h.reshape(*h.shape[:2], *s), c.reshape(*c.shape[:2], *s))
        for (h, c), s in zip(state, shapes)
    ]


def _scan_fwd(params, xs, state0, ks, o, w_valid, dtype_str, unroll,
              bwd_impl="fused", fwd_impl="fused"):
    dt = jnp.dtype(dtype_str)

    # stack each step's INPUT carry (f32) as we go — the same storage
    # XLA's scan autodiff keeps for a rematerialized step body, and it
    # saves the backward a full forward replay.  Carries are PACKED to
    # (B, H, wp*C) before stacking (see _pack_state), and the input
    # frames likewise flow through the scan packed, so neither the
    # T-length stack nor xs itself carries the 2-16x lane-padding tax.
    T, B, H, WP, CIN = xs.shape

    def rec(carry, x_tp):
        x_t = x_tp.reshape(B, H, WP, CIN)
        new, _ = _cells_step(params, x_t, carry, ks, o, w_valid, dt, False,
                             fwd_impl)
        return new, _pack_state(carry)

    final, state_stack = jax.lax.scan(
        rec, state0, xs.reshape(T, B, H, WP * CIN),
        unroll=_unroll_of(unroll, train=True),
    )
    return final, (params, xs, state0, state_stack, final)


def _cells_bwd_step(params, x_t, state_in, state_next, d_state, cells_g,
                    ks, o, w_valid, dt):
    """One reverse timestep through all layers with the fused Pallas
    backward kernels.  Layer l>0's forward input is layer l-1's carry h at
    the NEXT step (state_next).  Mutates/returns cells_g (accumulated cell
    grads); returns (new_d per-layer (dh, dc) f32, d_x_t f32 full-frame).
    Shared by the plain BPTT and the seq2seq feedback BPTT."""
    from nasa_niswan_tpu.ops.convgrad_pallas import cell_grads_pallas

    L = len(ks)
    d_state = [list(s) for s in d_state]
    new_d = [None] * L
    dx_t = None
    cells_g = list(cells_g)
    for li in reversed(range(L)):
        inp_l = x_t if li == 0 else state_next[li - 1][0]
        h_in, c_in = state_in[li]
        dh, dc = d_state[li]
        cell = params["cells"][li]
        k = ks[li]
        xh = jnp.concatenate([inp_l.astype(dt), h_in.astype(dt)], -1)
        w = jnp.concatenate([cell["w_x"], cell["w_h"]], axis=2).astype(dt)
        dxh, dc_prev, dw, db = cell_grads_pallas(
            xh, c_in, dh, dc, w, cell["b"].astype(jnp.float32),
            k, o, w_valid,
        )
        cin = inp_l.shape[-1]
        g = cells_g[li]
        cells_g[li] = {
            "w_x": g["w_x"] + dw[:, :, :cin].astype(g["w_x"].dtype),
            "w_h": g["w_h"] + dw[:, :, cin:].astype(g["w_h"].dtype),
            "b": g["b"] + db.astype(g["b"].dtype),
        }
        din, dh_in = dxh[..., :cin], dxh[..., cin:]
        if li > 0:
            ph, pc = d_state[li - 1]
            d_state[li - 1] = [ph + din, pc]
        else:
            dx_t = din
        new_d[li] = (dh_in, dc_prev)
    return new_d, dx_t, cells_g


def _scan_bwd_fused(ks, o, w_valid, dt, unroll, params, xs, state_stack,
                    final, d_final, zero_pgrads):
    """Reverse scan with the fused Pallas backward kernels.  Layer l>0's
    forward input at step t is layer l-1's carry h at step t+1 — available
    as the PREVIOUS reverse iteration's state_in, carried through the scan
    (seeded with the final carry).  No forward replay, no emitted gates.
    The stored stacks flow in PACKED (see _pack_state) and are unpacked
    per step; dxs is emitted packed and reshaped once at the end."""
    T, B, H, WP, CIN = xs.shape
    shapes = [(h.shape[-2], h.shape[-1]) for h, _ in final]

    def back(carry, inp):
        d_state, d_params, state_next = carry
        x_tp, state_in_p = inp
        x_t = x_tp.reshape(B, H, WP, CIN)
        state_in = _unpack_state(state_in_p, shapes)
        new_d, dx_t, cells_g = _cells_bwd_step(
            params, x_t, state_in, state_next, d_state, d_params["cells"],
            ks, o, w_valid, dt,
        )
        d_params = dict(d_params, cells=cells_g)
        return (new_d, d_params, state_in), dx_t.astype(xs.dtype).reshape(
            B, H, WP * CIN
        )

    (d_state0, d_params, _), dxs = jax.lax.scan(
        back,
        (d_final, zero_pgrads, [tuple(s) for s in final]),
        (xs.reshape(T, B, H, WP * CIN), state_stack),
        reverse=True,
        unroll=unroll,
    )
    return d_params, dxs.reshape(T, B, H, WP, CIN), d_state0


def _scan_bwd(ks, o, w_valid, dtype_str, unroll, bwd_impl, fwd_impl, res,
              d_final):
    params, xs, state0, state_stack, final = res
    dt = jnp.dtype(dtype_str)
    L = len(ks)

    # under shard_map the grad accumulators must carry the data's varying
    # axes or the reverse scan's carry types disagree (zeros are unvarying)
    zero_pgrads = vary_like(jax.tree.map(jnp.zeros_like, params), xs)
    d_final = vary_like(
        jax.tree.map(
            lambda t: t.astype(jnp.float32), [tuple(s) for s in d_final]
        ),
        xs,
    )
    if bwd_impl == "fused":
        return _scan_bwd_fused(
            ks, o, w_valid, dt, _unroll_of(unroll, train=True), params, xs,
            state_stack, final, d_final, zero_pgrads,
        )
    if bwd_impl != "xla":
        raise ValueError(f"bwd_impl must be 'fused' or 'xla', got "
                         f"{bwd_impl!r}")

    T, B, H, WP, CIN = xs.shape
    shapes = [(h.shape[-2], h.shape[-1]) for h, _ in final]

    def back(carry, inp):
        d_state, d_params = carry
        x_tp, state_in_p = inp
        x_t = x_tp.reshape(B, H, WP, CIN)
        state_in = _unpack_state(state_in_p, shapes)
        # rebuild this step's transient quantities (same impl as forward)
        _, recs = _cells_step(
            params, x_t, state_in, ks, o, w_valid, dt, True, fwd_impl
        )
        d_state = [list(s) for s in d_state]
        new_d = [None] * L
        dxs_t = None
        cells_g = list(d_params["cells"])
        for li in reversed(range(L)):
            inp_l, gates_l = recs[li]
            h_in, c_in = state_in[li]
            dh, dc = d_state[li]
            dgates32, dc_prev = _elementwise_bwd(
                gates_l, c_in, dh, dc, o, w_valid
            )
            dgates = dgates32.astype(dt)
            xh = jnp.concatenate([inp_l.astype(dt), h_in.astype(dt)], -1)
            cell = params["cells"][li]
            w = jnp.concatenate([cell["w_x"], cell["w_h"]], axis=2).astype(dt)
            k = ks[li]
            dxh, dw = _conv_grads(xh, w, dgates, k)
            cin = inp_l.shape[-1]
            g = cells_g[li]
            cells_g[li] = {
                "w_x": g["w_x"] + dw[:, :, :cin].astype(g["w_x"].dtype),
                "w_h": g["w_h"] + dw[:, :, cin:].astype(g["w_h"].dtype),
                "b": g["b"] + dgates32.sum(axis=(0, 1, 2)).astype(g["b"].dtype),
            }
            din, dh_in = dxh[..., :cin], dxh[..., cin:]
            if li > 0:
                ph, pc = d_state[li - 1]
                d_state[li - 1] = [ph + din.astype(jnp.float32), pc]
            else:
                dxs_t = din.astype(xs.dtype)
            new_d[li] = (dh_in.astype(jnp.float32), dc_prev)
        d_params = dict(d_params, cells=cells_g)
        return (new_d, d_params), dxs_t.reshape(B, H, WP * CIN)

    (d_state0, d_params), dxs = jax.lax.scan(
        back, (d_final, zero_pgrads),
        (xs.reshape(T, B, H, WP * CIN), state_stack),
        reverse=True, unroll=_unroll_of(unroll, train=True),
    )
    return d_params, dxs.reshape(T, B, H, WP, CIN), d_state0


scan_cells_pallas2.defvjp(_scan_fwd, _scan_bwd)
