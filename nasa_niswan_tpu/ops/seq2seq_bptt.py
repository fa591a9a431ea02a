"""Whole-chunk BPTT for seq2seq scheduled-sampling training (config #3).

The seq2seq chunk (rollout/seq2seq.py) feeds each step's prediction (or the
teacher value, per a Bernoulli draw) back into the next step's input — the
reference's X6 feedback loop (dataset.py:330, test.ipynb cell 8).  Naively
composing the per-chunk scan out of T single-step ``convlstm_apply`` calls
under the pallas2 whole-scan BPTT stores ~3 copies of the carry per step
(each T=1 custom VJP stacks its own state0 / carry-stack / final) and pays
the scan plumbing per step.  This module wraps the ENTIRE feedback chunk in
ONE custom VJP instead:

  * primal/fwd: one scan carrying (per-layer state, feedback map); per step
    the feedback is geophysically padded into the margin layout, the fused
    cells advance, the 1x1 head + crop produce the step prediction, and the
    scheduled-sampling blend picks the next feedback.  Residuals are the
    per-step input carries + the predictions — XLA-remat storage.
  * bwd: one reverse scan built on the same fused Pallas cell backward as
    the plain BPTT (ops/convlstm_bptt._cells_bwd_step).  The feedback
    cotangent chains through the blend, the head, and the pad adjoints:
    d(pred_t) collects the external cotangent plus the next step's feedback
    cotangent weighted by (1 - draw_t); the frame cotangent's feedback
    channel routes through pad_cols^T .. pad_geo^T back to d(pred_{t-1}).
    Layer inputs and head inputs come from the carried next-step state
    (no forward replay); the feedback VALUES are rebuilt vectorized from
    the stored predictions + teacher values outside the scan.

Gradient parity vs XLA autodiff through the plain scan is golden-tested in
tests/test_seq2seq.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nasa_niswan_tpu.core.padding import crop_to_grid, pad_geo
from nasa_niswan_tpu.ops.conv import conv2d
from nasa_niswan_tpu.ops.convlstm_bptt import (
    _cells_bwd_step,
    _cells_step,
    _pack_state,
    _unpack_state,
    _unroll_of,
)
from nasa_niswan_tpu.ops.convlstm_pallas2 import pad_cols
from nasa_niswan_tpu.ops.vma import vary_like


def _fb_to_margin(fb, padded_shape, o, wp):
    """(B, h, w) normalized feedback map -> (B, H, wp, 1) margin-layout
    channel (f32; the caller casts to the compute dtype)."""
    fb_pad = pad_geo(fb, padded_shape)  # (B, H, W)
    return pad_cols(fb_pad[..., None], o, wp)


def _pred_from_h(h_last, head_w, head_b, o, w_valid, grid_shape, dt):
    """1x1 head on the margin-layout last-layer h -> cropped normalized
    (B, h, w) prediction (the _finish epilogue, inlined per step)."""
    h_crop = h_last[:, :, o : o + w_valid, :]
    p = conv2d(h_crop.astype(dt), head_w.astype(dt), head_b)
    return crop_to_grid(p.astype(jnp.float32)[..., 0], grid_shape)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def scan_seq2seq_pallas2(params, xs, prev0n, ysn, draws_f, state0,
                         ks, o, w_valid, dtype_str, padded_shape,
                         grid_shape, unroll, fwd_impl="fused"):
    """Feedback chunk through the fused cells; returns (final_state,
    preds (T, B, h, w) normalized f32).

    xs: (T, B, H, wp, C-1) compute-dtype forcings in the margin layout;
    prev0n: (B, h, w) f32 normalized feedback seed; ysn: (T, B, h, w) f32
    normalized teacher series; draws_f: (T, B) f32 0/1 scheduled-sampling
    draws (1 = teacher-force); state0: per-layer [(h, c)] f32 margin layout.
    """
    dt = jnp.dtype(dtype_str)

    def step(carry, inp):
        state, fb = carry
        x_t, y_t, d_t = inp
        frame = jnp.concatenate(
            [x_t, _fb_to_margin(fb, padded_shape, o, wp_of(xs)).astype(dt)],
            axis=-1,
        )
        new_state, _ = _cells_step(params, frame, state, ks, o, w_valid,
                                   dt, False, fwd_impl)
        pred = _pred_from_h(
            new_state[-1][0], params["head"]["w"], params["head"]["b"],
            o, w_valid, grid_shape, dt,
        )
        sel = d_t[:, None, None]
        fb_next = sel * y_t + (1.0 - sel) * pred
        return (new_state, fb_next), pred

    (final, _), preds = jax.lax.scan(
        step, (state0, prev0n), (xs, ysn, draws_f),
        unroll=_unroll_of(unroll, train=False),
    )
    return final, preds


def wp_of(xs):
    return xs.shape[3]


def _s2s_fwd(params, xs, prev0n, ysn, draws_f, state0,
             ks, o, w_valid, dtype_str, padded_shape, grid_shape, unroll,
             fwd_impl="fused"):
    dt = jnp.dtype(dtype_str)

    def step(carry, inp):
        state, fb = carry
        x_t, y_t, d_t = inp
        frame = jnp.concatenate(
            [x_t, _fb_to_margin(fb, padded_shape, o, wp_of(xs)).astype(dt)],
            axis=-1,
        )
        new_state, _ = _cells_step(params, frame, state, ks, o, w_valid,
                                   dt, False, fwd_impl)
        pred = _pred_from_h(
            new_state[-1][0], params["head"]["w"], params["head"]["b"],
            o, w_valid, grid_shape, dt,
        )
        sel = d_t[:, None, None]
        fb_next = sel * y_t + (1.0 - sel) * pred
        # carries are packed to (B, H, wp*C) before stacking — the TPU
        # lane-padding tax on a stacked (T, ..., C<=64) carry is 2-8x
        # (see convlstm_bptt._pack_state)
        return (new_state, fb_next), (pred, _pack_state(state))

    (final, _), (preds, state_stack) = jax.lax.scan(
        step, (state0, prev0n), (xs, ysn, draws_f),
        unroll=_unroll_of(unroll, train=True),
    )
    res = (params, xs, prev0n, ysn, draws_f, state_stack, preds, final)
    return (final, preds), res


def _s2s_bwd(ks, o, w_valid, dtype_str, padded_shape, grid_shape, unroll,
             fwd_impl, res, cotangents):
    params, xs, prev0n, ysn, draws_f, state_stack, preds, final = res
    d_final, d_preds = cotangents
    dt = jnp.dtype(dtype_str)
    wp = wp_of(xs)
    cf = xs.shape[-1]  # forcing channel count (frame = forcings + feedback)
    L = len(ks)

    # the feedback INPUT of each step, rebuilt vectorized from the stored
    # predictions / teacher values (fb_0 is the seed)
    sel = draws_f[:-1, :, None, None]
    fb_seq = jnp.concatenate(
        [prev0n[None], sel * ysn[:-1] + (1.0 - sel) * preds[:-1]], axis=0
    )

    zero_pgrads = vary_like(jax.tree.map(jnp.zeros_like, params), xs)
    d_final = vary_like(
        jax.tree.map(
            lambda t: t.astype(jnp.float32), [tuple(s) for s in d_final]
        ),
        xs,
    )
    # the last blend's output is dropped (unvarying zeros break shard_map
    # scan-carry typing — mark like the data)
    d_fb_T = vary_like(jnp.zeros_like(prev0n), xs)

    T, B, H, WP, CF = xs.shape
    shapes = [(h.shape[-2], h.shape[-1]) for h, _ in final]

    def back(carry, inp):
        d_state, d_fb_next, d_params, state_next = carry
        x_tp, state_in_p, fb_t, y_t, pred_t, d_t, d_pred_ext = inp
        x_t = x_tp.reshape(B, H, WP, CF)
        state_in = _unpack_state(state_in_p, shapes)

        # blend adjoint: fb_{t+1} = d_t * y_t + (1 - d_t) * pred_t
        sel_t = d_t[:, None, None]
        d_pred = d_pred_ext + d_fb_next * (1.0 - sel_t)
        d_y_t = d_fb_next * sel_t
        d_draw_t = jnp.sum(d_fb_next * (y_t - pred_t), axis=(1, 2))

        # head adjoint on the next-step carry's last-layer h
        _, head_vjp = jax.vjp(
            lambda hL, hw, hb: _pred_from_h(
                hL, hw, hb, o, w_valid, grid_shape, dt
            ),
            state_next[L - 1][0], params["head"]["w"], params["head"]["b"],
        )
        dh_L, dhw, dhb = head_vjp(d_pred)
        d_state = [list(s) for s in d_state]
        d_state[L - 1] = (d_state[L - 1][0] + dh_L, d_state[L - 1][1])

        # fused cell backward through all layers on the rebuilt frame
        fb_m = _fb_to_margin(fb_t, padded_shape, o, wp)
        frame = jnp.concatenate([x_t, fb_m.astype(dt)], axis=-1)
        new_d, d_frame, cells_g = _cells_bwd_step(
            params, frame, state_in, state_next, d_state,
            d_params["cells"], ks, o, w_valid, dt,
        )
        d_x_t = d_frame[..., :cf].astype(xs.dtype)
        # feedback-channel cotangent back through pad_cols . pad_geo
        _, fb_vjp = jax.vjp(
            lambda f: _fb_to_margin(f, padded_shape, o, wp), fb_t
        )
        (d_fb_t,) = fb_vjp(d_frame[..., cf:])

        head_g = d_params["head"]
        d_params = dict(
            d_params,
            cells=cells_g,
            head={"w": head_g["w"] + dhw.astype(head_g["w"].dtype),
                  "b": head_g["b"] + dhb.astype(head_g["b"].dtype)},
        )
        return (new_d, d_fb_t, d_params, state_in), (
            d_x_t.reshape(B, H, WP * CF), d_y_t, d_draw_t
        )

    (d_state0, d_prev0, d_params, _), (d_xs, d_ysn, d_draws) = jax.lax.scan(
        back,
        (d_final, d_fb_T, zero_pgrads, [tuple(s) for s in final]),
        (xs.reshape(T, B, H, WP * CF), state_stack, fb_seq, ysn, preds,
         draws_f, d_preds),
        reverse=True,
        unroll=_unroll_of(unroll, train=True),
    )
    return d_params, d_xs.reshape(T, B, H, WP, CF), d_prev0, d_ysn, \
        d_draws, d_state0


scan_seq2seq_pallas2.defvjp(_s2s_fwd, _s2s_bwd)
