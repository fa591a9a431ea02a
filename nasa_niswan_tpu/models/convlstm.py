"""ConvLSTM — the flagship emulator architecture, built TPU-first.

Re-designs the reference ConvLSTM (model.py:196-274) for XLA/TPU:

  * The Python loop over 48 timesteps x 3 layers (model.py:265-271) becomes a
    single ``lax.scan`` carrying per-layer (h, c) — one compiled program, no
    per-step dispatch, O(1) memory in sequence length.
  * The fused gate conv over concat([x, h]) (model.py:219-220) is expressed
    as conv(x, Wx) + conv(h, Wh) + b — mathematically identical (the torch
    kernel split along its input-channel axis) but lets layer 0's
    input-to-hidden conv be *hoisted out of the scan* and run as one large
    batched conv over (B*T) frames, which is far more MXU-efficient than 48
    small convs.
  * Activations flow NHWC (channels on the TPU lane axis); gate nonlinearity
    + state update fuse into the conv epilogue under XLA.  A Pallas fused
    cell kernel is available via ``cell_impl='pallas'``
    (ops/convlstm_pallas.py).

Numerical contract (verified against a torch oracle in tests/test_convlstm.py):
  gates order i, f, g, o along channels (torch.split order, model.py:221);
  c' = c * sigmoid(f) + sigmoid(i) * tanh(g); h' = sigmoid(o) * tanh(c')
  (model.py:228-229); zero-initialized state (model.py:258-262); 1x1 conv
  head on the last layer's h at the final step (model.py:251,274); optional
  per-step head taps (the commented-out ``outputs`` variant used by
  test.ipynb cell 8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nasa_niswan_tpu.models.init import torch_conv_init
from nasa_niswan_tpu.ops.conv import conv2d
from nasa_niswan_tpu.ops.vma import vary_like

Params = Dict[str, Any]


def _auto_backend() -> str:
    """The backend ``cell_impl='auto'`` keys off (seam for tests)."""
    return jax.default_backend()


def resolve_auto_impl(
    B: int, backend: Optional[str] = None, mode: str = "forward"
) -> str:
    """The measured ``cell_impl='auto'`` policy, shared by training
    (``convlstm_apply``), serving (``rollout.resolve_cell_impl``) and the
    seq2seq chunk (``rollout/seq2seq.py``).  Two crossovers, both from
    scripts/bench_cell.py on a v5e chip:

    - ``mode="forward"`` (serving / eval, no grads): the fused pallas2
      kernel wins at B<=4 (1.35x at B=1) and XLA's batched conv wins
      beyond (B=8 forward: 189 vs 142 ms).
    - ``mode="train"`` (BPTT through the scan): the fused Pallas backward
      (ops/convgrad_pallas.py) flips the large-batch case — pallas2 wins
      at EVERY measured batch size (B=1 2.16x, B=2 1.90x, B=4 1.87x,
      B=8 1.05x vs XLA autodiff+remat); XLA only beyond the measured
      range (B>8, which the canonical configs never reach — B=8 already
      needs remat to fit 16 GB HBM).
    """
    if backend is None:
        backend = _auto_backend()
    if backend != "tpu":
        return "xla"
    limit = 8 if mode == "train" else 4
    return "pallas2" if B <= limit else "xla"


def resolve_bptt_fwd(setting: str) -> str:
    """The measured ``bptt_fwd='auto'`` policy, shared by the plain BPTT
    call site (``convlstm_apply``) and the seq2seq chunk
    (``rollout/seq2seq._make_forward_chunk``): on TPU the forward scan
    runs XLA's batched convs — faster at EVERY canonical training batch
    (B=2/4/8 full-step: 113.9/251.7/520.8 vs 119.9/262.5/553.8 ms,
    docs/PERFORMANCE.md) because the fwd also streams the packed
    residual stacks; elsewhere the fused kernel stays (CPU interpret
    coverage).  Re-measure HERE if the crossover ever moves."""
    if setting != "auto":
        return setting
    return "xla" if _auto_backend() == "tpu" else "fused"


@dataclasses.dataclass(frozen=True)
class ConvLSTMConfig:
    in_channels: int = 5
    hidden_channels: Tuple[int, ...] = (64, 32, 16)
    kernel_sizes: Tuple[int, ...] = (5, 3, 3)
    out_channels: int = 1
    compute_dtype: str = "float32"  # "bfloat16" for MXU-native training/serving
    cell_impl: str = "xla"  # "xla" | "pallas" | "pallas2" (fused TPU
    # kernel) | "auto" (trace-time resolution: pallas2 at B<=4 on TPU —
    # where it measures 1.4x faster for serving AND training — else xla)
    scan_unroll: int = 1  # lax.scan unroll factor: amortizes per-step scan
    # machinery over several steps at the cost of a larger program.
    # Serving keeps 1 (unroll 2/4/8 all measured SLOWER for the rollout
    # scan — the floor there is MXU work, docs/PERFORMANCE.md).
    train_scan_unroll: int = 2  # unroll for the whole-scan-BPTT TRAINING
    # scans (fwd-with-stacking + reverse): these carry per-step stack
    # slicing/update machinery the serving scan doesn't, and unroll=2
    # measured 606 -> 553 ms/step (+9.6%) at canonical bs=8 shapes
    # (unroll=4: 559 — no further gain)
    remat: bool = False  # rematerialize scan steps in the backward pass
    # (trade FLOPs for activation memory: O(1) stored activations per step
    # instead of every cell intermediate — enables long-T / 20-level
    # training within HBM)
    bptt_bwd: str = "fused"  # pallas2+remat BPTT backward: "fused" (Pallas
    # backward kernels, no forward replay — ops/convgrad_pallas.py) |
    # "xla" (emit-gates replay + XLA conv grads, the round-2 strategy)
    bptt_fwd: str = "auto"  # cell body of the whole-scan-BPTT FORWARD
    # scans: "fused" (Pallas kernel) | "xla" (_cell_reference_v2 — same
    # margin-masked contract via XLA's batched convs) | "auto" (xla on
    # TPU — measured faster at EVERY canonical training batch, B=2/4/8:
    # 113.9/251.7/520.8 vs 119.9/262.5/553.8 ms/step; the training fwd
    # scan also streams the packed residual stacks, which XLA fuses into
    # the conv epilogue better than the kernel's margin-layout stores —
    # else fused, preserving kernel coverage on the CPU suite).  The
    # fused BACKWARD kernels run either way.
    # Retired knobs (round 4): split_xh, fuse_tail, and the batch-block
    # fold all measured neutral-to-negative on hardware and were removed —
    # see docs/PERFORMANCE.md "Retired variants" for the measurements.

    def __post_init__(self):
        if len(self.hidden_channels) != len(self.kernel_sizes):
            raise ValueError("hidden_channels and kernel_sizes must align")
        if self.bptt_bwd not in ("fused", "xla"):
            raise ValueError(f"bptt_bwd must be 'fused' or 'xla', got "
                             f"{self.bptt_bwd!r}")
        if self.bptt_fwd not in ("auto", "fused", "xla"):
            raise ValueError(f"bptt_fwd must be 'auto', 'fused' or 'xla', "
                             f"got {self.bptt_fwd!r}")

    @property
    def num_layers(self) -> int:
        return len(self.hidden_channels)


def convlstm_init(rng: jax.Array, config: ConvLSTMConfig) -> Params:
    """Initialize parameters with torch-default conv init applied to the
    *combined* [x; h] kernel (matching the reference's single fused conv,
    model.py:207-211), then split into Wx / Wh halves."""
    cells: List[Params] = []
    in_ch = config.in_channels
    for hidden, k in zip(config.hidden_channels, config.kernel_sizes):
        rng, cell_rng = jax.random.split(rng)
        kernel, bias = torch_conv_init(
            cell_rng, k, k, in_ch + hidden, 4 * hidden, bias=True
        )
        cells.append(
            {"w_x": kernel[:, :, :in_ch, :], "w_h": kernel[:, :, in_ch:, :], "b": bias}
        )
        in_ch = hidden
    rng, head_rng = jax.random.split(rng)
    head_w, head_b = torch_conv_init(
        head_rng, 1, 1, config.hidden_channels[-1], config.out_channels, bias=True
    )
    return {"cells": cells, "head": {"w": head_w, "b": head_b}}


def gate_update(
    gates: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LSTM state update from pre-activation gates (channel blocks i,f,g,o).

    Shared by the XLA path, the Pallas kernel's reference semantics, and the
    spatially-sharded cell in parallel/spatial.py.
    """
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = c * jax.nn.sigmoid(f) + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _cell_step_xla(
    cell: Params,
    x: jnp.ndarray,
    h: jnp.ndarray,
    c: jnp.ndarray,
    k: int,
    compute_dtype,
    x_already_conved: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    pad = k // 2
    wh = cell["w_h"].astype(compute_dtype)
    gates = conv2d(h.astype(compute_dtype), wh, padding=pad)
    if x_already_conved:
        gates = gates + x
    else:
        wx = cell["w_x"].astype(compute_dtype)
        gates = gates + conv2d(x.astype(compute_dtype), wx, padding=pad)
    gates = gates + cell["b"]
    return gate_update(gates, c)


def convlstm_apply(
    params: Params,
    x: jnp.ndarray,
    config: ConvLSTMConfig,
    *,
    return_per_step: bool = False,
    precompute_input_conv: bool = False,
    initial_state: Optional[Sequence[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
    return_state: bool = False,
    tap_fn=None,
    auto_mode: str = "forward",
):
    """Run the ConvLSTM over a sequence.

    Args:
      x: (B, T, H, W, C) NHWC sequence (use ``nchw_to_nhwc_seq`` to convert
        reference-layout (B, T, C, H, W) batches).  May also be a TUPLE of
        such arrays: each step's input is their channel concatenation,
        assembled inside the scan body — callers share a common part across
        a vmap (e.g. multi-tracer meteorology, rollout/multitracer.py)
        without materializing the concatenated stack per vmap instance.
      return_per_step: also return the 1-channel head applied to every
        timestep's last-layer h — the reference's per-step taps
        (model.py:264,272; test.ipynb cell 8's ``hs``), shape (B, T, H, W, 1).
      tap_fn: custom per-step tap ``f(h_last) -> ys`` overriding the default
        head tap.  Performance note: a tap whose minor dim is 1 (e.g. the
        raw (B, H, W, 1) head output) forces padded-lane scan writes on TPU
        (~3x scan cost measured on v5e); rollout paths tap a cropped,
        channel-squeezed (B, h, w) map instead.
      precompute_input_conv: hoist layer 0's input conv out of the scan as
        one (B*T)-batched conv.  Faster on TPU when activation memory allows
        (costs an extra (B, T, H, W, 4*hidden0) buffer).
      initial_state: optional per-layer (h, c) carry — used by the
        autoregressive rollout to continue a sequence; defaults to zeros
        (model.py:258-262).
      return_state: also return the final per-layer (h, c) carry.
      auto_mode: which measured crossover ``cell_impl='auto'`` resolves
        against — "forward" (no grads; serving/eval) or "train" (the
        caller differentiates through this apply; the fused BPTT backward
        moves the pallas2/XLA crossover).  See ``resolve_auto_impl``.

    Returns:
      pred (B, H, W, out_channels), optionally per-step taps and final state.
    """
    compute_dtype = jnp.dtype(config.compute_dtype)
    x_parts = x if isinstance(x, tuple) else (x,)
    B, T, H, W = x_parts[0].shape[:4]
    n_layers = config.num_layers

    cell_impl = config.cell_impl
    if cell_impl == "auto":
        # trace-time measured policy; auto_mode="train" when the caller
        # will take grads (the BPTT crossover differs from the forward's).
        # The train-mode B<=8 crossover is earned by the whole-scan fused
        # BPTT — when that route can't engage (hoisted input conv, taps,
        # no remat), differentiating pallas2 means per-cell custom VJPs:
        # measured 3.7x slower than XLA AND residual-stacking (OOM at
        # canonical B=8), so auto resolves to xla there.
        bptt_route_ok = (
            config.remat
            and not return_per_step
            and tap_fn is None
            and not precompute_input_conv
        )
        if auto_mode == "train" and not bptt_route_ok:
            cell_impl = "xla"
        else:
            cell_impl = resolve_auto_impl(B, mode=auto_mode)

    pallas2 = cell_impl == "pallas2"
    w_valid = W
    if pallas2:
        # second-gen fused kernel: everything lives in the padded-column
        # layout (valid data at cols [o2, o2+W), zero margins, total width
        # a sublane-tile multiple) — see ops/convlstm_pallas2.py
        from nasa_niswan_tpu.ops.convlstm_pallas2 import (
            cell_step_pallas2,
            col_margin,
            pad_cols,
            padded_cols,
        )

        o2 = col_margin(config.kernel_sizes)
        wp = padded_cols(W, o2)
        # cast BEFORE building the padded-column copy: the cell consumes
        # the compute dtype anyway, and at training shapes the bf16 copy
        # (vs f32) is the difference between fitting B=8 in HBM or not
        x_parts = tuple(
            pad_cols(p_.astype(compute_dtype), o2, wp) for p_ in x_parts
        )
        W = wp

        cell_step = lambda cell, xt, h, c, k, dt, pre=False: cell_step_pallas2(
            cell, xt, h, c, k, dt, o2, w_valid, x_already_conved=pre,
        )
    elif cell_impl == "pallas":
        from nasa_niswan_tpu.ops.convlstm_pallas import cell_step_pallas

        cell_step = lambda cell, xt, h, c, k, dt, pre=False: cell_step_pallas(
            cell, xt, h, c, k, dt, x_already_conved=pre
        )
    else:
        cell_step = _cell_step_xla

    if initial_state is None:
        state = vary_like(
            [
                (
                    jnp.zeros((B, H, W, hc), jnp.float32),
                    jnp.zeros((B, H, W, hc), jnp.float32),
                )
                for hc in config.hidden_channels
            ],
            x_parts[0],
        )
    else:
        state = [tuple(s) for s in initial_state]
        if pallas2 and state[0][0].shape[2] == w_valid:
            # continuation state handed over in the standard layout
            state = [
                (pad_cols(h, o2, wp), pad_cols(c, o2, wp)) for h, c in state
            ]

    xs = tuple(jnp.moveaxis(p, 1, 0) for p in x_parts)  # time-major parts

    if precompute_input_conv:
        if len(xs) > 1:
            raise ValueError("precompute_input_conv needs a single input part")
        k0 = config.kernel_sizes[0]
        wx0 = params["cells"][0]["w_x"].astype(compute_dtype)
        flat = xs[0].reshape(T * B, H, W, xs[0].shape[-1]).astype(compute_dtype)
        xs = (conv2d(flat, wx0, padding=k0 // 2).reshape(T, B, H, W, -1),)

    if (
        pallas2
        and config.remat
        and not return_per_step
        and tap_fn is None
        and not precompute_input_conv
    ):
        # Training path: ``jax.checkpoint`` cannot rematerialize through the
        # cell's custom VJP, so the per-cell residuals would stack across
        # the scan (~+3.5 GiB at canonical B=4; OOM at B=8).  The
        # whole-scan BPTT keeps XLA-remat's storage (params, xs, per-step
        # input carries) and backpropagates with the fused Pallas backward
        # kernels — no forward replay (ops/convlstm_bptt.py; bptt_bwd="xla"
        # selects the emit-gates-replay fallback).
        from nasa_niswan_tpu.ops.convlstm_bptt import scan_cells_pallas2

        xs_cat = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
        final_state = scan_cells_pallas2(
            params,
            xs_cat,
            [tuple(s) for s in state],
            tuple(config.kernel_sizes),
            o2,
            w_valid,
            config.compute_dtype,
            # (primal, train): eval through the custom_vjp primal keeps
            # the serving unroll; the differentiated scans use the
            # training unroll (ops/convlstm_bptt._unroll_of)
            (config.scan_unroll, config.train_scan_unroll),
            config.bptt_bwd,
            resolve_bptt_fwd(config.bptt_fwd),
        )
        return _finish(
            final_state, None, params, config, compute_dtype,
            pallas2, o2 if pallas2 else 0, w_valid,
            return_per_step, return_state,
        )

    def step(carry, x_t):
        new_carry = []
        inp = x_t[0] if len(x_t) == 1 else jnp.concatenate(x_t, axis=-1)
        for li in range(n_layers):
            h, c = carry[li]
            h, c = cell_step(
                params["cells"][li],
                inp,
                h,
                c,
                config.kernel_sizes[li],
                compute_dtype,
                precompute_input_conv and li == 0,
            )
            new_carry.append((h, c))
            inp = h
        if not return_per_step:
            tap = None
            return new_carry, tap
        tap_in = inp[:, :, o2 : o2 + w_valid, :] if pallas2 else inp
        if tap_fn is not None:
            tap = tap_fn(tap_in)
        else:
            tap = conv2d(
                tap_in.astype(compute_dtype),
                params["head"]["w"].astype(compute_dtype),
                params["head"]["b"],
            ).astype(jnp.float32)
        return new_carry, tap

    if config.remat:
        step = jax.checkpoint(step)
    final_state, taps = jax.lax.scan(
        step, state, xs, unroll=config.scan_unroll
    )
    return _finish(
        final_state, taps, params, config, compute_dtype,
        pallas2, o2 if pallas2 else 0, w_valid,
        return_per_step, return_state,
    )


def _finish(
    final_state, taps, params, config, compute_dtype,
    pallas2, o2, w_valid, return_per_step, return_state,
):
    """Shared epilogue of ``convlstm_apply``: head conv on the final h,
    tap reordering, and standard-layout state crop."""
    h_last = final_state[-1][0]
    if pallas2:
        h_last = h_last[:, :, o2 : o2 + w_valid, :]
    pred = conv2d(
        h_last.astype(compute_dtype),
        params["head"]["w"].astype(compute_dtype),
        params["head"]["b"],
    ).astype(jnp.float32)

    out = [pred]
    if return_per_step:
        out.append(jnp.moveaxis(taps, 0, 1))  # (B, T, H, W, out)
    if return_state:
        if pallas2:
            # Return the carry in the STANDARD (w_valid) layout regardless
            # of cell_impl, so a saved carry resumes under any impl and
            # diagnostic consumers never see the kernel-internal padded
            # width.  The margins are hard zeros (kernel invariant), so the
            # crop + re-pad on the next chunk is bit-exact.
            final_state = [
                (h[:, :, o2 : o2 + w_valid, :], c[:, :, o2 : o2 + w_valid, :])
                for h, c in final_state
            ]
        out.append(final_state)
    return out[0] if len(out) == 1 else tuple(out)


def convlstm_param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def nchw_to_nhwc_seq(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C, H, W) reference layout -> (B, T, H, W, C) TPU layout."""
    return jnp.moveaxis(x, 2, -1)


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., C, H, W)."""
    return jnp.moveaxis(x, -1, -3)
