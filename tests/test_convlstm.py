"""ConvLSTM numerical parity against an independent torch oracle.

The oracle below is written from the documented contract (standard ConvLSTM
equations; gates i,f,g,o from one conv over concat([x,h]); see
nasa_niswan_tpu/models/convlstm.py docstring), executed with torch on CPU.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from nasa_niswan_tpu.models.convlstm import (
    ConvLSTMConfig,
    convlstm_apply,
    convlstm_init,
    convlstm_param_count,
    nchw_to_nhwc_seq,
)


class TorchCell(nn.Module):
    """Oracle cell: fused conv over [x;h] -> 4H gate channels -> LSTM update."""

    def __init__(self, in_ch, hidden, k):
        super().__init__()
        self.hidden = hidden
        self.conv = nn.Conv2d(in_ch + hidden, 4 * hidden, k, padding=k // 2)

    def forward(self, x, h, c):
        gates = self.conv(torch.cat([x, h], dim=1))
        i, f, g, o = torch.split(gates, self.hidden, dim=1)
        c = c * torch.sigmoid(f) + torch.sigmoid(i) * torch.tanh(g)
        h = torch.sigmoid(o) * torch.tanh(c)
        return h, c


def torch_forward(cells, head, x, per_step=False):
    """x: (B, T, C, H, W); python loop over time/layers like the reference."""
    B, T, _, H, W = x.shape
    states = [
        (torch.zeros(B, c.hidden, H, W), torch.zeros(B, c.hidden, H, W))
        for c in cells
    ]
    taps = []
    with torch.no_grad():
        for t in range(T):
            inp = x[:, t]
            for li, cell in enumerate(cells):
                h, c = states[li]
                h, c = cell(inp, h, c)
                states[li] = (h, c)
                inp = h
            if per_step:
                taps.append(head(inp))
        out = head(states[-1][0])
    return (out, torch.stack(taps, dim=1)) if per_step else out


def make_pair(in_ch=3, hiddens=(4, 3), ks=(3, 3), seed=0):
    """Build (torch cells+head, jax params) with identical weights."""
    torch.manual_seed(seed)
    cells = [TorchCell(in_ch, hiddens[0], ks[0])]
    for i in range(1, len(hiddens)):
        cells.append(TorchCell(hiddens[i - 1], hiddens[i], ks[i]))
    head = nn.Conv2d(hiddens[-1], 1, 1)

    jparams = {"cells": [], "head": {}}
    prev = in_ch
    for cell, hid in zip(cells, hiddens):
        w = cell.conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
        jparams["cells"].append(
            {
                "w_x": np.ascontiguousarray(w[:, :, :prev, :]),
                "w_h": np.ascontiguousarray(w[:, :, prev:, :]),
                "b": cell.conv.bias.detach().numpy(),
            }
        )
        prev = hid
    jparams["head"] = {
        "w": head.weight.detach().numpy().transpose(2, 3, 1, 0),
        "b": head.bias.detach().numpy(),
    }
    cfg = ConvLSTMConfig(in_channels=in_ch, hidden_channels=hiddens, kernel_sizes=ks)
    return cells, head, jparams, cfg


def test_param_count_canonical():
    """Reference canonical config has 580,305 trainable params (test.ipynb cell 66)."""
    import jax

    cfg = ConvLSTMConfig(5, (64, 32, 16), (5, 3, 3))
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    assert convlstm_param_count(params) == 580305


def test_forward_matches_torch_oracle(rng):
    cells, head, jparams, cfg = make_pair()
    x = rng.standard_normal((2, 5, 3, 8, 10)).astype(np.float32)
    want = torch_forward(cells, head, torch.from_numpy(x)).numpy()  # (B,1,H,W)
    got = convlstm_apply(jparams, np.asarray(nchw_to_nhwc_seq(x)), cfg)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=2e-5)


def test_per_step_taps_match_oracle(rng):
    cells, head, jparams, cfg = make_pair(seed=1)
    x = rng.standard_normal((1, 4, 3, 8, 10)).astype(np.float32)
    want_out, want_taps = torch_forward(
        cells, head, torch.from_numpy(x), per_step=True
    )
    got_out, got_taps = convlstm_apply(
        jparams, np.asarray(nchw_to_nhwc_seq(x)), cfg, return_per_step=True
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got_taps), -1, 2), want_taps.numpy(), atol=2e-5
    )
    # last tap is the final prediction
    np.testing.assert_allclose(
        np.asarray(got_taps)[:, -1], np.asarray(got_out), atol=1e-6
    )


def test_precomputed_input_conv_is_equivalent(rng):
    _, _, jparams, cfg = make_pair(seed=2)
    x = np.asarray(
        nchw_to_nhwc_seq(rng.standard_normal((2, 6, 3, 8, 10)).astype(np.float32))
    )
    a = convlstm_apply(jparams, x, cfg)
    b = convlstm_apply(jparams, x, cfg, precompute_input_conv=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_state_continuation(rng):
    """Scanning T=6 equals scanning T=3 twice with carried state — the
    contract the autoregressive rollout relies on."""
    _, _, jparams, cfg = make_pair(seed=3)
    x = np.asarray(
        nchw_to_nhwc_seq(rng.standard_normal((1, 6, 3, 8, 10)).astype(np.float32))
    )
    full = convlstm_apply(jparams, x, cfg)
    _, state = convlstm_apply(jparams, x[:, :3], cfg, return_state=True)
    cont = convlstm_apply(jparams, x[:, 3:], cfg, initial_state=state)
    np.testing.assert_allclose(np.asarray(full), np.asarray(cont), atol=1e-6)


def test_init_shapes():
    import jax

    cfg = ConvLSTMConfig(5, (8, 4), (5, 3))
    params = convlstm_init(jax.random.PRNGKey(0), cfg)
    assert params["cells"][0]["w_x"].shape == (5, 5, 5, 32)
    assert params["cells"][0]["w_h"].shape == (5, 5, 8, 32)
    assert params["cells"][1]["w_x"].shape == (3, 3, 8, 16)
    assert params["head"]["w"].shape == (1, 1, 4, 1)
