"""UNet parity vs a spec-driven torch oracle (contract: model.py:121-193)."""

import numpy as np
import torch
import torch.nn as nn

from nasa_niswan_tpu.models.unet import UNetConfig, unet_apply, unet_init


def t_block(ci, co):
    return nn.Sequential(
        nn.Conv2d(ci, co, 3, padding=1), nn.BatchNorm2d(co), nn.ReLU(),
        nn.Conv2d(co, co, 3, padding=1), nn.BatchNorm2d(co), nn.ReLU(),
    )


class TorchUNet(nn.Module):
    def __init__(self, in_ch, out_ch, feats):
        super().__init__()
        chans = [in_ch] + list(feats)
        self.encs = nn.ModuleList(t_block(chans[i], chans[i + 1]) for i in range(4))
        self.pool = nn.MaxPool2d(2, 2)
        self.mid = t_block(feats[-1], 2 * feats[-1])
        ups, blocks = [], []
        ci = 2 * feats[-1]
        for co in reversed(feats):
            ups.append(nn.ConvTranspose2d(ci, co, 2, stride=2))
            blocks.append(t_block(ci, co))
            ci = co
        self.ups, self.blocks = nn.ModuleList(ups), nn.ModuleList(blocks)
        self.head = nn.Conv2d(feats[0], out_ch, 1)

    def forward(self, x):
        skips = []
        for enc in self.encs:
            x = enc(x)
            skips.append(x)
            x = self.pool(x)
        x = self.mid(x)
        for up, blk, skip in zip(self.ups, self.blocks, reversed(skips)):
            x = blk(torch.cat([up(x), skip], dim=1))
        return self.head(x)


def copy_block(tb, params, state):
    """Copy one torch t_block's weights into our conv_block params/state."""
    for j, (conv_key, bn_key) in enumerate([("conv1", "bn1"), ("conv2", "bn2")]):
        conv, bn = tb[3 * j], tb[3 * j + 1]
        params[conv_key]["w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        params[conv_key]["b"] = conv.bias.detach().numpy()
        params[bn_key]["scale"] = bn.weight.detach().numpy()
        params[bn_key]["bias"] = bn.bias.detach().numpy()
        # .copy(): torch mutates running stats in place during train forward
        state[bn_key]["mean"] = bn.running_mean.detach().numpy().copy()
        state[bn_key]["var"] = bn.running_var.detach().numpy().copy()


def make_pair(in_ch=2, out_ch=1, feats=(4, 8, 16, 32), seed=0):
    import jax

    torch.manual_seed(seed)
    tm = TorchUNet(in_ch, out_ch, feats)
    cfg = UNetConfig(in_channels=in_ch, out_channels=out_ch, features=feats)
    params, state = unet_init(jax.random.PRNGKey(0), cfg)
    for i in range(4):
        copy_block(tm.encs[i], params[f"enc{i+1}"], state[f"enc{i+1}"])
    copy_block(tm.mid, params["bottleneck"], state["bottleneck"])
    for i in range(4):
        name = f"dec{4-i}"
        up = tm.ups[i]
        params[name]["up"]["w"] = up.weight.detach().numpy().transpose(2, 3, 1, 0)
        params[name]["up"]["b"] = up.bias.detach().numpy()
        copy_block(tm.blocks[i], params[name]["block"], state[name])
    params["head"]["w"] = tm.head.weight.detach().numpy().transpose(2, 3, 1, 0)
    params["head"]["b"] = tm.head.bias.detach().numpy()
    return tm, params, state, cfg


def test_unet_eval_matches_torch(rng):
    tm, params, state, _ = make_pair()
    tm.eval()
    x = rng.standard_normal((2, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got, _ = unet_apply(params, state, np.moveaxis(x, 1, -1), training=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=2e-5)


def test_unet_train_mode_and_running_stats(rng):
    tm, params, state, _ = make_pair(seed=1)
    tm.train()
    x = rng.standard_normal((4, 2, 32, 32)).astype(np.float32)
    want = tm(torch.from_numpy(x)).detach().numpy()
    got, new_state = unet_apply(params, state, np.moveaxis(x, 1, -1), training=True)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=2e-4)
    # running stats updated with torch momentum semantics
    np.testing.assert_allclose(
        np.asarray(new_state["enc1"]["bn1"]["mean"]),
        tm.encs[0][1].running_mean.detach().numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["enc1"]["bn1"]["var"]),
        tm.encs[0][1].running_var.detach().numpy(),
        atol=1e-5,
    )


def test_unet_output_shape_canonical():
    """Canonical padded input 256x256 -> same spatial size out (train.py crops
    [83:173, 56:200] from it)."""
    import jax

    # thin feature widths: the 256->256 spatial contract is pure
    # architecture arithmetic (4 pools + 4 ups), independent of capacity
    cfg = UNetConfig(in_channels=5, features=(4, 8, 16, 32))
    params, state = unet_init(jax.random.PRNGKey(0), cfg)
    x = np.zeros((1, 256, 256, 5), np.float32)
    out, _ = unet_apply(params, state, x, training=False)
    assert out.shape == (1, 256, 256, 1)
