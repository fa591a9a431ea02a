"""pix2pix Generator / PatchGAN Discriminator parity vs a spec-driven torch
oracle (contract: model.py:5-118)."""

import numpy as np
import torch
import torch.nn as nn

from nasa_niswan_tpu.models.pix2pix import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_apply,
    discriminator_init,
    generator_apply,
    generator_init,
)


def enc_block(ci, co):
    return nn.Sequential(
        nn.Conv2d(ci, co, 4, 2, 1, bias=False, padding_mode="reflect"),
        nn.InstanceNorm2d(co, affine=True),
        nn.LeakyReLU(0.2),
    )


def dec_block(ci, co):
    return nn.Sequential(
        nn.ConvTranspose2d(ci, co, 4, 2, 1, bias=False),
        nn.InstanceNorm2d(co, affine=True),
        nn.ReLU(),
    )


class TorchGen(nn.Module):
    def __init__(self, in_ch, f):
        super().__init__()
        self.initial = nn.Sequential(
            nn.Conv2d(in_ch, f, 4, 2, 1, padding_mode="reflect"), nn.LeakyReLU(0.2)
        )
        enc_ch = [(f, 2 * f), (2 * f, 4 * f), (4 * f, 8 * f)] + [(8 * f, 8 * f)] * 3
        self.encs = nn.ModuleList(enc_block(ci, co) for ci, co in enc_ch)
        self.mid = nn.Sequential(
            nn.Conv2d(8 * f, 8 * f, 4, 2, 1, padding_mode="reflect"),
            nn.LeakyReLU(0.2),
        )
        dec_ch = [(8 * f, 8 * f)] + [(16 * f, 8 * f)] * 3 + [
            (16 * f, 4 * f), (8 * f, 2 * f), (4 * f, f),
        ]
        self.decs = nn.ModuleList(dec_block(ci, co) for ci, co in dec_ch)
        self.final = nn.ConvTranspose2d(2 * f, 1, 4, 2, 1)

    def forward(self, x):
        e = [self.initial(x)]
        for enc in self.encs:
            e.append(enc(e[-1]))
        h = self.mid(e[-1])
        h = self.decs[0](h)
        for i, dec in enumerate(self.decs[1:], 1):
            h = dec(torch.cat([h, e[7 - i]], dim=1))
        return self.final(torch.cat([h, e[0]], dim=1))


def copy_conv(conv, dst, bias=True):
    dst["w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0).copy()
    if bias:
        dst["b"] = conv.bias.detach().numpy().copy()


def copy_convT(conv, dst, bias=False):
    dst["w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0).copy()  # (I,O,k,k)->(k,k,O,I)
    if bias:
        dst["b"] = conv.bias.detach().numpy().copy()


def copy_norm(norm, dst):
    dst["norm"]["scale"] = norm.weight.detach().numpy().copy()
    dst["norm"]["bias"] = norm.bias.detach().numpy().copy()


def test_generator_matches_torch(rng):
    import jax

    torch.manual_seed(0)
    tm = TorchGen(2, 4).eval()
    cfg = GeneratorConfig(in_channels=2, features=4)
    params = generator_init(jax.random.PRNGKey(0), cfg)

    copy_conv(tm.initial[0], params["initial"])
    for i in range(6):
        copy_conv(tm.encs[i][0], params[f"enc{i+1}"], bias=False)
        copy_norm(tm.encs[i][1], params[f"enc{i+1}"])
    copy_conv(tm.mid[0], params["bottleneck"])
    for i in range(7):
        copy_convT(tm.decs[i][0], params[f"dec{i+1}"], bias=False)
        copy_norm(tm.decs[i][1], params[f"dec{i+1}"])
    params["final"]["w"] = tm.final.weight.detach().numpy().transpose(2, 3, 1, 0).copy()
    params["final"]["b"] = tm.final.bias.detach().numpy().copy()

    x = rng.standard_normal((1, 2, 256, 256)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = generator_apply(params, np.moveaxis(x, 1, -1), training=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=5e-4)


class TorchDisc(nn.Module):
    def __init__(self, in_ch, feats):
        super().__init__()
        self.initial = nn.Sequential(
            nn.Conv2d(in_ch * 2, feats[0], 4, 2, 1, padding_mode="reflect"),
            nn.LeakyReLU(0.2),
        )
        blocks = []
        ci = feats[0]
        for f in feats[1:]:
            s = 1 if f == feats[-1] else 2
            blocks.append(
                nn.Sequential(
                    nn.Conv2d(ci, f, 4, s, 1, bias=False, padding_mode="reflect"),
                    nn.InstanceNorm2d(f, affine=True),
                    nn.LeakyReLU(0.2),
                )
            )
            ci = f
        self.blocks = nn.ModuleList(blocks)
        self.final = nn.Conv2d(ci, 1, 4, 1, 1, padding_mode="reflect")

    def forward(self, x, y):
        h = self.initial(torch.cat([x, y], dim=1))
        for b in self.blocks:
            h = b(h)
        return self.final(h)


def test_discriminator_matches_torch(rng):
    import jax

    torch.manual_seed(0)
    feats = (4, 8, 16, 32)
    tm = TorchDisc(1, feats).eval()
    cfg = DiscriminatorConfig(in_channels=1, features=feats)
    params = discriminator_init(jax.random.PRNGKey(0), cfg)
    copy_conv(tm.initial[0], params["initial"])
    for i in range(3):
        copy_conv(tm.blocks[i][0], params[f"block{i+1}"], bias=False)
        copy_norm(tm.blocks[i][1], params[f"block{i+1}"])
    copy_conv(tm.final, params["final"])

    x = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)
    y = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = discriminator_apply(
        params, np.moveaxis(x, 1, -1), np.moveaxis(y, 1, -1), cfg
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, atol=2e-5)
