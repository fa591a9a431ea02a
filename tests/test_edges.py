"""Edge-case coverage: config validation, registry dispatch, pipeline
remainders, grid properties."""

import numpy as np
import pytest

from nasa_niswan_tpu.core.grid import GridSpec
from nasa_niswan_tpu.data.pipeline import batch_iterator
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
from nasa_niswan_tpu.data.dataset import SequenceDataset, SingleStepDataset
from nasa_niswan_tpu.models.registry import build_model, model_family
from nasa_niswan_tpu.train.config import TrainConfig


def test_model_family_dispatch():
    assert model_family("LSTM-64K5.32K3.16K3-E33OMA-8C-BCB-2024") == "LSTM"
    assert model_family("UNet-foo") == "UNet"
    assert model_family("PIX2PIX-bar") == "PIX2PIX"
    with pytest.raises(ValueError):
        model_family("Transformer-x")


def test_config_validates_hidden_channels():
    with pytest.raises(ValueError):
        TrainConfig(hidden_channels=(64, 32), num_layers=3)


def test_config_family_property():
    assert TrainConfig().family == "LSTM"


def test_grid_properties():
    g = GridSpec()
    assert g.shape == (90, 144)
    assert g.lat[0] == pytest.approx(-89.0) and g.lat[-1] == pytest.approx(89.0)
    assert g.lon[0] == pytest.approx(-178.75)
    w = g.coslat_weights()
    assert w.shape == (90,) and w.min() > 0
    assert g.padded_shape(5, 5) == (100, 154)


def test_batch_iterator_remainder():
    data = synthetic_e33oma_90d(T=40, H=8, W=12, seed=9)
    ds = SequenceDataset(data, period="train", sequence_length=3)
    n = len(ds)
    full = list(batch_iterator(ds, 8, drop_last=False, shuffle=False))
    dropped = list(batch_iterator(ds, 8, drop_last=True, shuffle=False))
    assert sum(b[0].shape[0] for b in full) == n
    assert sum(b[0].shape[0] for b in dropped) == n - n % 8
    if n % 8:
        assert full[-1][0].shape[0] == n % 8


def test_single_step_rejects_bad_channels():
    data = synthetic_e33oma_90d(T=20, H=8, W=12, seed=9)
    with pytest.raises(ValueError):
        SingleStepDataset(data, period="train", in_channels=7)


def test_sequence_rejects_bad_period():
    data = synthetic_e33oma_90d(T=20, H=8, W=12, seed=9)
    with pytest.raises(ValueError):
        SequenceDataset(data, period="holdout", sequence_length=3)


def test_sequence_missing_static_raises():
    data = synthetic_e33oma_90d(T=20, H=8, W=12, seed=9, n_static=1)
    with pytest.raises(ValueError):
        SequenceDataset(data, period="train", sequence_length=3, in_channels=9)


def test_build_model_unet_and_pix2pix_apply_shapes():
    import jax

    # 128 = the pix2pix generator's minimum grid (7 stride-2 stages); tiny
    # widths — the shape contract is architecture arithmetic, not capacity
    for name, shape in (("UNet-t", (1, 32, 48, 2)), ("PIX2PIX-t", (1, 128, 128, 2))):
        bundle = build_model(name, in_channels=2, unet_features=(2, 4, 8, 16),
                             pix2pix_features=4)
        params, state = bundle.init(jax.random.PRNGKey(0))
        out, _ = bundle.apply(params, state, np.zeros(shape, np.float32))
        assert out.shape[:3] == shape[:3] and out.shape[-1] == 1
