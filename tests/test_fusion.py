"""20-level fusion tests (BASELINE config #2): channel layout, surface
degeneracy, end-to-end multi-level training on the fixture."""

import jax
import numpy as np
import pytest

from nasa_niswan_tpu.data.dataset import SequenceDataset
from nasa_niswan_tpu.data.fusion import fuse_levels, fusion_channel_count
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d

GRID = dict(H=16, W=24)


@pytest.fixture(scope="module")
def data3d():
    return synthetic_e33oma_90d(T=80, seed=5, nlev=4, **GRID)


def test_channel_count_and_layout(data3d):
    xs, y = fuse_levels(data3d, "bcb", levels=4)
    assert xs.shape == (80, fusion_channel_count(4), 16, 24)
    assert fusion_channel_count(4) == 14  # 3*4 + prec + src
    # level-major layout: channels 0..3 are u at levels 0..3
    np.testing.assert_array_equal(xs[:, 0], data3d["u"][:, 0])
    np.testing.assert_array_equal(xs[:, 3], data3d["u"][:, 3])
    np.testing.assert_array_equal(xs[:, 4], data3d["v"][:, 0])
    np.testing.assert_array_equal(xs[:, 12], data3d["prec"])
    np.testing.assert_array_equal(xs[:, 13], data3d["bcb_src"])
    # target is the surface level
    np.testing.assert_array_equal(y, data3d["bcb_conc"][:, 0])


def test_surface_config_reproduces_reference_order():
    data = synthetic_e33oma_90d(T=30, seed=6, **GRID)
    xs, y = fuse_levels(data, "bcb", levels=1)
    assert xs.shape[1] == 5  # u, v, w, prec, src (dataset.py:520-526)
    np.testing.assert_array_equal(xs[:, 0], data["u"])
    np.testing.assert_array_equal(xs[:, 3], data["prec"])
    np.testing.assert_array_equal(xs[:, 4], data["bcb_src"])


def test_fused_sequence_dataset_and_training(data3d):
    from nasa_niswan_tpu.models.registry import build_model
    from nasa_niswan_tpu.train.config import TrainConfig
    from nasa_niswan_tpu.train.loop import fit

    fused = fuse_levels(data3d, "bcb", levels=4)
    tr = SequenceDataset(fused, period="train", sequence_length=4)
    va = SequenceDataset(fused, period="val", sequence_length=4)
    assert tr[0][0].shape == (4, 14, 16, 24)

    cfg = TrainConfig(
        model="LSTM-fusion", in_channels=14, hidden_channels=(6,),
        kernel_size=(3,), num_layers=1, sequence_length=4, num_epochs=2,
        batch_size=8, input_size=(20, 28), learning_rate=1e-2,
        snapshot_dir="/tmp/snap_fusion", checkpoint_every=0,
    )
    bundle = build_model(cfg.model, in_channels=14, hidden_channels=(6,),
                         kernel_sizes=(3,))
    out = fit(bundle, tr, va, cfg, verbose=False)
    assert out["logger"]["MSELoss"][-1] < out["logger"]["MSELoss"][0]
