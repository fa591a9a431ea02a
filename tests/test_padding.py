"""Padding parity tests.

The oracle is an independent numpy re-statement of the reference padding
semantics (dataset.py:22-53 for 3-D fields, dataset.py:67-98 for 4-D
sequences), plus the 5x5 synthetic check from dataset_config.ipynb cells
14-15.
"""

import numpy as np
import pytest

from nasa_niswan_tpu.core.padding import (
    crop_to_grid,
    pad_cyclic_lon,
    pad_geo,
    pad_reflect_lat,
)


def ref_cyclic(data: np.ndarray, target_w: int, lon_axis: int) -> np.ndarray:
    """Numpy oracle for the reference's cyclic lon pad."""
    w = data.shape[lon_axis]
    pad_left = (target_w - w) // 2
    pad_right = target_w - w - pad_left
    take = lambda sl: np.take(data, sl, axis=lon_axis)
    parts = []
    if pad_left:
        parts.append(take(range(w - pad_left, w)))
    parts.append(data)
    if pad_right:
        parts.append(take(range(0, pad_right)))
    return np.concatenate(parts, axis=lon_axis)


def ref_reflect(data: np.ndarray, target_h: int, lat_axis: int) -> np.ndarray:
    """Numpy oracle for the reference's reflective lat pad (lat-mirror intent)."""
    h = data.shape[lat_axis]
    pad_top = (target_h - h) // 2
    pad_bottom = target_h - h - pad_top
    take = lambda sl: np.take(data, sl, axis=lat_axis)
    parts = []
    if pad_top:
        parts.append(take(range(pad_top, 0, -1)))  # rows p..1
    parts.append(data)
    if pad_bottom:
        parts.append(take(range(h - 2, h - 2 - pad_bottom, -1)))  # rows H-2..H-1-p
    return np.concatenate(parts, axis=lat_axis)


def test_cyclic_5x5_prototype():
    # dataset_config.ipynb cell 14-15 prototype: 5x5 -> padded
    x = np.arange(25, dtype=np.float32).reshape(1, 5, 5)
    out = np.asarray(pad_cyclic_lon(x, 9))
    assert out.shape == (1, 5, 9)
    np.testing.assert_array_equal(out, ref_cyclic(x, 9, lon_axis=2))
    # explicit wrap check: left pad columns are the last two source columns
    np.testing.assert_array_equal(out[0, :, :2], x[0, :, -2:])
    np.testing.assert_array_equal(out[0, :, -2:], x[0, :, :2])


def test_reflect_5x5_prototype():
    x = np.arange(25, dtype=np.float32).reshape(1, 5, 5)
    out = np.asarray(pad_reflect_lat(x, 9))
    assert out.shape == (1, 9, 5)
    np.testing.assert_array_equal(out, ref_reflect(x, 9, lat_axis=1))
    # mirror excludes the boundary row: first padded row is source row 2
    np.testing.assert_array_equal(out[0, 0], x[0, 2])
    np.testing.assert_array_equal(out[0, 1], x[0, 1])
    np.testing.assert_array_equal(out[0, -1], x[0, -3])


@pytest.mark.parametrize("shape,target", [((5, 90, 144), (100, 154))])
def test_canonical_pad_3d(rng, shape, target):
    x = rng.standard_normal(shape).astype(np.float32)
    out = np.asarray(pad_geo(x, target))
    assert out.shape == (shape[0], *target)
    oracle = ref_reflect(ref_cyclic(x, target[1], lon_axis=2), target[0], lat_axis=1)
    np.testing.assert_array_equal(out, oracle)


def test_canonical_pad_4d_sequence(rng):
    x = rng.standard_normal((7, 5, 90, 144)).astype(np.float32)
    out = np.asarray(pad_geo(x, (100, 154)))
    assert out.shape == (7, 5, 100, 154)
    oracle = ref_reflect(ref_cyclic(x, 154, lon_axis=3), 100, lat_axis=2)
    np.testing.assert_array_equal(out, oracle)


def test_quirk_channel_flip_matches_upstream_4d(rng):
    """The upstream RNN path (dataset.py:96) np.fliplr's a 4-D array, flipping
    channels instead of latitude; quirk mode must reproduce that exactly."""
    x = rng.standard_normal((3, 4, 90, 144)).astype(np.float32)

    def upstream(data, target_h):
        h = data.shape[2]
        pad_top = (target_h - h) // 2 + 1
        pad_bottom = target_h - h - ((target_h - h) // 2) + 1
        return np.concatenate(
            (
                np.fliplr(data[:, :, 1:pad_top]),
                data,
                np.fliplr(data[:, :, -pad_bottom:-1]),
            ),
            axis=2,
        )

    ours = np.asarray(pad_reflect_lat(x, 100, quirk_channel_flip=True))
    np.testing.assert_array_equal(ours, upstream(x, 100))


def test_pad_zero_is_noop(rng):
    x = rng.standard_normal((2, 90, 144)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(pad_geo(x, (90, 144))), x)


def test_pad_too_large_raises():
    x = np.zeros((1, 8, 8), np.float32)
    with pytest.raises(ValueError):
        pad_cyclic_lon(x, 32)
    with pytest.raises(ValueError):
        pad_reflect_lat(x, 32)


def test_crop_inverts_pad(rng):
    x = rng.standard_normal((5, 90, 144)).astype(np.float32)
    padded = pad_geo(x, (100, 154))
    np.testing.assert_array_equal(np.asarray(crop_to_grid(padded, (90, 144))), x)


def test_crop_offsets_match_reference_train():
    """train.py:99-102: UNet 256x256 -> [83:173, 56:200]; LSTM 100x154 -> [5:95, 5:149]."""
    from nasa_niswan_tpu.core.grid import MODELE_2x2P5 as g

    assert g.crop_offsets((256, 256)) == (83, 56)
    assert g.crop_offsets((100, 154)) == (5, 5)
