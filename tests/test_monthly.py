"""Monthly-breakdown and animation-export helpers."""

import numpy as np

from nasa_niswan_tpu.core.grid import MODELE_2x2P5 as g
from nasa_niswan_tpu.evalx.evaluate import monthly_breakdown, save_animation_frames


def test_monthly_breakdown(rng):
    gts = rng.standard_normal((20, 90, 144)) + 3
    pds = gts + 0.05 * rng.standard_normal((20, 90, 144))
    months = np.array([2] * 10 + [8] * 10)
    out = monthly_breakdown(gts, pds, months, g.lat, g.lon)
    assert set(out) == {2, 8}
    assert len(out[2]) == 8  # all named regions
    assert all(v > 0.9 for v in out[2].values())
    # absent month is skipped
    out2 = monthly_breakdown(gts, pds, months, g.lat, g.lon, which=(1, 2))
    assert set(out2) == {2}


def test_animation_frames(tmp_path, rng):
    fields = rng.standard_normal((6, 12, 16))
    n = save_animation_frames(fields, str(tmp_path / "anim"), every=2)
    assert n == 3
    frames = sorted((tmp_path / "anim").glob("frame-*.png"))
    assert len(frames) == 3
    # Robinson-projected frames (test.ipynb cells 31-34 display look)
    n = save_animation_frames(
        fields, str(tmp_path / "robin"), every=3, projection="robinson"
    )
    assert n == 2
    assert len(sorted((tmp_path / "robin").glob("frame-*.png"))) == 2
