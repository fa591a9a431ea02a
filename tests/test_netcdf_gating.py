"""netCDF module gating: clear errors without xarray; pure helpers work."""

import pytest

import nasa_niswan_tpu.data.netcdf as nc
from nasa_niswan_tpu.data.catalog import daily_filename


def test_daily_filename():
    assert daily_filename("19500101", "velocity") == "19500101.aijlh1E33oma_ai.nc"
    assert daily_filename("19500101", "tracer_conc") == "19500101.taijlh1E33oma_ai.nc"


@pytest.mark.skipif(nc.HAVE_XARRAY, reason="xarray present; gate not active")
def test_gated_functions_raise_clear_error(tmp_path):
    with pytest.raises(ImportError, match="xarray"):
        nc.load_time_index(str(tmp_path))
    with pytest.raises(ImportError, match="xarray"):
        nc.pack_to_npz(str(tmp_path), str(tmp_path / "o.npz"))
    with pytest.raises(ImportError, match="xarray"):
        nc.LazyE33OMASingleStep(str(tmp_path), period="train")
    with pytest.raises(ImportError, match="xarray"):
        nc.LazyE33OMASequence(str(tmp_path), period="train")


def test_json_normalizer_values():
    norm = nc.json_normalizer("bcb")
    assert norm.x_mean.shape == (5,)
    assert norm.y_std == pytest.approx(57.252777099609375)
    norm2 = nc.json_normalizer("bcb", transform=True)
    assert norm2.y_mean == pytest.approx(-0.9222941398620605)
