"""Species coverage: seasalt / clay / bcb variable mapping end to end."""

import numpy as np
import pytest

from nasa_niswan_tpu.data.catalog import PACKED_VARS, SPECIES_VARS
from nasa_niswan_tpu.data.dataset import SequenceDataset, SingleStepDataset
from nasa_niswan_tpu.data.statistics import species_stats
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d


@pytest.mark.parametrize("species", ["seasalt", "clay", "bcb"])
def test_species_pipeline(species):
    data = synthetic_e33oma_90d(species=species, T=40, H=12, W=16, seed=8)
    src_var, conc_var = PACKED_VARS[species]
    assert src_var in data and conc_var in data

    seq = SequenceDataset(data, period="train", species=species, sequence_length=3)
    x, y = seq.raw_item(0)
    np.testing.assert_array_equal(x[0, 4], data[src_var][0])
    np.testing.assert_array_equal(y, data[conc_var][2])

    single = SingleStepDataset(data, period="test", species=species, in_channels=6)
    xs, ys = single.raw_item(0)
    assert xs.shape == (6, 12, 16)

    x_mean, _, y_stats = species_stats(species)
    assert x_mean.shape == (5,)
    assert y_stats.std > 0

    # ModelE file-family mapping exists for each species
    sv = SPECIES_VARS[species]
    assert sv.src_var and sv.conc_var
