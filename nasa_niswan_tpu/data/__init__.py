from nasa_niswan_tpu.data.statistics import (
    VariableStats,
    load_statistics,
    species_stats,
    SPECIES,
)
from nasa_niswan_tpu.data.catalog import FILE_FAMILIES, SPECIES_VARS
from nasa_niswan_tpu.data.synthetic import synthetic_e33oma_90d
from nasa_niswan_tpu.data.dataset import (
    SequenceDataset,
    SingleStepDataset,
    Seq2SeqDataset,
    Normalizer,
    make_preprocess_fn,
)
from nasa_niswan_tpu.data.fusion import fuse_levels, fusion_channel_count
from nasa_niswan_tpu.data.pipeline import batch_iterator, device_prefetch
