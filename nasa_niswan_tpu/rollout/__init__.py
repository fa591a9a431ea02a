from nasa_niswan_tpu.rollout.autoregressive import (
    make_rollout_fn,
    make_streaming_rollout,
    model_days_per_min,
)
from nasa_niswan_tpu.rollout.sensitivity import oat_sensitivity
