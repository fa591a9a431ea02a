"""Model registry: uniform (init, apply) construction for the model zoo.

Replaces the reference's name-prefix dispatch (``args.model.split('-')[0]``,
train.py:35-48) with an explicit family lookup, while still accepting the
reference's encoded model-name strings (e.g.
``LSTM-64K5.32K3.16K3-E33OMA-8C-BCB-<date>``, launcher.sh:10) for
config-file round-trip compatibility.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax

from nasa_niswan_tpu.models.convlstm import (
    ConvLSTMConfig,
    convlstm_apply,
    convlstm_init,
)
from nasa_niswan_tpu.models.pix2pix import (
    GeneratorConfig,
    generator_apply,
    generator_init,
)
from nasa_niswan_tpu.models.unet import UNetConfig, unet_apply, unet_init

FAMILIES = ("LSTM", "UNet", "PIX2PIX")


def model_family(model_name: str) -> str:
    """The reference's dispatch key: everything before the first '-'."""
    family = model_name.split("-")[0]
    if family not in FAMILIES:
        raise ValueError(f"unknown model family {family!r}; expected one of {FAMILIES}")
    return family


@dataclasses.dataclass
class ModelBundle:
    """A constructed model: pure init/apply plus metadata the trainer needs.

    ``apply(params, state, x, *, training, rng)`` returns ``(out, new_state)``
    for every family (state is None for stateless models).  ``x`` is
    (B, T, H, W, C) for sequence models and (B, H, W, C) otherwise.
    """

    family: str
    config: Any
    is_sequence: bool
    init: Callable[[jax.Array], Tuple[Any, Any]]
    apply: Callable[..., Tuple[Any, Any]]
    # re-invokes build_model with the original arguments plus overrides —
    # lets mesh-step builders force a safe cell implementation (e.g. the
    # GSPMD partitioner cannot split a pallas_call)
    rebuild: Callable[..., "ModelBundle"] = None


def build_model(
    model_name: str,
    *,
    in_channels: int,
    hidden_channels: Tuple[int, ...] = (64, 32, 16),
    kernel_sizes: Tuple[int, ...] = (5, 3, 3),
    compute_dtype: str = "float32",
    cell_impl: str = "xla",
    precompute_input_conv: bool = False,
    unet_features: Tuple[int, ...] = (64, 128, 256, 512),
    pix2pix_features: int = 64,
    remat: bool = True,
    bptt_bwd: str = "fused",
    bptt_fwd: str = "auto",
) -> ModelBundle:
    """remat defaults True: training the canonical config (bs 8, T=48,
    100x154) OOMs a 16 GB chip without per-step rematerialization, and the
    recompute cost is minor next to the conv FLOPs."""
    _kwargs = dict(
        in_channels=in_channels, hidden_channels=hidden_channels,
        kernel_sizes=kernel_sizes, compute_dtype=compute_dtype,
        cell_impl=cell_impl, precompute_input_conv=precompute_input_conv,
        unet_features=unet_features, pix2pix_features=pix2pix_features,
        remat=remat, bptt_bwd=bptt_bwd, bptt_fwd=bptt_fwd,
    )

    def _rebuild(**overrides):
        return build_model(model_name, **{**_kwargs, **overrides})

    family = model_family(model_name)

    if family == "LSTM":
        cfg = ConvLSTMConfig(
            in_channels=in_channels,
            hidden_channels=tuple(hidden_channels),
            kernel_sizes=tuple(kernel_sizes),
            compute_dtype=compute_dtype,
            cell_impl=cell_impl,
            remat=remat,
            bptt_bwd=bptt_bwd,
            bptt_fwd=bptt_fwd,
        )

        def init(rng):
            return convlstm_init(rng, cfg), None

        def apply(params, state, x, *, training=False, rng=None):
            del rng
            return (
                convlstm_apply(
                    params, x, cfg, precompute_input_conv=precompute_input_conv,
                    auto_mode="train" if training else "forward",
                ),
                None,
            )

        return ModelBundle("LSTM", cfg, True, init, apply, _rebuild)

    if family == "UNet":
        cfg = UNetConfig(in_channels=in_channels, features=tuple(unet_features))

        def init(rng):
            return unet_init(rng, cfg)

        def apply(params, state, x, *, training=False, rng=None):
            del rng
            return unet_apply(params, state, x, training=training)

        return ModelBundle("UNet", cfg, False, init, apply, _rebuild)

    # PIX2PIX: the reference trains the Generator alone with MSE+L1
    # (train.py:35-39,105); adversarial training is available via
    # models.pix2pix.discriminator_* for completeness.
    cfg = GeneratorConfig(in_channels=in_channels, features=pix2pix_features)

    def init(rng):
        return generator_init(rng, cfg), None

    def apply(params, state, x, *, training=False, rng=None):
        return (
            generator_apply(params, x, training=training, dropout_rng=rng),
            None,
        )

    return ModelBundle("PIX2PIX", cfg, False, init, apply, _rebuild)
