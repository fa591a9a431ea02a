from nasa_niswan_tpu.models.convlstm import (
    ConvLSTMConfig,
    convlstm_init,
    convlstm_apply,
    convlstm_param_count,
)
from nasa_niswan_tpu.models.unet import UNetConfig, unet_init, unet_apply
from nasa_niswan_tpu.models.pix2pix import (
    GeneratorConfig,
    generator_init,
    generator_apply,
    DiscriminatorConfig,
    discriminator_init,
    discriminator_apply,
)
from nasa_niswan_tpu.models.registry import build_model, model_family
