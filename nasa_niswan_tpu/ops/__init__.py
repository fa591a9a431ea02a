from nasa_niswan_tpu.ops.conv import (
    conv2d,
    conv2d_transpose,
    max_pool2d,
    instance_norm,
    batch_norm,
    dropout2d,
)
