from tmrnet_tpu.ops.nl_attention import nl_attention  # noqa: F401
from tmrnet_tpu.ops.time_conv import time_conv_fused  # noqa: F401
from tmrnet_tpu.ops.quant import (  # noqa: F401
    int8_matmul,
    quantize_per_channel,
    quantize_per_tensor,
    quantized_matmul,
)
