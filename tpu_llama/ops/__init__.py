from tpu_llama.ops.quant import (  # noqa: F401
    ChannelQuantTensor,
    QuantTensor,
    dequantize,
    dequantize_channel,
    pick_group_size,
    quantize_activations,
    quantize_channel,
    quantize_q8,
)
from tpu_llama.ops.matmul import q8_matmul, w8a8_matmul, w8a8_matmul_xla  # noqa: F401
