from tpu_llama.ops.quant import (  # noqa: F401
    QuantTensor,
    dequantize,
    pick_group_size,
    quantize_q8,
)
from tpu_llama.ops.matmul import q8_matmul  # noqa: F401
