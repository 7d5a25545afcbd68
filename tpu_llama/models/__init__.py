from tpu_llama.models.llama import (  # noqa: F401
    KVCache,
    LayerParams,
    LlamaParams,
    apply_rope,
    forward_decode,
    forward_prefill,
    params_from_raw,
    random_params,
    rmsnorm,
)
