from tpu_llama.models.llama import (  # noqa: F401
    KVCache,
    LayerParams,
    LlamaParams,
    QuantKVCache,
    apply_rope,
    forward_decode,
    forward_prefill,
    make_kv_cache,
    params_from_raw,
    quantize_params,
    random_params,
    rmsnorm,
)
