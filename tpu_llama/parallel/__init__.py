from tpu_llama.parallel.mesh import MeshConfig, make_mesh  # noqa: F401
from tpu_llama.parallel.sharding import (  # noqa: F401
    cache_pspec,
    params_pspecs,
    shard_cache,
    shard_params,
)
from tpu_llama.parallel.tp import tp_forward_decode  # noqa: F401
