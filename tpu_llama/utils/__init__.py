from tpu_llama.utils.profiling import profile_trace  # noqa: F401
from tpu_llama.utils.debug import assert_not_donated, debug_mode, logits_fingerprint  # noqa: F401
from tpu_llama.utils.engine_config import EngineConfig  # noqa: F401
