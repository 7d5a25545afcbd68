from tpu_llama.runtime.engine import Engine  # noqa: F401
from tpu_llama.runtime.scheduler import ContinuousBatcher, Request  # noqa: F401
from tpu_llama.runtime.paged import PagePool  # noqa: F401
