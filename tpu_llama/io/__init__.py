from tpu_llama.io.checkpoint import (  # noqa: F401
    RawWeights,
    load_checkpoint,
    write_checkpoint,
)
from tpu_llama.io.tokenizer import Tokenizer  # noqa: F401
