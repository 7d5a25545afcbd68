from tpu_llama.compat.rng import Xorshift64Star  # noqa: F401
from tpu_llama.compat.sampling import argmax, sample, sample_topp  # noqa: F401
from tpu_llama.compat.oracle import OracleState, oracle_forward  # noqa: F401
from tpu_llama.compat.generate import generate_compat  # noqa: F401
