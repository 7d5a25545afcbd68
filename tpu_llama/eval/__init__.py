from tpu_llama.eval.ppl import perplexity, ppl_delta  # noqa: F401
