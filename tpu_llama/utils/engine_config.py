"""Engine/serving configuration file (SURVEY §5.6).

The reference's model shape comes solely from the checkpoint header and its
runtime knobs from five CLI flags (llama2.ts:399-424).  That stays true here
— model shape is never configured — but the ENGINE has deployment knobs
(mesh shape, quantization, batching limits, serving) that load from one
JSON file:

    {
      "checkpoint": "model.bin", "tokenizer": "tokenizer.bin",
      "quant": "int8", "kv_dtype": "int8",
      "max_batch": 32, "precision": "default",
      "mesh": {"data": 1, "model": 4},
      "server": {"port": 8000, "request_log": "requests.jsonl",
                 "watchdog_s": 120}
    }
"""

from __future__ import annotations

import dataclasses
import json
import os


@dataclasses.dataclass
class ServerConfig:
    port: int = 8000
    host: str = "127.0.0.1"
    request_log: str | None = None
    watchdog_s: float | None = None


@dataclasses.dataclass
class EngineConfig:
    checkpoint: str = "model.bin"
    tokenizer: str = "tokenizer.bin"
    quant: str | None = None  # None | "int8" | "w8a8"
    kv_dtype: str = "float32"  # "float32" | "bfloat16" | "int8"
    max_batch: int = 8
    precision: str = "default"  # "default" | "highest"
    seq_len: int | None = None
    kv_layout: str = "dense"  # "dense" | "paged" (paged implies int8 KV)
    page_size: int = 512
    num_pages: int | None = None  # paged pool size (default: dense-equiv)
    attn: str = "auto"  # "auto" | "flash" | "flash_dma" | "xla"
    fuse: bool = True  # fuse qkv / gate-up projections (off for model-TP)
    mesh_data: int = 1
    mesh_model: int = 1
    server: ServerConfig = dataclasses.field(default_factory=ServerConfig)

    @classmethod
    def load(cls, path: str | os.PathLike) -> "EngineConfig":
        raw = json.loads(open(path).read())
        mesh = raw.pop("mesh", {})
        server = raw.pop("server", {})
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown engine config keys: {sorted(unknown)}")
        cfg = cls(**raw)
        cfg.mesh_data = int(mesh.get("data", 1))
        cfg.mesh_model = int(mesh.get("model", 1))
        cfg.server = ServerConfig(**server)
        return cfg

    def save(self, path: str | os.PathLike) -> None:
        d = dataclasses.asdict(self)
        d["mesh"] = {"data": d.pop("mesh_data"), "model": d.pop("mesh_model")}
        with open(path, "w") as f:
            json.dump(d, f, indent=1)

    def build_engine(self):
        """Load checkpoint + tokenizer and construct the Engine."""
        from tpu_llama.io import Tokenizer, load_checkpoint
        from tpu_llama.models import params_from_raw, quantize_params
        from tpu_llama.runtime import Engine

        raw = load_checkpoint(self.checkpoint)
        tok = Tokenizer.load(self.tokenizer, vocab_size=raw.config.vocab_size)
        params = params_from_raw(raw)
        # The explicit-TP FUSED path (VERDICT r2 #3): shard-interleaved
        # fused layouts + W8A8 + the sub-span fused kernels under shard_map
        # (parallel/tp.py).  GSPMD cannot split the interleaved column
        # order, so this routes decode/prefill through the explicit path.
        tp_fused = (self.fuse and self.mesh_model > 1
                    and self.mesh_data == 1 and self.quant == "w8a8"
                    and self.kv_layout == "dense"
                    and raw.config.dim % (128 * self.mesh_model) == 0)
        if self.fuse and (self.mesh_model == 1 or tp_fused):
            # fused qkv/w13 layouts halve per-layer launch count and enable
            # the one-Pallas-call-per-layer decode path (ops/fused_layer.py)
            from tpu_llama.models.llama import fuse_projections

            params = fuse_projections(
                params, tp=self.mesh_model if tp_fused else 1)
        if self.quant == "int8":
            params = quantize_params(params)
        elif self.quant == "w8a8":
            params = quantize_params(params, mode="w8a8")
        elif self.quant is not None:
            raise ValueError(f"unknown quant mode {self.quant}")
        mesh = None
        if self.mesh_data * self.mesh_model > 1:
            from tpu_llama.parallel import MeshConfig, make_mesh, shard_params

            mesh = make_mesh(MeshConfig(self.mesh_data, self.mesh_model))
            params = shard_params(params, mesh)
        engine = Engine(params, raw.config, max_batch=self.max_batch,
                        kv_dtype=self.kv_dtype, precision=self.precision,
                        seq_len=self.seq_len, mesh=mesh,
                        kv_layout=self.kv_layout, page_size=self.page_size,
                        num_pages=self.num_pages, attn=self.attn,
                        tp_fused=tp_fused)
        return engine, tok
