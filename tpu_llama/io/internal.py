"""Internal checkpoint format: pre-converted (optionally INT8) params.

The reference's only checkpoint format is llama2.c `model.bin`, parsed at
startup every run (llama2.ts:427-436).  For production serving we convert
once offline (tools/convert.py) and load the engine-native layout directly:

    <dir>/manifest.json     — config, format version, per-tensor metadata
    <dir>/<name>.npy        — one mmap-able .npy per tensor
                              (QuantTensors: <name>.q.npy + <name>.s.npy)

Loads are zero-copy mmap -> device_put; a 7B INT8 checkpoint loads in
seconds with no host-side f32 materialization.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from tpu_llama.config import ModelConfig
from tpu_llama.models.llama import LayerParams, LlamaParams
from tpu_llama.ops.quant import ChannelQuantTensor, QuantTensor

FORMAT_VERSION = 1


def _flatten(params: LlamaParams):
    out = {}
    for f in dataclasses.fields(LlamaParams):
        v = getattr(params, f.name)
        if isinstance(v, LayerParams):
            for lf in dataclasses.fields(LayerParams):
                out[f"layers.{lf.name}"] = getattr(v, lf.name)
        else:
            out[f.name] = v
    return out


def _sha256(arr: np.ndarray) -> str:
    import hashlib

    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


def save_params(path: str | os.PathLike, params: LlamaParams,
                config: ModelConfig, content_hash: bool = True) -> None:
    """``content_hash=True`` records a sha256 per tensor in the manifest —
    the deterministic content-addressing role of the reference's t348 module
    repo (SURVEY §2.2) applied to checkpoint artifacts."""
    d = Path(path)
    d.mkdir(parents=True, exist_ok=True)
    tensors = _flatten(params)
    meta: dict = {
        "format_version": FORMAT_VERSION,
        "config": dataclasses.asdict(config),
        "tensors": {},
    }
    for name, t in tensors.items():
        if isinstance(t, (QuantTensor, ChannelQuantTensor)):
            q, s = np.asarray(t.q), np.asarray(t.s)
            np.save(d / f"{name}.q.npy", q)
            np.save(d / f"{name}.s.npy", s)
            kind = "q8" if isinstance(t, QuantTensor) else (
                "w4a8" if t.packed4 else "w8a8")
            info = {
                "kind": kind,
                "logical_in": t.logical_in,
                "logical_out": t.logical_out,
            }
            if content_hash:
                info["sha256_q"] = _sha256(q)
                info["sha256_s"] = _sha256(s)
            meta["tensors"][name] = info
        else:
            arr = np.asarray(t)
            np.save(d / f"{name}.npy", arr)
            info = {"kind": "dense", "dtype": str(arr.dtype)}
            if content_hash:
                info["sha256"] = _sha256(arr)
            meta["tensors"][name] = info
    (d / "manifest.json").write_text(json.dumps(meta, indent=1))


def load_params(path: str | os.PathLike, device_put: bool = True,
                verify: bool = False):
    """Returns (LlamaParams, ModelConfig).  ``verify=True`` checks each
    tensor against its manifest sha256 (refuses corrupted artifacts)."""
    d = Path(path)
    meta = json.loads((d / "manifest.json").read_text())
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported format version {meta['format_version']}")
    config = ModelConfig(**meta["config"])

    def check(arr, info, key):
        if verify and key in info and _sha256(np.asarray(arr)) != info[key]:
            raise ValueError(f"content hash mismatch for {key} — corrupted artifact")

    def load_one(name: str):
        info = meta["tensors"][name]
        if info["kind"] in ("q8", "w8a8", "w4a8"):
            q = np.load(d / f"{name}.q.npy", mmap_mode="r")
            s = np.load(d / f"{name}.s.npy", mmap_mode="r")
            check(q, info, "sha256_q")
            check(s, info, "sha256_s")
            if info["kind"] == "q8":
                return QuantTensor(
                    q=jnp.asarray(q), s=jnp.asarray(s),
                    logical_in=info["logical_in"],
                    logical_out=info["logical_out"],
                )
            return ChannelQuantTensor(
                q=jnp.asarray(q), s=jnp.asarray(s),
                logical_in=info["logical_in"],
                logical_out=info["logical_out"],
                packed4=info["kind"] == "w4a8",
            )
        arr = np.load(d / f"{name}.npy", mmap_mode="r")
        check(arr, info, "sha256")
        return jnp.asarray(arr)

    layer_kwargs = {}
    top_kwargs = {}
    for name in meta["tensors"]:
        if name.startswith("layers."):
            layer_kwargs[name.split(".", 1)[1]] = load_one(name)
        else:
            top_kwargs[name] = load_one(name)
    params = LlamaParams(layers=LayerParams(**layer_kwargs), **top_kwargs)
    return params, config
