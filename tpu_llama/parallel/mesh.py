"""Device mesh and multi-host bootstrap.

The reference is one process, one thread (llama2.ts:526; SURVEY §2.4) — this
module is its TPU-native generalization: a named 2-D ``Mesh`` over all chips,
``('data', 'model')``:

* ``data``  — batch/continuous-batching axis (DP); requests shard here.
* ``model`` — tensor-parallel axis (TP); attention heads, FFN hidden dim,
  and the vocab dim of the classifier shard here.  Lay this axis over ICI.

Sequence (``seq``) and pipeline axes can be threaded through the same helpers
later — axis names are reserved (SURVEY §2.4 table, §5.7).

Multi-host: call ``init_distributed()`` once per process before building the
mesh; XLA collectives then ride ICI intra-slice and DCN across slices
(SURVEY §5.8).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.model


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host process-group bootstrap (jax.distributed).

    No-op on single-process runs; on a pod slice each host calls this with
    its coordinator address (or relies on TPU auto-detection).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    mesh_config: MeshConfig | None = None, devices: list | None = None
) -> Mesh:
    """Build the ('data', 'model') mesh.

    Default: all visible devices on the model axis (TP-first — inference
    weights are the dominant memory consumer, and TP over ICI is the
    north-star layout).
    """
    devs = devices if devices is not None else jax.devices()
    if mesh_config is None:
        mesh_config = MeshConfig(data=1, model=len(devs))
    n = mesh_config.n_devices
    if n > len(devs):
        raise ValueError(f"mesh needs {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(mesh_config.data, mesh_config.model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(1, 1))
