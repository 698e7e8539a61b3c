"""Device mesh management — the TPU-native replacement for the reference's
process-group "mpu" layer (reference: sat/mpu/initialize.py:62-311).

The reference builds NCCL process groups for a 3-axis world = dp x sp x mp
with mp fastest-moving (sat/mpu/initialize.py:101-137).  On TPU the same
topology is a single `jax.sharding.Mesh` with axes ('data','seq','model');
collectives are inserted by XLA SPMD from sharding annotations (or issued
explicitly inside `shard_map`).  The reference's "data-broadcast group"
(identical noise/prompts across the mp x sp shards of one replica,
sat/mpu/initialize.py:134-137) is unnecessary here: the host feeds
replicated arrays and identical PRNG keys, so all shards agree by
construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"   # dp: batch sharding (reference: get_data_parallel_group)
SEQ_AXIS = "seq"     # sp: sequence/latent-spatial sharding (Ulysses + chunking)
MODEL_AXIS = "model" # mp: tensor parallel (Column/RowParallelLinear equivalent)

AXIS_NAMES = (DATA_AXIS, SEQ_AXIS, MODEL_AXIS)

_GLOBAL_MESH: Optional[Mesh] = None


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """World layout: data x seq x model, matching the reference's
    `initialize_model_parallel(model_parallel_size, sequence_parallel_size)`
    factorization (sat/mpu/initialize.py:62)."""

    data: int = 1
    seq: int = 1
    model: int = 1

    @property
    def world(self) -> int:
        return self.data * self.seq * self.model

    @staticmethod
    def infer(n_devices: int, seq: int = 1, model: int = 1) -> "MeshSpec":
        assert n_devices % (seq * model) == 0, (
            f"world size {n_devices} must be divisible by seq*model={seq * model} "
            "(reference assert: sat/mpu/initialize.py:89-90)"
        )
        return MeshSpec(data=n_devices // (seq * model), seq=seq, model=model)


def make_mesh(spec: MeshSpec = None, devices=None, *, seq: int = 1, model: int = 1) -> Mesh:
    """Create the ('data','seq','model') mesh.  Axis order puts `model`
    innermost so TP collectives ride the fastest ICI links, matching the
    reference's mp-fastest-moving rank layout (sat/mpu/initialize.py:101)."""
    devices = devices if devices is not None else jax.devices()
    if spec is None:
        spec = MeshSpec.infer(len(devices), seq=seq, model=model)
    if spec.world != len(devices):
        raise RuntimeError(
            f"mesh spec {spec} needs {spec.world} devices but this process "
            f"exposes {len(devices)} ({[d.platform for d in devices[:4]]}...). "
            "For multi-chip dry-runs on a single-chip box, force a virtual "
            "CPU platform BEFORE jax initializes: os.environ['JAX_PLATFORMS']"
            "='cpu' + XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "(see tests/conftest.py / __graft_entry__._provision_devices)."
        )
    arr = np.asarray(devices).reshape(spec.data, spec.seq, spec.model)
    return Mesh(arr, AXIS_NAMES)


def set_mesh(mesh: Mesh):
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_mesh() -> Mesh:
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = make_mesh()
    return _GLOBAL_MESH


def mesh_axis_size(axis: str, mesh: Mesh = None) -> int:
    mesh = mesh or get_mesh()
    return mesh.shape[axis]
