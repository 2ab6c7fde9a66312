"""Device mesh construction for hybrid-parallel DLRM.

DLRM's parallelism (SURVEY.md §2.3) is data-parallel dense MLPs x model-parallel
embedding tables with an all-to-all of pooled embeddings. On TPU this is one
2-D logical mesh:

    axes: ("data", "model")

Dense params are replicated over both axes' collectives via psum; the batch is
sharded over data*model (every chip computes a distinct batch slice, exactly as
every reference rank runs the same loader on its slice); tables are sharded over
"model". A 1-D mesh ("model" only, data=1) reproduces the classic butterfly
where the batch is sharded over the same axis the tables are sharded over.

Replaces extend_distributed.init_distributed + NCCL/MPI process groups
(extend_distributed.py:65-191) with jax.sharding.Mesh over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        model = n // data
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not match {n} devices"
        )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches are sharded across ALL devices on the batch dim (the reference
    slices the global batch per rank, dlrm_s_pytorch.py:542)."""
    return NamedSharding(mesh, P(("data", "model")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
