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
    slice_ids: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build the ("data", "model") mesh.

    Multi-slice topologies (TPU pods joined over DCN — SURVEY.md §5.8
    "mesh axes over ICI and DCN") get the HYBRID layout automatically:
    the MODEL axis — which carries the heavy per-step collectives (the
    pooled-embedding all-to-all, the row-wise psum_scatter, the cw
    feature-assembling a2a) — is laid out strictly WITHIN one slice so
    that traffic rides ICI; only the DATA axis (one dense-grad psum per
    step, orders of magnitude less volume than the per-sample embedding
    exchange) crosses the DCN boundary. Row-wise stripes span the model
    axis, so stripe traffic stays in-slice by construction (PARITY.md has
    the traffic arithmetic). Slices are detected from the devices'
    `slice_index` (None/absent = single slice); `slice_ids` overrides for
    tests on emulated topologies.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if slice_ids is None:
        slice_ids = [getattr(d, "slice_index", None) or 0 for d in devices]
    if len(slice_ids) != n:
        raise ValueError(f"{len(slice_ids)} slice_ids for {n} devices")
    groups: dict = {}
    for d, s in zip(devices, slice_ids):
        groups.setdefault(int(s), []).append(d)
    if len(groups) > 1:
        sizes = {len(g) for g in groups.values()}
        if len(sizes) != 1:
            raise ValueError(
                f"unequal slice sizes {sorted(sizes)} — the hybrid mesh "
                "needs homogeneous slices"
            )
        per = sizes.pop()
        num_slices = len(groups)
        if model is None:
            # widest model axis that stays inside one slice and still
            # yields a consistent data axis — walk ALL divisors of the
            # slice size (halving alone skips e.g. model=2 for per=6)
            model = 1
            for m in range(per, 0, -1):
                if per % m == 0 and n % m == 0 and n // m == data:
                    model = m
                    break
        if model > per or per % model:
            raise ValueError(
                f"model axis {model} does not fit within one {per}-device "
                f"slice (the model axis must ride ICI; shrink --mesh-model "
                f"to a divisor of {per})"
            )
        rows = []
        for s in sorted(groups):
            g = np.asarray(groups[s]).reshape(per // model, model)
            rows.append(g)
        arr = np.concatenate(rows, axis=0)  # [num_slices*per/model, model]
        if data * model != n:
            raise ValueError(
                f"mesh {data}x{model} does not match {n} devices over "
                f"{num_slices} slices"
            )
        if arr.shape[0] != data:
            raise ValueError(
                f"data axis {data} inconsistent with {num_slices} slices "
                f"of {per} devices at model={model} "
                f"(expected data={arr.shape[0]})"
            )
        return Mesh(arr, axis_names=("data", "model"))
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
