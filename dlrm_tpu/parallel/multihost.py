"""Multi-host support: process init, global batch assembly, barriers.

Replaces extend_distributed.init_distributed's env-based rank discovery and
process groups (extend_distributed.py:65-191) with jax.distributed (one line —
coordinator/rank/world come from the launcher env) and the NCCL-barrier with
multihost sync (mlperf_logger.py:66-74 equivalent).

Input pipeline options on multi-host, matching the reference's two patterns:
  * replicated loading — every host reads the full global batch (exactly what
    the v1 trainer does: every rank runs the same loader,
    dlrm_s_pytorch.py:1541); use global_batch_from_replicated.
  * rank-strided loading — host h reads batches h, h+P, h+2P... of the global
    stream (multi_hot_criteo.py:262 round-robin) or the h-th batch slice; use
    global_batch_from_local_shard with the host's slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlrm_tpu.data.batch import Batch


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize the JAX distributed runtime when running multi-process.
    No-op for single-process runs. Returns the process index.

    When called with no arguments, rank discovery falls back to the
    launcher environment (`scripts/launch.py` exports DLRM_COORDINATOR /
    DLRM_NUM_PROCESSES / DLRM_PROCESS_ID) — the role of
    extend_distributed's env_2_int sweep over OMPI/MPI/PMI vars
    (extend_distributed.py:23-63): the launcher owns the env contract,
    the trainer just reads it. jax.distributed additionally auto-detects
    SLURM/OMPI clusters on its own."""
    import os

    explicit = (
        num_processes is not None
        or process_id is not None
        or coordinator_address is not None
    )
    if not explicit and "DLRM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DLRM_NUM_PROCESSES"])
        if "DLRM_PROCESS_ID" not in os.environ and num_processes > 1:
            raise ValueError(
                "DLRM_NUM_PROCESSES>1 is set but DLRM_PROCESS_ID is not — "
                "the launcher env contract requires both (scripts/launch.py "
                "exports DLRM_COORDINATOR, DLRM_NUM_PROCESSES and "
                "DLRM_PROCESS_ID)"
            )
        # DLRM_COORDINATOR may be legitimately absent: passing None lets
        # jax.distributed.initialize auto-detect the coordinator on
        # platforms that support it (TPU pods / SLURM)
        coordinator_address = os.environ.get("DLRM_COORDINATOR")
        process_id = int(os.environ.get("DLRM_PROCESS_ID", 0))
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def barrier(name: str = "dlrm") -> None:
    """Global device barrier (mlperf_logger.barrier equivalent)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def global_batch_from_replicated(mesh: Mesh, batch: Batch, specs) -> Batch:
    """Every host holds the FULL global batch (v1 pattern); device_put slices
    out each device's shard locally — no cross-host data movement."""
    def put(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec))

    main = [put(x, s) for x, s in zip(
        (batch.dense, batch.idx, batch.wt, batch.labels), specs)]
    stream = batch.stream
    if stream is not None:
        # U-layout work replicates (every device sees the full plan; a
        # sharded-stream layout rides StreamButterfly.shard_batch instead)
        stream = type(stream)(*(put(x, P()) for x in stream))
    return Batch(
        *main, stream=stream,
        # mixed-plan row-wise tables: indices visible to every model shard
        idx_rw=put(batch.idx_rw, P(None, "data")),
        wt_rw=put(batch.wt_rw, P(None, "data")),
        # column-wise tables: same replicated-over-model layout
        idx_cw=put(batch.idx_cw, P(None, "data")),
        wt_cw=put(batch.wt_cw, P(None, "data")),
        # owner-bucketed row-wise hits: leading axis sharded over "model"
        idx_rwb=put(batch.idx_rwb, P("model", "data")),
        wt_rwb=put(batch.wt_rwb, P("model", "data")),
    )


def global_batch_from_local_shard(mesh: Mesh, local: Batch, specs) -> Batch:
    """Each host holds only its slice of the global batch (v2 rank-strided
    pattern); assembles the logical global array across processes."""
    from jax.experimental import multihost_utils

    def put(x, spec):
        if x is None:
            return None
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, spec
        )

    main = [put(x, s) for x, s in zip(
        (local.dense, local.idx, local.wt, local.labels), specs)]
    stream = local.stream
    if stream is not None:
        stream = type(stream)(*(put(np.asarray(x), P()) for x in stream))
    return Batch(
        *main, stream=stream,
        idx_rw=put(local.idx_rw, P(None, "data")),
        wt_rw=put(local.wt_rw, P(None, "data")),
        idx_cw=put(local.idx_cw, P(None, "data")),
        wt_cw=put(local.wt_cw, P(None, "data")),
        idx_rwb=put(local.idx_rwb, P("model", "data")),
        wt_rwb=put(local.wt_rwb, P("model", "data")),
    )


def process_local_rank_stride(num_batches: int) -> range:
    """Batch indices this process should load under round-robin assignment."""
    return range(jax.process_index(), num_batches, jax.process_count())
