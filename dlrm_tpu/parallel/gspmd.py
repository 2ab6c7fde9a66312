"""GSPMD sharding path: compiler-partitioned training (no explicit shard_map).

The second of the two distributed strategies (SURVEY.md §5.8): annotate the
stacked table with a row sharding and the batch with a batch sharding, jit the
ordinary single-device step, and let XLA's SPMD partitioner insert the
collectives. Compared with the explicit butterfly (parallel/butterfly.py) this
supports EVERY model variant (QR, MD, weighted pooling, any optimizer) because
it reuses the exact single-device code — at the cost of XLA choosing the
comm pattern (typically gather/psum instead of the a2a butterfly).

Used as the fallback for configs the butterfly doesn't cover, and as an A/B
reference for collective-layout experiments.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlrm_tpu.data.batch import Batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.train.step import make_eval_step, make_train_step


def _param_sharding(mesh: Mesh):
    msize = mesh.shape["model"]

    def spec(path, leaf):
        from dlrm_tpu.optim.optimizers import path_keys

        keys = path_keys(path)
        if (
            ("emb" in keys or "v_w" in keys)
            and getattr(leaf, "ndim", 0) >= 1
            and leaf.shape[0] % msize == 0  # small/odd tables stay replicated
        ):
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return spec


class GspmdDLRM:
    def __init__(self, model: DLRMModel, mesh: Mesh):
        self.model = model
        self.mesh = mesh

    def shard_params(self, params):
        spec = _param_sharding(self.mesh)
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(leaf, spec(path, leaf)), params
        )

    def shard_opt_state(self, opt_state):
        spec = _param_sharding(self.mesh)
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(leaf, spec(path, leaf)), opt_state
        )

    def shard_batch(self, batch: Batch) -> Batch:
        bspec = NamedSharding(self.mesh, P(("data", "model")))
        # idx/wt are [T, B, H]: batch dim is axis 1
        tspec = NamedSharding(self.mesh, P(None, ("data", "model")))

        def put(x, s):
            return None if x is None else jax.device_put(x, s)

        return Batch(
            dense=put(batch.dense, bspec),
            idx=put(batch.idx, tspec),
            wt=put(batch.wt, tspec),
            labels=put(batch.labels, bspec),
        )

    def make_train_step(self, optimizer: str, eps: float = None):
        # the plain single-device step; GSPMD partitions it across the mesh
        return make_train_step(self.model, optimizer, eps=eps)

    def make_eval_step(self):
        return make_eval_step(self.model)
