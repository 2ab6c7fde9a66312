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


def _is_row_shardable(path, leaf) -> bool:
    from dlrm_tpu.optim.optimizers import path_keys

    keys = path_keys(path)
    if getattr(leaf, "ndim", 0) < 1:
        return False
    if "v_w" in keys:
        return True
    # only leaves indexed BY ROW shard (tables + their accumulators);
    # MD projection matrices etc. are dense weights and replicate
    return "emb" in keys and keys and keys[-1] in ("stacked", "w", "q", "r")


class GspmdDLRM:
    def __init__(self, model: DLRMModel, mesh: Mesh):
        self.model = model
        self.mesh = mesh

    def _put_row_sharded(self, leaf):
        """Row-shard over 'model', padding trailing rows to a multiple of
        msize when needed (JAX shardings require divisibility; tail pad
        rows are index-unreachable so lookups/updates never touch them)."""
        import jax.numpy as jnp

        msize = self.mesh.shape["model"]
        n = leaf.shape[0]
        pad = (-n) % msize
        if pad:
            leaf = jnp.concatenate(
                [jnp.asarray(leaf),
                 jnp.zeros((pad,) + leaf.shape[1:], leaf.dtype)]
            )
        return jax.device_put(leaf, NamedSharding(self.mesh, P("model")))

    def _shard_tree(self, tree):
        rep = NamedSharding(self.mesh, P())

        def put(path, leaf):
            if not hasattr(leaf, "ndim") and not isinstance(
                leaf, (int, float, complex, bool)
            ):
                return leaf  # static leaves (e.g. quantized-MLP mode tags)
            if _is_row_shardable(path, leaf):
                return self._put_row_sharded(leaf)
            return jax.device_put(leaf, rep)

        return jax.tree_util.tree_map_with_path(put, tree)

    def shard_params(self, params):
        return self._shard_tree(params)

    def shard_opt_state(self, opt_state):
        return self._shard_tree(opt_state)

    def unshard_params(self, params, template):
        """Back to host arrays with the template's (unpadded) shapes."""
        return jax.tree_util.tree_map(
            lambda leaf, t: np.asarray(jax.device_get(leaf))[
                tuple(slice(0, s) for s in np.shape(t))
            ],
            params, template,
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
