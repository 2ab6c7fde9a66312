"""Train step with the sparse optimizer update fused into the backward.

TPU equivalent of torchrec's apply_optimizer_in_backward + FBGEMM EXACT_*
fused kernels (torchrec_dlrm/dlrm_main.py:649-653): table gradients are never
materialized densely. The step differentiates the network w.r.t. the POOLED
embedding activations [B, T, d]; the chain rule through the weighted sum-pool
is applied hit-by-hit and scattered straight into the (donated) table and
accumulator — O(touched rows) HBM traffic instead of O(table rows).

Numerically identical to the plain step (tests/test_fused_step.py): the
coalescing in ops/sparse_update.py reproduces exact sparse-Adagrad semantics.
Requires the stacked fast path (plain uniform-width tables); QR/MD/weighted-
pooling configs use the plain step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dlrm_tpu.data.batch import Batch
from dlrm_tpu.models.dlrm import DLRMModel, masked_mean, per_example_loss
from dlrm_tpu.ops.sparse_update import (
    adagrad_from_coalesced,
    coalesce_hits,
    rowwise_adagrad_from_coalesced,
    sgd_from_coalesced,
)
from dlrm_tpu.optim.optimizers import apply_updates


def supports_fused(model: DLRMModel) -> bool:
    return model.fused and model.cfg.weighted_pooling is None


def make_fused_train_step(model: DLRMModel, optimizer: str,
                          eps: float = None):
    """eps: Adagrad denominator epsilon (None -> torch default 1e-10; v2's
    --eps flag passes 1e-8 for torchrec parity)."""
    if not supports_fused(model):
        raise ValueError(
            "fused sparse step requires plain uniform-width tables without "
            "learned pooling; use dlrm_tpu.train.step.make_train_step"
        )
    cfg = model.cfg
    from dlrm_tpu.optim.optimizers import ADAGRAD_EPS

    eps = ADAGRAD_EPS if eps is None else float(eps)
    offsets = jnp.asarray(model.row_offsets)

    def train_step(params, opt_state, batch: Batch, lr):
        from dlrm_tpu.ops.embedding import fused_embedding_bag

        emb = params["emb"]["stacked"]
        pooled = fused_embedding_bag(emb, offsets, batch.idx, batch.wt)

        dense_params = {k: v for k, v in params.items() if k != "emb"}

        def rest(dp, ly):
            probs, logits = model.forward_from_pooled(dp, batch.dense, ly)
            return masked_mean(
                per_example_loss(cfg, probs, batch.labels, logits),
                batch.labels,
            ), probs

        (loss, probs), (dgrads, dly) = jax.value_and_grad(
            rest, argnums=(0, 1), has_aux=True
        )(dense_params, pooled)

        # ---- dense params: the regular optimizer
        if optimizer == "sgd":
            dense_state = {"step": opt_state["step"]}
        else:
            dense_state = {
                "step": opt_state["step"],
                "accum": {
                    k: v for k, v in opt_state["accum"].items() if k != "emb"
                },
            }
        new_dense, new_dense_state = apply_updates(
            optimizer, dense_params, dgrads, dense_state, lr, eps=eps
        )

        # ---- table: fused sparse update from the pooled cotangent
        urows, G, valid = coalesce_hits(
            dly, batch.idx, batch.wt, offsets, emb.shape[0]
        )
        if optimizer == "sgd":
            new_emb = sgd_from_coalesced(emb, urows, G, valid, lr)
            new_state = {"step": new_dense_state["step"]}
        elif optimizer in ("rwsadagrad", "adagrad"):
            fn = (
                rowwise_adagrad_from_coalesced
                if optimizer == "rwsadagrad"
                else adagrad_from_coalesced
            )
            new_emb, new_acc = fn(
                emb, opt_state["accum"]["emb"]["stacked"], urows, G, valid,
                lr, eps=eps,
            )
            new_state = {
                "step": new_dense_state["step"],
                "accum": {
                    **new_dense_state["accum"],
                    "emb": {"stacked": new_acc},
                },
            }
        else:
            raise ValueError(f"optimizer {optimizer!r} not supported")

        new_params = dict(new_dense)
        new_params["emb"] = {"stacked": new_emb}
        return new_params, new_state, loss, probs

    return jax.jit(train_step, donate_argnums=(0, 1))


def make_fused_grad_accum_train_step(
    model: DLRMModel, optimizer: str, accum_iters: int, eps: float = None
):
    """Gradient accumulation COMPOSED with the fused sparse update
    (--mlperf-grad-accum-iter on the fused path): micro-batches arrive
    stacked on a leading axis; dense grads are meaned via lax.scan while
    the pooled cotangents of ALL micro-batches coalesce into ONE sparse
    scatter — the accumulator still advances once per optimizer step, so
    Adagrad semantics match a single large batch. Same deliberate
    mean-over-accum scaling as make_grad_accum_train_step (PARITY.md)."""
    if not supports_fused(model):
        raise ValueError(
            "fused grad-accum step requires plain uniform-width tables "
            "without learned pooling"
        )
    cfg = model.cfg
    from dlrm_tpu.optim.optimizers import ADAGRAD_EPS

    eps = ADAGRAD_EPS if eps is None else float(eps)
    offsets = jnp.asarray(model.row_offsets)

    def train_step(params, opt_state, batches: Batch, lr):
        from dlrm_tpu.ops.embedding import fused_embedding_bag

        emb = params["emb"]["stacked"]
        dense_params = {k: v for k, v in params.items() if k != "emb"}

        def one(carry, batch):
            pooled = fused_embedding_bag(emb, offsets, batch.idx, batch.wt)

            def rest(dp, ly):
                probs, logits = model.forward_from_pooled(
                    dp, batch.dense, ly
                )
                return masked_mean(
                    per_example_loss(cfg, probs, batch.labels, logits),
                    batch.labels,
                ), probs

            (loss, _), (dgrads, dly) = jax.value_and_grad(
                rest, argnums=(0, 1), has_aux=True
            )(dense_params, pooled)
            carry = jax.tree_util.tree_map(jnp.add, carry, dgrads)
            return carry, (loss, dly)

        zero = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), dense_params
        )
        dgrads_sum, (losses, dlys) = jax.lax.scan(one, zero, batches)
        dgrads = jax.tree_util.tree_map(
            lambda g: g / accum_iters, dgrads_sum
        )

        if optimizer == "sgd":
            dense_state = {"step": opt_state["step"]}
        else:
            dense_state = {
                "step": opt_state["step"],
                "accum": {
                    k: v for k, v in opt_state["accum"].items() if k != "emb"
                },
            }
        new_dense, new_dense_state = apply_updates(
            optimizer, dense_params, dgrads, dense_state, lr, eps=eps
        )

        # every micro-batch's hits coalesce into one exact sparse update
        a, t = batches.idx.shape[0], batches.idx.shape[1]
        b, h = batches.idx.shape[2], batches.idx.shape[3]
        idx_all = jnp.moveaxis(batches.idx, 0, 1).reshape(t, a * b, h)
        wt_all = (
            None
            if batches.wt is None
            else jnp.moveaxis(batches.wt, 0, 1).reshape(t, a * b, h)
        )
        dly_all = dlys.reshape(a * b, t, -1) / accum_iters
        urows, G, valid = coalesce_hits(
            dly_all, idx_all, wt_all, offsets, emb.shape[0]
        )
        if optimizer == "sgd":
            new_emb = sgd_from_coalesced(emb, urows, G, valid, lr)
            new_state = {"step": new_dense_state["step"]}
        elif optimizer in ("rwsadagrad", "adagrad"):
            fn = (
                rowwise_adagrad_from_coalesced
                if optimizer == "rwsadagrad"
                else adagrad_from_coalesced
            )
            new_emb, new_acc = fn(
                emb, opt_state["accum"]["emb"]["stacked"], urows, G, valid,
                lr, eps=eps,
            )
            new_state = {
                "step": new_dense_state["step"],
                "accum": {
                    **new_dense_state["accum"],
                    "emb": {"stacked": new_acc},
                },
            }
        else:
            raise ValueError(f"optimizer {optimizer!r} not supported")
        new_params = dict(new_dense)
        new_params["emb"] = {"stacked": new_emb}
        return new_params, new_state, jnp.mean(losses), None

    return jax.jit(train_step, donate_argnums=(0, 1))
