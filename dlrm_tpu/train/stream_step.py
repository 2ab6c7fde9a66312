"""Train step built on the streamed U-layout kernels (ops/stream_kernels.py).

Same semantics as train/fused_step.py (FBGEMM-style optimizer-in-backward,
exact coalescing) but with every random table access converted into
bandwidth-bound streams + MXU one-hot matmuls, and the hit-sort moved to the
host input pipeline (HostBatch.with_stream_work). On v5e this replaces a
~43 ms sort+coalesce+scatter with a few ms of streaming.

Layouts:
  * params["emb"]["stacked"] uses the PADDED block-aligned layout
    [plan.padded_rows, d] (every table starts at a block boundary).
  * rwsadagrad's row accumulator is packed [padded_rows/128, 128].
Use pad_params / init_stream_opt_state to create them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_tpu.data.batch import Batch
from dlrm_tpu.models.dlrm import DLRMModel, masked_mean, per_example_loss
from dlrm_tpu.ops.embedding import grouped_embedding_bag
from dlrm_tpu.ops.stream_kernels import (
    gather_grads,
    stream_embedding_fwd,
    stream_update,
    window_grads,
)
from dlrm_tpu.ops.stream_plan import StreamPlan, make_stream_plan
from dlrm_tpu.optim.optimizers import apply_updates


def plan_for_model(model: DLRMModel, batch_size: int,
                   block_rows: int = 2048,
                   hot_sizes=None) -> StreamPlan:
    """hot_sizes: per-table multi-hot sizes (the v2 ragged config); None
    uses the uniform cfg.num_indices_per_lookup. The U-space is sized
    per table, so ragged configs pay for their REAL hits, not the padded
    [T, B, Hmax] layout."""
    cfg = model.cfg
    if not model.fused or cfg.weighted_pooling is not None:
        raise ValueError(
            "stream step requires plain uniform-width tables without "
            "learned pooling"
        )
    return make_stream_plan(
        cfg.table_sizes, cfg.embedding_dim, batch_size,
        cfg.num_indices_per_lookup if hot_sizes is None else hot_sizes,
        block_rows=block_rows,
    )


def pad_params(params, model: DLRMModel, plan: StreamPlan):
    """Repack emb.stacked [total_rows, d] -> padded [plan.padded_rows, d]."""
    stacked = params["emb"]["stacked"]
    d = stacked.shape[1]
    padded = jnp.zeros((plan.padded_rows, d), stacked.dtype)
    for t, n in enumerate(plan.table_sizes):
        off = int(model.row_offsets[t])
        padded = jax.lax.dynamic_update_slice(
            padded, jax.lax.dynamic_slice(stacked, (off, 0), (n, d)),
            (plan.padded_offsets[t], 0),
        )
    out = dict(params)
    out["emb"] = {"stacked": padded}
    return out


def unpad_params(params, model: DLRMModel, plan: StreamPlan):
    """Inverse of pad_params (for checkpoints / eval against the plain
    layout)."""
    padded = params["emb"]["stacked"]
    d = padded.shape[1]
    stacked = jnp.zeros((model.total_rows, d), padded.dtype)
    for t, n in enumerate(plan.table_sizes):
        stacked = jax.lax.dynamic_update_slice(
            stacked,
            jax.lax.dynamic_slice(
                padded, (plan.padded_offsets[t], 0), (n, d)
            ),
            (int(model.row_offsets[t]), 0),
        )
    out = dict(params)
    out["emb"] = {"stacked": stacked}
    return out


def cast_emb(params, dtype):
    """Cast the stacked embedding table (e.g. to bfloat16 for the
    low-precision table path; pair with stochastic_round=True in the step)."""
    out = dict(params)
    out["emb"] = {"stacked": params["emb"]["stacked"].astype(dtype)}
    return out


def init_stream_opt_state(optimizer: str, params, plan: StreamPlan):
    """Optimizer state with stream-layout emb accumulators."""
    emb = params["emb"]["stacked"]
    state = {"step": jnp.zeros((), jnp.int32)}
    if optimizer == "sgd":
        return state
    accum = {
        k: jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), v
        )
        for k, v in params.items()
        if k != "emb"
    }
    if optimizer == "rwsadagrad":
        accum["emb"] = {
            "stacked": jnp.zeros((plan.acc_rows, 128), jnp.float32)
        }
    elif optimizer == "adagrad":
        accum["emb"] = {"stacked": jnp.zeros_like(emb, jnp.float32)}
    else:
        raise ValueError(f"optimizer {optimizer!r} not supported")
    state["accum"] = accum
    return state


def make_stream_train_step(
    model: DLRMModel,
    optimizer: str,
    plan: StreamPlan,
    *,
    fwd_impl: str = "gather",  # gather (XLA take) | stream (K3+K4)
    grad_impl: str = "onehot",  # onehot (K1, small batch) | gather (large)
    mm_dtype=jnp.float32,  # one-hot matmul dtype (bfloat16 = fast path)
    g_dtype=jnp.float32,  # dtype of the G_u / R_u intermediates
    stochastic_round: bool = False,  # SR the bf16 table writes (FBGEMM-style)
    eps: float = None,  # Adagrad epsilon (None -> torch default 1e-10)
    interpret: bool = False,  # run kernels in interpret mode (CPU tests)
):
    if fwd_impl not in ("gather", "stream"):
        raise ValueError(f"fwd_impl must be gather|stream, got {fwd_impl!r}")
    if grad_impl not in ("onehot", "gather"):
        raise ValueError(
            f"grad_impl must be onehot|gather, got {grad_impl!r}"
        )
    from dlrm_tpu.ops.stream_kernels import ADAGRAD_EPS

    eps = ADAGRAD_EPS if eps is None else float(eps)
    cfg = model.cfg
    offsets = jnp.asarray(np.asarray(plan.padded_offsets, np.int32))

    def train_step(params, opt_state, batch: Batch, lr):
        sw = batch.stream
        if sw is None:
            raise ValueError(
                "batch has no stream work; build it host-side with "
                "HostBatch.with_stream_work(plan)"
            )
        emb = params["emb"]["stacked"]
        if sw.wts_u is None:
            # unit-weight batches skip host wts: every real slot weighs 1
            from dlrm_tpu.ops.stream_plan import SENTINEL_ROW

            sw = sw._replace(
                wts_u=(sw.rows_u != SENTINEL_ROW).astype(jnp.float32)
            )
        if fwd_impl == "stream":
            pooled_t = stream_embedding_fwd(
                plan, emb, sw.rows_u, sw.vals_u, sw.wts_u, sw.w2t,
                sw.item_block, sw.item_row0, sw.item_u,
                mm_dtype=mm_dtype, r_dtype=g_dtype, interpret=interpret,
            )
            pooled = jnp.transpose(pooled_t, (1, 0, 2))
        else:
            pooled = grouped_embedding_bag(
                emb, offsets, batch.idx, batch.wt, plan.hot,
                batch=batch.dense.shape[0],
            )

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

        # dense params: the regular optimizer
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

        # table: K1 (grads in U-order) + K2 (streamed block update)
        dly_t = jnp.transpose(dly, (1, 0, 2))  # [T, B, d]
        if grad_impl == "gather":
            g_u = gather_grads(
                dly_t, sw.vals_u, sw.wts_u, sw.w2t, out_dtype=g_dtype,
            )
        else:
            g_u = window_grads(
                dly_t, sw.vals_u, sw.wts_u, sw.w2t,
                out_dtype=g_dtype, mm_dtype=mm_dtype, interpret=interpret,
            )
        acc = (
            None
            if optimizer == "sgd"
            else opt_state["accum"]["emb"]["stacked"]
        )
        out = stream_update(
            optimizer, plan, emb, acc, g_u, sw.rows_u,
            sw.item_block, sw.item_row0, sw.item_u, lr,
            mm_dtype=mm_dtype, eps=eps,
            stochastic_round=stochastic_round,
            seed=opt_state["step"], interpret=interpret,
        )
        new_params = dict(new_dense)
        new_params["emb"] = {"stacked": out[0]}
        if optimizer == "sgd":
            new_state = {"step": new_dense_state["step"]}
        else:
            new_state = {
                "step": new_dense_state["step"],
                "accum": {
                    **new_dense_state["accum"],
                    "emb": {"stacked": out[1]},
                },
            }
        return new_params, new_state, loss, probs

    return jax.jit(train_step, donate_argnums=(0, 1))


def make_stream_eval_step(model: DLRMModel, plan: StreamPlan):
    """Eval forward over the stream-layout (padded) table: plain XLA
    gather+pool, no stream work needed on eval batches."""
    offsets = jnp.asarray(np.asarray(plan.padded_offsets, np.int32))

    def eval_step(params, batch: Batch):
        pooled = grouped_embedding_bag(
            params["emb"]["stacked"], offsets, batch.idx, batch.wt, plan.hot,
            batch=batch.dense.shape[0],
        )
        dense_params = {k: v for k, v in params.items() if k != "emb"}
        probs, _ = model.forward_from_pooled(
            dense_params, batch.dense, pooled
        )
        return probs

    return jax.jit(eval_step)
