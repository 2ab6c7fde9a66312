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
    if not model.fused:
        raise ValueError(
            "stream step requires plain uniform-width tables"
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
    if "v_w" in params:
        # pooling weights ride the same padded row layout as the table
        vw = params["v_w"]
        pv = jnp.zeros((plan.padded_rows,), vw.dtype)
        for t, n in enumerate(plan.table_sizes):
            pv = jax.lax.dynamic_update_slice(
                pv,
                jax.lax.dynamic_slice(vw, (int(model.row_offsets[t]),), (n,)),
                (plan.padded_offsets[t],),
            )
        out["v_w"] = pv
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
    if "v_w" in params:
        vw_p = params["v_w"]
        vw = jnp.zeros((model.total_rows,), vw_p.dtype)
        for t, n in enumerate(plan.table_sizes):
            vw = jax.lax.dynamic_update_slice(
                vw,
                jax.lax.dynamic_slice(vw_p, (plan.padded_offsets[t],), (n,)),
                (int(model.row_offsets[t]),),
            )
        out["v_w"] = vw
    return out


def cast_emb(params, dtype):
    """Cast the stacked embedding table (e.g. to bfloat16 for the
    low-precision table path; pair with stochastic_round=True in the step)."""
    out = dict(params)
    out["emb"] = {"stacked": params["emb"]["stacked"].astype(dtype)}
    return out


def _padded_hit_ids(plan: StreamPlan, idx, offsets, batch=None):
    """Per-hit PADDED-layout row ids matching idx's own layout (flat
    [sum_t B*h_t] table-major or padded [T, B, Hmax]) — the index space of
    the stream-layout table and of v_w after pad_params. batch: the flat
    layout's batch size when it differs from plan.batch (eval batches)."""
    if idx.ndim == 1:  # flat per-hit, table-major blocks of B*h_t
        b = plan.batch if batch is None else int(batch)
        reps = [b * int(h) for h in plan.hot]
        off = np.repeat(
            np.asarray(plan.padded_offsets, np.int64), reps
        ).astype(np.int32)
        return idx + jnp.asarray(off)
    return idx + offsets[:, None, None]


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
    weighted = cfg.weighted_pooling  # None | "fixed" | "learned"
    if weighted is not None and fwd_impl != "gather":
        raise ValueError(
            "weighted pooling on the stream step requires fwd_impl="
            "'gather' (the pooled forward must sit inside the autodiff "
            "region to produce d(loss)/d(v_w); K3/K4 pool outside it)"
        )

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
        dense_params = {k: v for k, v in params.items() if k != "emb"}

        if weighted is not None:
            # v_w (reference: per_sample_weights = v_W[lS_i],
            # dlrm_s_pytorch.py:286-294, 320-340) rides the padded row
            # layout. The pooled forward sits INSIDE the autodiff region
            # with the table stop-gradient'd and a zero residual added to
            # pooled, so ONE grad call yields d(loss)/d(v_w) (XLA derives
            # the per-hit dot(row, dly_bag) + scatter) AND dly for the
            # manual K2 table path. "fixed" stop-grads v_w -> zero grads
            # -> exact optimizer no-op (pooling_weights contract).
            emb_c = jax.lax.stop_gradient(emb)
            pidx = _padded_hit_ids(plan, batch.idx, offsets)
            b = batch.dense.shape[0]
            zero = jnp.zeros(
                (b, len(plan.table_sizes), cfg.embedding_dim), jnp.float32
            )

            def fwd_rest(dp, z):
                vw_p = dp["v_w"]
                if weighted == "fixed":
                    vw_p = jax.lax.stop_gradient(vw_p)
                vw_hits = jnp.take(vw_p, pidx, axis=0)
                wt_eff = (
                    vw_hits if batch.wt is None else batch.wt * vw_hits
                )
                ly = grouped_embedding_bag(
                    emb_c, offsets, batch.idx, wt_eff, plan.hot, batch=b
                ).astype(jnp.float32) + z
                mp = {k: v for k, v in dp.items() if k != "v_w"}
                probs, logits = model.forward_from_pooled(
                    mp, batch.dense, ly
                )
                return masked_mean(
                    per_example_loss(cfg, probs, batch.labels, logits),
                    batch.labels,
                ), probs

            (loss, probs), (dgrads, dly) = jax.value_and_grad(
                fwd_rest, argnums=(0, 1), has_aux=True
            )(dense_params, zero)
        else:
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

            def rest(dp, ly):
                probs, logits = model.forward_from_pooled(
                    dp, batch.dense, ly
                )
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
        wts_g = sw.wts_u
        if weighted is not None:
            # d(loss)/d(row) = sum_hits wt * v_w[row] * dly[bag]: the v_w
            # factor multiplies into the per-hit weights at the OLD v_w
            # (grads are taken at the step's input params)
            off_w = jnp.take(offsets, sw.w2t)  # [Uw] window -> table offset
            rows_pad = jnp.where(
                sw.rows_u < 0, 0, sw.rows_u + off_w[:, None, None]
            )
            wts_g = wts_g * jnp.take(
                jax.lax.stop_gradient(params["v_w"]), rows_pad, axis=0
            )
        if grad_impl == "gather":
            g_u = gather_grads(
                dly_t, sw.vals_u, wts_g, sw.w2t, out_dtype=g_dtype,
            )
        else:
            g_u = window_grads(
                dly_t, sw.vals_u, wts_g, sw.w2t,
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
        wt = batch.wt
        if "v_w" in params:
            vw_hits = jnp.take(
                params["v_w"],
                _padded_hit_ids(plan, batch.idx, offsets,
                                batch=batch.dense.shape[0]),
                axis=0,
            )
            wt = vw_hits if wt is None else wt * vw_hits
        pooled = grouped_embedding_bag(
            params["emb"]["stacked"], offsets, batch.idx, wt, plan.hot,
            batch=batch.dense.shape[0],
        )
        dense_params = {k: v for k, v in params.items() if k != "emb"}
        probs, _ = model.forward_from_pooled(
            dense_params, batch.dense, pooled
        )
        return probs

    return jax.jit(eval_step)
