"""Convergence smoke: the model must actually learn (SURVEY.md §4 item (d):
AUC-threshold convergence on synthetic data).

Labels are generated from a planted function of the features (dense linear
signal + per-embedding-row propensities), so a working trainer must push AUC
well above chance within a few hundred tiny steps. Guards against silent
gradient/optimizer/interaction breakage that exact-parity tests on 3 steps
can't see.
"""

import numpy as np
import pytest

import jax

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import HostBatch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.ops.metrics import AucState, auc_compute, auc_update, roc_auc_exact
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.train.fused_step import make_fused_train_step

CFG = DLRMConfig(
    embedding_dim=8,
    table_sizes=(50, 80),
    mlp_bot=(8, 16, 8),
    mlp_top=(16, 8, 1),
    interaction="dot",
    loss="bce",
    num_indices_per_lookup=1,
)


def _planted_batch(rng, w_dense, row_bias, n=256):
    dense = rng.normal(size=(n, 8)).astype(np.float32)
    idx = np.stack(
        [rng.integers(0, s, (n, 1)).astype(np.int32) for s in CFG.table_sizes]
    )
    logit = dense @ w_dense
    for t in range(2):
        logit += row_bias[t][idx[t, :, 0]]
    labels = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(np.float32)
    return HostBatch(
        dense=dense,
        idx=idx,
        wt=np.ones((2, n, 1), np.float32),
        labels=labels[:, None],
    )


def test_training_reaches_auc_threshold():
    rng = np.random.default_rng(0)
    w_dense = rng.normal(size=8).astype(np.float32) * 1.5
    row_bias = [rng.normal(size=s).astype(np.float32) * 2.0 for s in CFG.table_sizes]

    model = DLRMModel(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = init_opt_state("rwsadagrad", params)
    step = make_fused_train_step(model, "rwsadagrad")
    for i in range(300):
        hb = _planted_batch(rng, w_dense, row_bias)
        params, opt_state, loss, _ = step(params, opt_state, hb.to_device(), 0.05)

    # eval on fresh data; exact AUC and the streaming histogram must agree
    from dlrm_tpu.train.step import make_eval_step

    ev = make_eval_step(model)
    scores, labels = [], []
    st = AucState.create()
    for _ in range(10):
        hb = _planted_batch(rng, w_dense, row_bias)
        p = np.asarray(ev(params, hb.to_device())).ravel()
        scores.append(p)
        labels.append(hb.labels.ravel())
        st = auc_update(st, p, hb.labels.ravel())
    auc = roc_auc_exact(np.concatenate(scores), np.concatenate(labels))
    assert auc > 0.8, f"model failed to learn the planted signal: AUC {auc}"
    assert abs(auc_compute(st) - auc) < 2e-3


def test_streamed_bf16_training_reaches_auc_threshold():
    """The STREAMED bf16+SR update path (the production fast path) must
    also learn the planted signal — guards the full U-layout pipeline
    (host plan build -> K1/gather grads -> K2 update with stochastic
    rounding semantics) against silent degradation that per-step parity
    tests on fp32 can't see. Runs the kernels in interpret mode (CPU);
    SR falls back to round-to-nearest there, which is exactly the bf16
    convergence-tracking claim being tested."""
    import dataclasses

    import jax.numpy as jnp

    from dlrm_tpu.train.stream_step import (
        cast_emb,
        init_stream_opt_state,
        make_stream_train_step,
        pad_params,
        plan_for_model,
    )

    cfg = dataclasses.replace(CFG, embedding_dim=128, mlp_bot=(8, 16, 128))
    rng = np.random.default_rng(1)
    w_dense = rng.normal(size=8).astype(np.float32) * 1.5
    row_bias = [
        rng.normal(size=s).astype(np.float32) * 2.0 for s in cfg.table_sizes
    ]

    model = DLRMModel(cfg)
    plan = plan_for_model(model, 256, block_rows=1024)
    params = cast_emb(
        pad_params(model.init_params(jax.random.PRNGKey(0)), model, plan),
        jnp.bfloat16,
    )
    opt_state = init_stream_opt_state("rwsadagrad", params, plan)
    step = make_stream_train_step(
        model, "rwsadagrad", plan, fwd_impl="gather", grad_impl="gather",
        mm_dtype=jnp.float32, stochastic_round=True, interpret=True,
    )
    for i in range(150):
        hb = _planted_batch(rng, w_dense, row_bias)
        batch = hb.with_stream_work(plan, unit_weights=True).to_device()
        params, opt_state, loss, _ = step(params, opt_state, batch, 0.05)

    from dlrm_tpu.train.stream_step import make_stream_eval_step

    ev = make_stream_eval_step(model, plan)
    scores, labels = [], []
    for _ in range(8):
        hb = _planted_batch(rng, w_dense, row_bias)
        p = np.asarray(ev(params, hb.to_device())).ravel()
        scores.append(p)
        labels.append(hb.labels.ravel())
    auc = roc_auc_exact(np.concatenate(scores), np.concatenate(labels))
    assert auc > 0.78, f"streamed bf16 path failed to learn: AUC {auc}"
