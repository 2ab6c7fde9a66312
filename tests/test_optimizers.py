"""Optimizer math vs the torch implementations the reference uses.

Cross-framework oracle testing, the reference's own strategy (SURVEY.md §4:
pytorch-vs-caffe2 diff test). torch runs CPU-only here and only inside tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlrm_tpu.optim.lr_policy import LRPolicy
from dlrm_tpu.optim.optimizers import apply_updates, init_opt_state

torch = pytest.importorskip("torch")


def _tiny_params(rng):
    return {
        "emb": {"stacked": jnp.asarray(rng.normal(size=(12, 4)).astype(np.float32))},
        "bot": [
            {
                "w": jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32)),
                "b": jnp.asarray(rng.normal(size=(5,)).astype(np.float32)),
            }
        ],
    }


def _tiny_grads(rng, params):
    g = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)), params
    )
    # make some table rows untouched (zero grad), like sparse lookups
    ge = np.asarray(g["emb"]["stacked"]).copy()
    ge[[0, 3, 7]] = 0.0
    g["emb"]["stacked"] = jnp.asarray(ge)
    return g


def test_adagrad_matches_torch():
    rng = np.random.default_rng(0)
    params = _tiny_params(rng)
    state = init_opt_state("adagrad", params)
    grads_seq = [_tiny_grads(np.random.default_rng(i + 1), params) for i in range(4)]

    tp = [
        torch.tensor(np.asarray(params["emb"]["stacked"]), requires_grad=True),
        torch.tensor(np.asarray(params["bot"][0]["w"]), requires_grad=True),
        torch.tensor(np.asarray(params["bot"][0]["b"]), requires_grad=True),
    ]
    opt = torch.optim.Adagrad(tp, lr=0.1, eps=1e-10)
    p = params
    for g in grads_seq:
        tp[0].grad = torch.tensor(np.asarray(g["emb"]["stacked"]))
        tp[1].grad = torch.tensor(np.asarray(g["bot"][0]["w"]))
        tp[2].grad = torch.tensor(np.asarray(g["bot"][0]["b"]))
        opt.step()
        p, state = apply_updates("adagrad", p, g, state, 0.1)
    np.testing.assert_allclose(
        np.asarray(p["emb"]["stacked"]), tp[0].detach().numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p["bot"][0]["w"]), tp[1].detach().numpy(), atol=1e-6
    )


def test_rwsadagrad_rowwise_semantics():
    """Row-wise accumulator: one scalar per table row = mean of squared grads
    (optim/rwsadagrad.py:131-133); untouched rows must not move."""
    rng = np.random.default_rng(0)
    params = _tiny_params(rng)
    state = init_opt_state("rwsadagrad", params)
    g = _tiny_grads(np.random.default_rng(9), params)
    p0 = np.asarray(params["emb"]["stacked"]).copy()
    p1, state = apply_updates("rwsadagrad", params, g, state, 0.1)

    ge = np.asarray(g["emb"]["stacked"])
    acc = (ge**2).mean(axis=1)
    expect = p0 - 0.1 * ge / (np.sqrt(acc) + 1e-10)[:, None]
    np.testing.assert_allclose(
        np.asarray(p1["emb"]["stacked"]), expect, atol=1e-6
    )
    # untouched rows unchanged and their accumulators still zero
    np.testing.assert_array_equal(
        np.asarray(p1["emb"]["stacked"])[[0, 3, 7]], p0[[0, 3, 7]]
    )
    np.testing.assert_array_equal(
        np.asarray(state["accum"]["emb"]["stacked"])[[0, 3, 7]], np.zeros(3)
    )
    # dense params get element-wise adagrad
    gw = np.asarray(g["bot"][0]["w"])
    expect_w = np.asarray(params["bot"][0]["w"]) - 0.1 * gw / (
        np.sqrt(gw**2) + 1e-10
    )
    np.testing.assert_allclose(np.asarray(p1["bot"][0]["w"]), expect_w, atol=1e-6)


def test_rwsadagrad_matches_torch_reference_impl():
    """Directly against the reference RWSAdagrad run via torch sparse grads."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_rws", "/root/reference/optim/rwsadagrad.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(2)
    table = rng.normal(size=(10, 4)).astype(np.float32)
    params = {"emb": {"stacked": jnp.asarray(table)}}
    state = init_opt_state("rwsadagrad", params)

    tt = torch.tensor(table.copy(), requires_grad=True)
    opt = mod.RWSAdagrad([tt], lr=0.05)

    for step in range(3):
        grng = np.random.default_rng(10 + step)
        rows = np.sort(grng.choice(10, size=4, replace=False))
        vals = grng.normal(size=(4, 4)).astype(np.float32)
        dense_g = np.zeros((10, 4), np.float32)
        dense_g[rows] = vals
        # torch sparse grad
        i = torch.tensor(rows[None, :], dtype=torch.long)
        v = torch.tensor(vals)
        tt.grad = torch.sparse_coo_tensor(i, v, (10, 4))
        opt.step()
        params, state = apply_updates(
            "rwsadagrad", params, {"emb": {"stacked": jnp.asarray(dense_g)}},
            state, 0.05,
        )
    np.testing.assert_allclose(
        np.asarray(params["emb"]["stacked"]), tt.detach().numpy(), atol=1e-6
    )


def test_lr_policy_reference_semantics():
    """Warmup/decay/freeze curve of LRPolicyScheduler (dlrm_s_pytorch.py:169-203).

    torch's _LRScheduler applies one step at construction, so the lr used at
    training iteration i corresponds to internal step_count = i+1:
      warmup (count < W):            base * (1 - (W - count)/W)
      flat  (W <= count < D_start):  frozen at last warmup lr
      decay (D_start <= count < end): base * ((N - k)/N)^2, floored at 1e-7
      after:                         frozen at last decay lr
    """
    lrs = LRPolicy(1.0, num_warmup_steps=4, decay_start_step=8, num_decay_steps=4)
    mine = []
    for _ in range(16):
        mine.append(lrs.lr)
        lrs.step()
    expect = (
        [0.25, 0.5, 0.75]                # counts 1..3: warmup ramp
        + [0.75] * 4                     # counts 4..7: frozen at last warmup lr
        + [1.0, (3 / 4) ** 2, (2 / 4) ** 2, (1 / 4) ** 2]  # counts 8..11: decay
        + [(1 / 4) ** 2] * 5             # counts 12..16: frozen at last decay lr
    )
    np.testing.assert_allclose(mine, expect, atol=1e-12)

    # no-policy default: constant base lr (counts never enter warmup/decay)
    flat = LRPolicy(0.01)
    vals = []
    for _ in range(5):
        vals.append(flat.lr)
        flat.step()
    np.testing.assert_allclose(vals, [0.01] * 5)
