"""jit-compiled train/eval steps (single-device path).

The distributed variants live in dlrm_tpu/parallel/. The step takes lr as a
traced scalar so the host-side LRPolicy never triggers recompilation, and
donates params/opt_state so table updates are in-place in HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from dlrm_tpu.data.batch import Batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import apply_updates, init_opt_state


def make_train_step(model: DLRMModel, optimizer: str, eps: float = None):
    from dlrm_tpu.optim.optimizers import ADAGRAD_EPS

    eps = ADAGRAD_EPS if eps is None else float(eps)

    def train_step(params, opt_state, batch: Batch, lr):
        def loss_fn(p):
            loss, probs = model.loss_and_prob(p, batch)
            return loss, probs

        (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_state = apply_updates(
            optimizer, params, grads, opt_state, lr, eps=eps
        )
        return new_params, new_state, loss, probs

    return jax.jit(train_step, donate_argnums=(0, 1))


def make_eval_step(model: DLRMModel):
    def eval_step(params, batch: Batch):
        return model.apply(params, batch)

    return jax.jit(eval_step)


def make_grad_accum_train_step(
    model: DLRMModel, optimizer: str, accum_iters: int, eps: float = None
):
    """Gradient accumulation (--mlperf-grad-accum-iter, dlrm_s_pytorch.py:1604-1621):
    batches arrive stacked on a leading accum axis; grads are averaged via lax.scan
    before one optimizer step.

    Deliberate deviation (documented in PARITY.md): grads are MEANED over the
    accum axis so the effective step size is LR-invariant in accum_iters; the
    reference accumulates raw sums (and its zero_grad placement effectively
    steps on the last micro-batch only)."""
    from dlrm_tpu.optim.optimizers import ADAGRAD_EPS

    eps = ADAGRAD_EPS if eps is None else float(eps)

    def train_step(params, opt_state, batches: Batch, lr):
        def one(carry, batch):
            def loss_fn(p):
                return model.loss(p, batch)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            acc = jax.tree_util.tree_map(jnp.add, carry, grads)
            return acc, loss

        zero = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), params
        )
        grads, losses = jax.lax.scan(one, zero, batches)
        grads = jax.tree_util.tree_map(lambda g: g / accum_iters, grads)
        new_params, new_state = apply_updates(
            optimizer, params, grads, opt_state, lr, eps=eps
        )
        # 4-tuple like the other steps (probs not tracked across
        # micro-batches; the harness only consumes the loss)
        return new_params, new_state, jnp.mean(losses), None

    return jax.jit(train_step, donate_argnums=(0, 1))
