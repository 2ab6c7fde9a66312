"""Decompose the dense fwd+bwd (~4.5ms at bs 8192 bf16) into parts.

Usage: dense_probe.py [batch_size]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.models.dlrm import DLRMModel, per_example_loss
from dlrm_tpu.ops.interaction import dot_interaction
from dlrm_tpu.ops.mlp import apply_mlp
from dlrm_tpu.optim.optimizers import apply_updates, init_opt_state

ITERS = 20


def chain(name, fn, *big, iters=ITERS):
    def bit(x):
        return (jnp.abs(x.reshape(-1)[0].astype(jnp.float32)) > 1e30
                ).astype(jnp.int32)

    @jax.jit
    def many(*big):
        def step(c, _):
            out = fn(c, *big)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return bit(leaf) | c, ()

        c, _ = jax.lax.scan(step, jnp.int32(0), None, length=iters)
        return c

    np.asarray(many(*big))
    t0 = time.perf_counter()
    np.asarray(many(*big))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print("devices:", jax.devices(), "bs:", bs, flush=True)
    cfg = DLRMConfig(
        embedding_dim=128, table_sizes=tuple([200_000] * 26),
        mlp_bot=(13, 512, 256, 128), mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot", loss="bce", num_indices_per_lookup=8,
        compute_dtype="bfloat16",
    )
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    dense_params = {k: v for k, v in params.items() if k != "emb"}
    key = jax.random.PRNGKey(1)
    dense = jax.random.normal(key, (bs, 13), jnp.float32)
    pooled = jax.random.normal(key, (bs, 26, 128), jnp.bfloat16)
    labels = (jax.random.uniform(key, (bs, 1)) < 0.5).astype(jnp.float32)
    x128 = jax.random.normal(key, (bs, 128), jnp.bfloat16)
    z = jax.random.normal(key, (bs, 479), jnp.bfloat16)

    f = jnp.float32

    chain("bot MLP fwd", lambda c, d: apply_mlp(
        dense_params["bot"], (d + c.astype(f)).astype(jnp.bfloat16), -1),
        dense)
    chain("interaction fwd", lambda c, x, ly: dot_interaction(
        x + c.astype(x.dtype), ly, False), x128, pooled)
    chain("top MLP fwd", lambda c, zz: apply_mlp(
        dense_params["top"], zz + c.astype(zz.dtype), -1), z)

    def full(c, dp, d, ly, lab):
        def rest(dp, ly):
            probs, logits = model.forward_from_pooled(
                dp, d + c.astype(f), ly)
            return jnp.mean(per_example_loss(cfg, probs, lab, logits)), probs

        (loss, _), (dg, dly) = jax.value_and_grad(
            rest, argnums=(0, 1), has_aux=True)(dp, ly)
        return loss

    chain("full dense fwd+bwd", full, dense_params, dense, pooled, labels)

    # dense optimizer update alone
    st = init_opt_state("rwsadagrad", params)
    dstate = {"step": st["step"],
              "accum": {k: v for k, v in st["accum"].items() if k != "emb"}}
    zeros = jax.tree_util.tree_map(jnp.zeros_like, dense_params)

    def upd(c, dp, g, s):
        new_p, _ = apply_updates(
            "rwsadagrad", dp, g, s, 0.01 + c.astype(f))
        return new_p["top"][0]["w"]

    chain("dense rwsadagrad update", upd, dense_params, zeros, dstate)


if __name__ == "__main__":
    main()
