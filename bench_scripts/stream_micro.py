"""Per-component timing of the streamed train step at a given batch size.

Each component is timed as a scan chain returning a scalar (PERF_NOTES
rules). Usage: stream_micro.py [batch_size]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel, per_example_loss
from dlrm_tpu.ops.embedding import fused_embedding_bag
from dlrm_tpu.ops.stream_kernels import gather_grads, stream_update
from dlrm_tpu.train.stream_step import (
    cast_emb, init_stream_opt_state, pad_params, plan_for_model)

ITERS = 10


def chain(name, fn, *big, iters=ITERS):
    """fn(c, *big) -> array; c is a runtime-0 int32 the caller must fold
    into an input (loop-carried dependence: stops XLA hoisting the body out
    of the scan). Large arrays MUST ride in *big — captured constants hang
    the remote compile service (PERF_NOTES.md)."""

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
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


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
    plan = plan_for_model(model, bs, block_rows=2048)
    rng = np.random.default_rng(0)
    hb = fixed_multihot_batch(
        rng, cfg.num_dense, cfg.table_sizes, bs, 8).with_stream_work(plan)
    batch = hb.to_device()
    sw = batch.stream
    offsets = jnp.asarray(np.asarray(plan.padded_offsets, np.int32))

    for tdt in (jnp.float32, jnp.bfloat16):
        name = jnp.dtype(tdt).name
        sp = cast_emb(pad_params(params, model, plan), tdt)
        emb = sp["emb"]["stacked"]
        sstate = init_stream_opt_state("rwsadagrad", sp, plan)
        acc = sstate["accum"]["emb"]["stacked"]

        # A. forward gather+pool (perturb idx with the runtime-0 bit)
        chain(f"[{name}] fwd gather+pool",
              lambda c, e: fused_embedding_bag(
                  e, offsets, batch.idx ^ c, batch.wt), emb)

        pooled = fused_embedding_bag(emb, offsets, batch.idx, batch.wt)
        dense_params = {k: v for k, v in sp.items() if k != "emb"}

        def rest(dp, ly):
            probs, logits = model.forward_from_pooled(dp, batch.dense, ly)
            return jnp.mean(per_example_loss(cfg, probs, batch.labels,
                                             logits))

        vg = jax.grad(rest, argnums=(0, 1))
        # B. dense fwd+bwd (perturb pooled cheaply via a scalar add)
        chain(f"[{name}] dense fwd+bwd",
              lambda c, dp, pl_: vg(dp, pl_ + c.astype(pl_.dtype)),
              dense_params, pooled)

        dly = vg(dense_params, pooled)[1]
        dly_t = jnp.transpose(dly, (1, 0, 2))
        # C. gather_grads (perturb the bag indices)
        chain(f"[{name}] gather_grads", lambda c, d: gather_grads(
            d, sw.vals_u ^ c, sw.wts_u, sw.w2t), dly_t)

        g_u = gather_grads(dly_t, sw.vals_u, sw.wts_u, sw.w2t)
        # D. K2 stream update (perturb lr — scalar, zero overhead)
        chain(f"[{name}] K2 rwsadagrad", lambda c, e, a, g: stream_update(
            "rwsadagrad", plan, e, a, g, sw.rows_u, sw.item_block,
            sw.item_row0, sw.item_u, 0.01 + c.astype(jnp.float32),
            mm_dtype=jnp.bfloat16,
            stochastic_round=(tdt == jnp.bfloat16))[0], emb, acc, g_u)


if __name__ == "__main__":
    main()
