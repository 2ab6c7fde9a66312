"""Per-component timing of the fused train step on the local chip.

Times each stage of the bench.py config (26x200k tables, d=128, H=8, bs=2048)
in isolation with lax.scan loops, to locate the step-time bottleneck.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.ops.embedding import fused_embedding_bag
from dlrm_tpu.ops.sparse_update import (
    coalesce_hits,
    rowwise_adagrad_from_coalesced,
)
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.train.fused_step import make_fused_train_step


def timeit(name, fn, *args, iters=20):
    """Time fn(*args) iterated via lax.scan with a donated carry."""
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.3f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    batch_size = 2048
    cfg = DLRMConfig(
        embedding_dim=128,
        table_sizes=tuple([200_000] * 26),
        mlp_bot=(13, 512, 256, 128),
        mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot",
        loss="bce",
        num_indices_per_lookup=8,
        compute_dtype="bfloat16",
    )
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = init_opt_state("rwsadagrad", params)
    rng = np.random.default_rng(0)
    batch = fixed_multihot_batch(
        rng, cfg.num_dense, cfg.table_sizes, batch_size,
        cfg.num_indices_per_lookup,
    ).to_device()

    offsets = jnp.asarray(model.row_offsets)
    emb = params["emb"]["stacked"]
    total_rows = emb.shape[0]
    dense_params = {k: v for k, v in params.items() if k != "emb"}

    # 1. full fused step (donates params/state -> carry them through)
    step = make_fused_train_step(model, "rwsadagrad")
    p, s = params, opt_state
    p, s, loss, _ = step(p, s, batch, 0.01)
    jax.block_until_ready(loss)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        p, s, loss, _ = step(p, s, batch, 0.01)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"{'full fused step':42s} {dt*1e3:9.3f} ms")
    params = None  # donated; rebuild below
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = init_opt_state("rwsadagrad", params)
    emb = params["emb"]["stacked"]
    dense_params = {k: v for k, v in params.items() if k != "emb"}

    # 2. embedding forward only
    fwd = jax.jit(lambda e: fused_embedding_bag(e, offsets, batch.idx, batch.wt))
    timeit("embedding fwd (gather+pool)", fwd, emb)

    # 3. dense network fwd+bwd from pooled
    pooled = fwd(emb)

    def rest(dp, ly):
        from dlrm_tpu.models.dlrm import per_example_loss
        probs, logits = model.forward_from_pooled(dp, batch.dense, ly)
        return jnp.mean(per_example_loss(cfg, probs, batch.labels, logits))

    dense_vjp = jax.jit(jax.grad(rest, argnums=(0, 1)))
    timeit("dense fwd+bwd (MLPs+interaction)", dense_vjp, dense_params, pooled)

    # 4. coalesce (sort + segment sum)
    dly = dense_vjp(dense_params, pooled)[1]
    co = jax.jit(lambda g: coalesce_hits(g, batch.idx, batch.wt, offsets, total_rows))
    timeit("coalesce (sort+segsum)", co, dly)

    # 5. scatter update (rowwise adagrad)
    urows, G, valid = co(dly)
    acc = opt_state["accum"]["emb"]["stacked"]
    upd = jax.jit(
        lambda e, a: rowwise_adagrad_from_coalesced(e, a, urows, G, valid, 0.01)
    )
    timeit("rowwise-adagrad scatter", upd, emb, acc)

    # 6. embedding fwd+bwd via plain AD (for comparison: dense-grad path)
    def embloss(e):
        return jnp.sum(fused_embedding_bag(e, offsets, batch.idx, batch.wt))

    timeit("embedding fwd+bwd plain AD", jax.jit(jax.grad(embloss)), emb)


if __name__ == "__main__":
    main()
