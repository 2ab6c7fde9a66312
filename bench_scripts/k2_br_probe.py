"""K2 stream_update time vs block_rows (bf16 tables, bench scale, bs 8192).

Usage: k2_br_probe.py [br ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.ops.stream_kernels import stream_update
from dlrm_tpu.train.stream_step import (
    cast_emb, init_stream_opt_state, pad_params, plan_for_model)

ITERS = 10
BS = 8192


def main():
    brs = [int(x) for x in sys.argv[1:]] or [1024, 2048]
    print("devices:", jax.devices(), flush=True)
    cfg = DLRMConfig(
        embedding_dim=128, table_sizes=tuple([200_000] * 26),
        mlp_bot=(13, 512, 256, 128), mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot", loss="bce", num_indices_per_lookup=8,
        compute_dtype="bfloat16",
    )
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    hb = fixed_multihot_batch(rng, cfg.num_dense, cfg.table_sizes, BS, 8)

    for br in brs:
        plan = plan_for_model(model, BS, block_rows=br)
        hb2 = hb.with_stream_work(plan)
        sw = hb2.to_device().stream
        sp = cast_emb(pad_params(params, model, plan), jnp.bfloat16)
        emb = sp["emb"]["stacked"]
        acc = init_stream_opt_state("rwsadagrad", sp, plan)["accum"]["emb"][
            "stacked"
        ]
        g_u = jax.random.normal(
            jax.random.PRNGKey(1), (plan.u_total, 128), jnp.float32
        ) * 1e-6

        def bit(x):
            return (jnp.abs(x.reshape(-1)[0].astype(jnp.float32)) > 1e30
                    ).astype(jnp.int32)

        @jax.jit
        def many(emb, acc, g_u):
            def step(c, _):
                t, a = stream_update(
                    "rwsadagrad", plan, emb, acc, g_u, sw.rows_u,
                    sw.item_block, sw.item_row0, sw.item_u,
                    0.01 + c.astype(jnp.float32),
                    mm_dtype=jnp.bfloat16, stochastic_round=True,
                )
                return bit(t) | bit(a) | c, ()

            c, _ = jax.lax.scan(step, jnp.int32(0), None, length=ITERS)
            return c

        np.asarray(many(emb, acc, g_u))
        t0 = time.perf_counter()
        np.asarray(many(emb, acc, g_u))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"br={br:5d} items={int(sw.item_block.shape[0])} "
              f"blocks={plan.num_blocks}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
