"""End-to-end train-step timing: fused (XLA) vs streamed kernels.

Usage: train_bench.py [fused|stream|both|ragged] [batch_size ...]
`ragged` times the stream path on the REAL MLPerf v2 multi-hot distribution
(hot sizes 1..100, torchrec_dlrm Criteo config) with both the padded-to-max
layout and the per-table ragged plan. Measures K scan-chained steps per
config; only scalar losses cross the tunnel (PERF_NOTES.md rules).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.train.fused_step import make_fused_train_step
from dlrm_tpu.train.stream_step import (
    cast_emb,
    init_stream_opt_state,
    make_stream_train_step,
    pad_params,
    plan_for_model,
)

OPT = "rwsadagrad"
ITERS = 20

# the real MLPerf v2 Criteo multi-hot sizes (torchrec_dlrm README/config)
V2_HOT_SIZES = (3, 2, 1, 2, 6, 1, 1, 1, 1, 7, 3, 8, 1, 6, 9, 5, 1, 1, 1,
                12, 100, 27, 10, 3, 1, 1)


import os

TABLE_ROWS = int(os.environ.get("TABLE_ROWS", 200_000))


def cfg_for(batch_size):
    return DLRMConfig(
        embedding_dim=128,
        table_sizes=tuple([TABLE_ROWS] * 26),
        mlp_bot=(13, 512, 256, 128),
        mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot",
        loss="bce",
        num_indices_per_lookup=8,
        compute_dtype="bfloat16",
    )


def time_many(raw_step, params, opt_state, batch, label, bs):
    # batch rides as a jit ARG: closing over it bakes the whole staged
    # batch into the HLO as literals and blows the remote compile
    # service's payload limit at large bs (HTTP 413)
    @jax.jit
    def many(p, s, b):
        def one(carry, _):
            p, s = carry
            p, s, loss, _ = raw_step(p, s, b, 0.01)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(one, (p, s), None, length=ITERS)
        return losses  # [ITERS] scalars only

    t0 = time.perf_counter()
    losses = np.asarray(many(params, opt_state, batch))
    print(f"[{time.strftime('%H:%M:%S')}] {label}: compile+first "
          f"{time.perf_counter() - t0:.1f}s loss[-1]={losses[-1]:.4f}",
          flush=True)
    assert np.isfinite(losses).all(), losses
    t0 = time.perf_counter()
    np.asarray(many(params, opt_state, batch))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:46s} {dt*1e3:9.2f} ms/step  "
          f"{bs/dt:10.0f} examples/s", flush=True)


def run_ragged(bs):
    """Stream path on the ragged v2 config: padded-uniform plan vs the
    per-table ragged plan (same padded [T,B,Hmax] batch layout)."""
    import numpy as np

    from dlrm_tpu.data.random_data import HostBatch
    from dlrm_tpu.train.stream_step import plan_for_model

    hmax = max(V2_HOT_SIZES)
    cfg = cfg_for(bs)
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    from dlrm_tpu.data.random_data import ragged_multihot_batch

    hb = ragged_multihot_batch(
        np.random.default_rng(0), cfg.num_dense, cfg.table_sizes,
        V2_HOT_SIZES, bs,
    )
    variants = (("ragged", V2_HOT_SIZES), ("padded", hmax))
    if os.environ.get("RAGGED_ONLY"):  # padded cannot run at large bs
        variants = (("ragged", V2_HOT_SIZES),)
    for tag, hot in variants:
        plan = plan_for_model(model, bs, block_rows=2048, hot_sizes=hot)
        t0 = time.perf_counter()
        # ragged real columns are all-ones -> the device derives wts_u
        hb2 = hb.with_stream_work(plan, unit_weights=(tag == "ragged"))
        print(f"host stream work ({tag}, u={plan.u_total}): "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
        sp = cast_emb(pad_params(params, model, plan), jnp.bfloat16)
        sstate = init_stream_opt_state(OPT, sp, plan)
        step = make_stream_train_step(
            model, OPT, plan, fwd_impl="gather", grad_impl="gather",
            mm_dtype=jnp.bfloat16, stochastic_round=True,
        )
        time_many(step.__wrapped__, sp, sstate, hb2.to_device(),
                  f"stream v2-{tag} bs={bs}", bs)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    batches = [int(x) for x in sys.argv[2:]] or [2048]
    print("devices:", jax.devices(), flush=True)
    if which == "ragged":
        for bs in batches:
            run_ragged(bs)
        return
    for bs in batches:
        cfg = cfg_for(bs)
        model = DLRMModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        hb = fixed_multihot_batch(
            rng, cfg.num_dense, cfg.table_sizes, bs,
            cfg.num_indices_per_lookup,
        )

        if which in ("fused", "both"):
            step = make_fused_train_step(model, OPT)
            time_many(step.__wrapped__, params,
                      init_opt_state(OPT, params), hb.to_device(),
                      f"fused bs={bs}", bs)

        if which in ("stream", "both"):
            plan = plan_for_model(model, bs, block_rows=2048)
            t0 = time.perf_counter()
            hb2 = hb.with_stream_work(plan)
            print(f"host stream work: {(time.perf_counter()-t0)*1e3:.0f} ms",
                  flush=True)
            sp = pad_params(params, model, plan)
            sstate = init_stream_opt_state(OPT, sp, plan)
            import os as _os

            variants = (
                (jnp.float32, jnp.float32, "onehot", jnp.float32),
                (jnp.float32, jnp.bfloat16, "gather", jnp.float32),
                (jnp.bfloat16, jnp.bfloat16, "gather", jnp.float32),
                # g_dtype=bf16 hits a Mosaic memref_slice bug (dynamic
                # offset into packed bf16 HBM tiling) — not supported
            )
            if _os.environ.get("BF16_ONLY"):
                variants = variants[2:]
            for tdt, mm, gi, gdt in variants:
                try:
                    step = make_stream_train_step(
                        model, OPT, plan, fwd_impl="gather", grad_impl=gi,
                        mm_dtype=mm, g_dtype=gdt,
                        stochastic_round=(tdt == jnp.bfloat16),
                    )
                    time_many(
                        step.__wrapped__, cast_emb(sp, tdt), sstate,
                        hb2.to_device(),
                        f"stream bs={bs} tbl={jnp.dtype(tdt).name} "
                        f"mm={jnp.dtype(mm).name} g={jnp.dtype(gdt).name} "
                        f"grad={gi}", bs,
                    )
                except ValueError as e:  # onehot VMEM guard raises at trace
                    print(f"skip grad={gi} at bs={bs}: {e}", flush=True)
                    continue


if __name__ == "__main__":
    main()
