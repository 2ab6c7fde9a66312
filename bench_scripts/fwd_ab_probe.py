"""A/B: forward impl (XLA gather+pool vs K3+K4 stream) and grad impl
(gather_grads vs K1 window_grads) on the REAL ragged v2 shape at bs 16384.

PERF_NOTES.md:59-62 projected the streamed forward as batch-independent
(table revolve + MXU pooling) vs the issue-rate-bound gather (~12 ns/hit);
VERDICT r2 weak #3 asked for the A/B at the headline batch. Measurement
follows the backend rules (PERF_NOTES.md:15-22): individually dispatched
steps with loop-carried params, completion forced by a scalar loss fetch.

Usage: python bench_scripts/fwd_ab_probe.py [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V2_HOT_SIZES = (3, 2, 1, 2, 6, 1, 1, 1, 1, 7, 3, 8, 1, 6, 9, 5, 1, 1, 1,
                12, 100, 27, 10, 3, 1, 1)
BATCH = 16384
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
WARMUP = 2


def measure(fwd_impl: str, grad_impl: str) -> float:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dlrm_tpu.config import DLRMConfig
    from dlrm_tpu.data.random_data import ragged_multihot_batch
    from dlrm_tpu.models.dlrm import DLRMModel
    from dlrm_tpu.train.stream_step import (
        cast_emb,
        init_stream_opt_state,
        make_stream_train_step,
        pad_params,
        plan_for_model,
    )

    cfg = DLRMConfig(
        embedding_dim=128,
        table_sizes=tuple([200_000] * 26),
        mlp_bot=(13, 512, 256, 128),
        mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot",
        loss="bce",
        num_indices_per_lookup=max(V2_HOT_SIZES),
        compute_dtype="bfloat16",
    )
    model = DLRMModel(cfg)
    plan = plan_for_model(model, BATCH, block_rows=2048, hot_sizes=V2_HOT_SIZES)
    params = cast_emb(
        pad_params(model.init_params(jax.random.PRNGKey(0)), model, plan),
        jnp.bfloat16,
    )
    opt_state = init_stream_opt_state("rwsadagrad", params, plan)
    step = make_stream_train_step(
        model, "rwsadagrad", plan, fwd_impl=fwd_impl, grad_impl=grad_impl,
        mm_dtype=jnp.bfloat16, stochastic_round=True,
    )
    staged = []
    for i in range(2):
        hb = ragged_multihot_batch(
            np.random.default_rng(100 + i), cfg.num_dense, cfg.table_sizes,
            V2_HOT_SIZES, BATCH,
        )
        hb = dataclasses.replace(hb, wt=None)
        staged.append(
            hb.with_stream_work(plan, unit_weights=True).to_device(
                flat_hots=plan.hot
            )
        )

    p, s = params, opt_state
    loss = None
    for i in range(WARMUP):
        p, s, loss, _ = step(p, s, staged[i % 2], 0.01)
    float(loss)
    t0 = time.perf_counter()
    for i in range(ITERS):
        p, s, loss, _ = step(p, s, staged[i % 2], 0.01)
    last = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(last), last
    return BATCH * ITERS / dt


def main():
    # Only the stream/onehot legs are DESIGNED to reject at this batch
    # (sized ValueError from stream_kernels.py:111 when the K3/K4 VMEM
    # budget cannot hold bs 16384); the gather/gather control leg must
    # succeed, so its failure propagates (nonzero exit) instead of being
    # folded into the expected-rejection print.
    rate = measure("gather", "gather")
    print(f"fwd=gather  grad=gather : {rate:,.0f} examples/s/chip "
          f"({BATCH * ITERS / rate * 1000 / ITERS:.1f} ms/step)", flush=True)
    for fwd, grad in (("stream", "gather"), ("gather", "onehot")):
        try:
            rate = measure(fwd, grad)
            print(f"fwd={fwd:7s} grad={grad:7s}: {rate:,.0f} examples/s/chip "
                  f"({BATCH * ITERS / rate * 1000 / ITERS:.1f} ms/step)",
                  flush=True)
        except ValueError as e:  # expected VMEM-budget rejection
            print(f"fwd={fwd:7s} grad={grad:7s}: REJECTED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
