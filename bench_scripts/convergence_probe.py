"""bf16+SR vs fp32 streamed training on the real chip: loss trajectories.

Trains the bench-scale model (26x200k, d=128, bs 8192) for N steps on a
shared synthetic data stream (fresh batch every step, labels correlated
with the features so there is signal to learn) under (a) fp32 tables and
(b) bf16 tables + stochastic rounding. Prints both loss curves; the bf16
curve tracking fp32 validates the low-precision table path end to end.

Usage: convergence_probe.py [steps] [batch_size]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import HostBatch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.train.stream_step import (
    cast_emb,
    init_stream_opt_state,
    make_stream_train_step,
    pad_params,
    plan_for_model,
)


def make_batch(rng, cfg, bs, table_row_bias):
    """Synthetic batch with learnable structure: the label depends on the
    dense features and on whether the sample's row draws are 'high' rows."""
    t = cfg.num_tables
    h = cfg.num_indices_per_lookup
    dense = rng.standard_normal((bs, cfg.num_dense)).astype(np.float32)
    idx = np.stack([
        rng.integers(0, n, (bs, h)).astype(np.int32)
        for n in cfg.table_sizes
    ])
    signal = dense[:, 0] + table_row_bias * (
        idx[0, :, 0] / cfg.table_sizes[0] - 0.5
    )
    p = 1.0 / (1.0 + np.exp(-2.0 * signal))
    labels = (rng.random(bs) < p).astype(np.float32)[:, None]
    return HostBatch(dense=dense, idx=idx, wt=None, labels=labels)


def run(tag, steps, bs, cfg, model, plan, batches, bf16):
    params = pad_params(model.init_params(jax.random.PRNGKey(0)), model, plan)
    if bf16:
        params = cast_emb(params, jnp.bfloat16)
    opt_state = init_stream_opt_state("rwsadagrad", params, plan)
    step = make_stream_train_step(
        model, "rwsadagrad", plan, fwd_impl="gather", grad_impl="gather",
        mm_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        stochastic_round=bf16,
    )
    losses = []
    t0 = time.perf_counter()
    for i, b in enumerate(batches):
        params, opt_state, loss, _ = step(params, opt_state, b, 0.01)
        if (i + 1) % max(1, steps // 10) == 0:
            losses.append((i + 1, float(loss)))
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt:.1f}s total", flush=True)
    for it, l in losses:
        print(f"  {tag} step {it:4d}: loss {l:.5f}", flush=True)
    return losses


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    print("devices:", jax.devices(), flush=True)
    cfg = DLRMConfig(
        embedding_dim=128, table_sizes=tuple([200_000] * 26),
        mlp_bot=(13, 512, 256, 128), mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot", loss="bce", num_indices_per_lookup=8,
        compute_dtype="bfloat16",
    )
    model = DLRMModel(cfg)
    plan = plan_for_model(model, bs, block_rows=2048)
    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    # a cycled pool bounds host->device transfer through the tunnel while
    # still giving fresh-enough data for a convergence signal
    pool = [
        make_batch(rng, cfg, bs, 3.0).with_stream_work(plan).to_device()
        for _ in range(min(steps, 12))
    ]
    batches = [pool[i % len(pool)] for i in range(steps)]
    print(f"host: built {len(pool)} batches in {time.perf_counter()-t0:.1f}s",
          flush=True)
    l32 = run("fp32", steps, bs, cfg, model, plan, batches, bf16=False)
    l16 = run("bf16+SR", steps, bs, cfg, model, plan, batches, bf16=True)
    f32 = l32[-1][1]
    f16 = l16[-1][1]
    print(f"final: fp32 {f32:.5f} vs bf16+SR {f16:.5f} "
          f"(rel diff {abs(f16-f32)/f32*100:.2f}%)", flush=True)


if __name__ == "__main__":
    main()
