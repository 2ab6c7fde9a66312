"""Benchmark: DLRM training throughput on the local chip(s).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the reference's per-GPU benchmark shape scaled to one chip:
torchrec DLRM-v2 dot-interaction trainer (torchrec_dlrm/dlrm_main.py), 26
multi-hot sparse features, 128-dim embeddings, local batch 2048, Adagrad —
the config of the best published A100 number (~148.8k examples/s/chip,
torchrec_dlrm/README.MD:51-53, see BASELINE.md).
"""

import json
import time

import numpy as np

BASELINE_EXAMPLES_PER_SEC_PER_CHIP = 148_800.0  # best 8xA100 v2 number / 8


def main():
    import jax

    from dlrm_tpu.config import DLRMConfig
    from dlrm_tpu.data.random_data import fixed_multihot_batch
    from dlrm_tpu.models.dlrm import DLRMModel
    from dlrm_tpu.optim.optimizers import init_opt_state
    from dlrm_tpu.train.fused_step import make_fused_train_step

    batch_size = 2048
    cfg = DLRMConfig(
        embedding_dim=128,
        # 26 Criteo-like tables; sizes capped so fp32 tables + dense grads fit
        # single-chip HBM (scaling beyond HBM is the multi-chip path)
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
    opt = "rwsadagrad"
    opt_state = init_opt_state(opt, params)
    step = make_fused_train_step(model, opt)

    rng = np.random.default_rng(0)
    batch = fixed_multihot_batch(
        rng, cfg.num_dense, cfg.table_sizes, batch_size,
        cfg.num_indices_per_lookup,
    ).to_device()

    # Measure K steps inside ONE lax.scan and force completion with a real
    # device->host transfer: per-call dispatch timing is unreliable on
    # remote/tunneled backends.
    raw = step.__wrapped__
    iters = 30

    def one(carry, _):
        p, s = carry
        p, s, loss, _ = raw(p, s, batch, 0.01)
        return (p, s), loss

    @jax.jit
    def many(p, s):
        (p, s), losses = jax.lax.scan(one, (p, s), None, length=iters)
        return p, s, losses

    params, opt_state, losses = many(params, opt_state)  # compile + warmup
    np.asarray(losses)
    t0 = time.perf_counter()
    params, opt_state, losses = many(params, opt_state)
    losses = np.asarray(losses)
    dt = time.perf_counter() - t0
    assert np.isfinite(losses).all(), f"non-finite losses {losses}"

    examples_per_sec = batch_size * iters / dt
    print(
        json.dumps(
            {
                "metric": "train_examples_per_sec_per_chip (DLRM-v2 dot, 26x200k tables, d=128, H=8, bs=2048, rowwise-adagrad)",
                "value": round(examples_per_sec, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(
                    examples_per_sec / BASELINE_EXAMPLES_PER_SEC_PER_CHIP, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
