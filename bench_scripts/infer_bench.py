"""Inference (serving-path) throughput: fp32 / bf16 / int8 / int4 tables.

The reference's quantized inference path (--quantize-emb-with-bit 4|8 +
dynamic MLP quantization, dlrm_s_pytorch.py:430-481, 1473-1480) exists
here as ops/quantized.py; this probe measures the single-chip forward
rate of each variant on the bench shape. Scan-chained with a scalar
reduction per step (PERF_NOTES timing rules).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench_scripts/infer_bench.py [bs]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel

ITERS = 20


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
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
    hb = fixed_multihot_batch(
        np.random.default_rng(0), cfg.num_dense, cfg.table_sizes, bs, 8
    )
    batch = hb.to_device()

    def bench(tag, p):
        # params/batch ride as jit ARGS (a closure bakes the 2.7 GB table
        # into the HLO as a literal — see PERF_NOTES compile-payload rules)
        @jax.jit
        def many(p_, b_):
            # the batch content ROTATES through the scan carry: any
            # carry-independent subtree (the whole embedding lookup, most
            # of the forward) gets hoisted out of the loop by XLA LICM and
            # the "measurement" collapses to a single forward / ITERS
            def one(carry, _):
                acc, idx, dense = carry
                probs = model.apply(p_, b_._replace(idx=idx, dense=dense))
                return (
                    acc + jnp.sum(probs),
                    jnp.roll(idx, 1, axis=1),
                    jnp.roll(dense, 1, axis=0),
                ), None

            (s, _, _), _ = jax.lax.scan(
                one, (jnp.float32(0), b_.idx, b_.dense), None, length=ITERS
            )
            return s

        t0 = time.perf_counter()
        float(many(p, batch))
        print(f"[{tag}] compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        float(many(p, batch))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{tag:28s} {dt*1e3:8.2f} ms/batch  "
              f"{bs/dt:12.0f} examples/s", flush=True)

    import os

    only = os.environ.get("VARIANTS", "all")
    if only in ("all", "float"):
        from dlrm_tpu.train.stream_step import cast_emb

        bench("fp32 tables", params)
        bench("bf16 tables", cast_emb(params, jnp.bfloat16))
    if only in ("all", "quant"):
        for bits in (8, 4):
            pq = model.quantize_embeddings(
                jax.tree_util.tree_map(jnp.asarray, params), bits
            )
            bench(f"int{bits} rowwise tables", pq)
        # (int8-MLP variant omitted: quantize_mlps stores a static 'mode'
        # string in the tree, which cannot ride as a jit argument; MLP
        # quantization correctness is covered by tests/test_quantized.py
        # and the embedding lookup dominates serving anyway)


if __name__ == "__main__":
    main()
