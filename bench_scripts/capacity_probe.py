"""Single-chip HBM capacity probe: train with ~10 GB of bf16 tables.

26 tables x 1.5M rows x 128-dim bf16 = 10.0 GB of embedding state — MORE
than the 6.8 GB/chip each shard of the 8-chip mixed-plan flagship carries
(PARITY.md HBM arithmetic), demonstrated live on one v5e with the
streamed update.

r4 A/B (VERDICT r3 next-round #2): the K2 update used to stream the WHOLE
table every step (full revolve). With the touched-only block worklist
(ops/stream_plan.py::touched_update_items) untouched blocks are neither
DMA-in nor DMA-out under the in-place aliasing, so the step cost becomes
O(touched blocks). Criteo hits are power-law distributed: at bs 8192 most
cold-table blocks go untouched. This probe measures both worklists under
both a uniform and a zipf(1.05) hit distribution.

Tables are initialized DIRECTLY in bf16 on device (an fp32 init would be
20 GB and cannot coexist with its cast). Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python bench_scripts/capacity_probe.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CAP_CPU"):  # sitecustomize registers the TPU backend at
    jax.config.update("jax_platforms", "cpu")  # startup; env vars are too late

import jax.numpy as jnp

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.train.stream_step import (
    init_stream_opt_state,
    make_stream_train_step,
    plan_for_model,
)

ROWS = int(os.environ.get("CAP_ROWS", 1_500_000))
BS = int(os.environ.get("CAP_BS", 8192))
BLOCK_ROWS = int(os.environ.get("CAP_BR", 2048))
OPT = "rwsadagrad"
ITERS = 20
# CAP_IMPL=fused runs the coalesced O(touched rows) update
# (train/fused_step.py) instead of the K2 streamed revolve: at bs 8192 the
# batch's 1.7M hits blanket all 19058 2048-row blocks under ANY realistic id
# distribution (coupon-collector: ~89 hits/block expected), so block-level
# touched-only skipping cannot win — row-level coalescing is the capacity
# answer. Measured A/B lives in PERF_NOTES.md.
IMPL = os.environ.get("CAP_IMPL", "stream")


def _zipf_batch(rng, cfg):
    """Criteo-like power-law hits: zipf(1.05) ids folded into the table."""
    hb = fixed_multihot_batch(
        rng, cfg.num_dense, cfg.table_sizes, BS, cfg.num_indices_per_lookup
    )
    z = rng.zipf(1.05, size=hb.idx.shape).astype(np.int64)
    hb.idx = ((z - 1) % ROWS).astype(np.int32)
    return hb


def main():
    cfg = DLRMConfig(
        embedding_dim=128,
        table_sizes=(ROWS,) * 26,
        mlp_bot=(13, 512, 256, 128),
        mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot",
        loss="bce",
        num_indices_per_lookup=8,
        compute_dtype="bfloat16",
    )
    model = DLRMModel(cfg)
    if IMPL == "fused":
        total = model.total_rows
        gib = total * 128 * 2 / 2**30
        print(f"stacked table state: {total} rows = {gib:.2f} GiB bf16 "
              f"(fused coalesced update, bs={BS})", flush=True)
        plan = None
    else:
        plan = plan_for_model(model, BS, block_rows=BLOCK_ROWS)
        gib = plan.padded_rows * 128 * 2 / 2**30
        print(f"padded table state: {plan.padded_rows} rows = {gib:.2f} GiB "
              f"bf16 (block_rows={BLOCK_ROWS}, bs={BS})", flush=True)

    # dense params from the normal init (tiny); bf16 table born on device
    small = DLRMConfig(
        embedding_dim=128, table_sizes=(8,) * 26,
        mlp_bot=cfg.mlp_bot, mlp_top=cfg.mlp_top,
        interaction="dot", loss="bce", num_indices_per_lookup=8,
        compute_dtype="bfloat16",
    )
    dense_init = DLRMModel(small).init_params(jax.random.PRNGKey(0))

    n_table_rows = model.total_rows if IMPL == "fused" else plan.padded_rows

    @jax.jit
    def init_table(key):
        b = float(np.sqrt(1.0 / ROWS))
        return jax.random.uniform(
            key, (n_table_rows, 128), jnp.bfloat16, -b, b
        )

    if IMPL == "fused":
        from dlrm_tpu.optim.optimizers import init_opt_state
        from dlrm_tpu.train.fused_step import make_fused_train_step

        step = make_fused_train_step(model, OPT)
    else:
        step = make_stream_train_step(
            model, OPT, plan, fwd_impl="gather", grad_impl="gather",
            mm_dtype=jnp.bfloat16, stochastic_round=True,
        )
    raw = step.__wrapped__

    # donate params/opt_state AND return them: donation is only usable
    # when an output aliases the donated buffer — returning just the
    # losses made XLA copy the 9.3 GiB table before the in-place K2 run
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def many(p, s, b):
        def one(carry, _):
            p, s = carry
            p, s, loss, _ = raw(p, s, b, 0.01)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(one, (p, s), None, length=ITERS)
        return p, s, losses

    rng = np.random.default_rng(0)
    legs = []
    for dist in ("uniform", "zipf"):
        hb = (
            fixed_multihot_batch(
                rng, cfg.num_dense, cfg.table_sizes, BS,
                cfg.num_indices_per_lookup,
            )
            if dist == "uniform"
            else _zipf_batch(rng, cfg)
        )
        for touched in (False, True):
            legs.append((dist, touched, hb))
    if os.environ.get("CAP_LEGS"):  # e.g. CAP_LEGS=1,3 or CAP_LEGS=rev
        sel = os.environ["CAP_LEGS"]
        legs = legs[::-1] if sel == "rev" else [
            legs[int(i)] for i in sel.split(",")
        ]

    if IMPL == "fused":
        # fused legs ignore the touched flag (row-level coalescing always on)
        legs = [(d, t, hb) for d, t, hb in legs if not t]

    for dist, touched, hb in legs:
        if IMPL == "fused":
            nitems, nblk, nblk_tot = 0, 0, 0
            batch = hb.to_device()
        else:
            hb2 = hb.with_stream_work(plan, update_touched_only=touched)
            w = hb2.stream
            nitems = w.num_real_items
            nblk = len(np.unique(w.item_block[: w.num_real_items]))
            nblk_tot = plan.num_blocks
            batch = hb2.to_device()
        # deep-copy: `many` donates params, so a shallow-copied dense_init
        # leaves leg 2 holding deleted buffers (the original "leg-2 crash")
        params = jax.tree_util.tree_map(jnp.copy, dense_init)
        params["emb"] = {"stacked": init_table(jax.random.PRNGKey(1))}
        opt_state = (
            init_opt_state(OPT, params)
            if IMPL == "fused"
            else init_stream_opt_state(OPT, params, plan)
        )

        t0 = time.perf_counter()
        params, opt_state, losses = many(params, opt_state, batch)
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        params, opt_state, losses = many(params, opt_state, batch)
        np.asarray(losses)
        dt = (time.perf_counter() - t0) / ITERS
        tag = (
            "fused-coalesce" if IMPL == "fused"
            else "touched-only" if touched else "full-revolve"
        )
        print(
            f"[{dist:7s} {tag:12s}] items={nitems} "
            f"blocks={nblk}/{nblk_tot} "
            f"{dt*1e3:.1f} ms/step, {BS/dt:,.0f} ex/s/chip "
            f"(compile+first {compile_s:.0f}s, loss[-1]={losses[-1]:.4f})",
            flush=True,
        )
        del params, opt_state


if __name__ == "__main__":
    main()
