"""Measure ONE model shard's full train step of the 8-shard flagship plan
on the real chip (VERDICT r4 missing #1 / next-round #1).

The repo's 8-chip production story for the reference's 104.5 GiB flagship
(torchrec_dlrm/README.MD:45-53) was byte/hit ARITHMETIC (PARITY.md
"Per-shard GATHER arithmetic"); this probe turns it into a measurement:

  * the REAL 26-table CRITEO_1TB row counts (204.2M rows) and the REAL v2
    ragged hot sizes (214 hits/sample);
  * the M=8 mixed plan StreamButterfly itself computes (balanced-load
    capacity): 6 striped tables (hots 3,7,3,12,100,27 = 152 of the 214
    hits/sample), shard 0 = 3 LPT tables + six 1/8 stripe slices
    = 26.0M padded rows = 6.25 GiB bf16 (+0.10 GiB rowwise-adagrad acc);
  * owner-bucketed forward (parallel/rw_bucket.py) + the r5 OWNED-HITS
    u budgets for striped slots (the builder drops the masked-out
    foreign hits, so each shard's U holds ~1/M of the striped hits);
  * local batch 16384 -> GLOBAL batch 131072 (the weak-scaling claim is
    "per-chip step ~= single-chip step at constant local batch");
  * the full local step: per-slot-hot gathers + bucketed/spill pooling,
    dense tail at local batch, K1-gather + K2 stream of the 6.25 GiB
    shard, rowwise-adagrad — with COLLECTIVES REPLACED BY IDENTITY at
    matching shapes (tile/slice stand-ins for the a2a / psum_scatter /
    all_gather; PARITY.md puts the real collective time at ~1 ms on ICI,
    far under the step).

Prints per-shard step ms and the examples/s/chip-equivalent
(local_batch / step_time), to compare against the single-chip headline
(185-202k ex/s) and the reference's 148.8k/chip 8xA100 number.

Usage: PYTHONPATH=/root/repo python bench_scripts/shard_slice_probe.py
       [--global-batch 131072] [--iters 30] [--staged 2] [--spill 6]
       [--shared [--shared-cap N]]

Measured r5 progression (PERF_NOTES): per-table caps + full-size U
512.8 ms -> owned-hits U budgets 396.8 -> --shared 328.0 ->
--shared --shared-cap 33 --spill 10: 309.7 ->
+ --block-rows 4096: 304.7 ms (53.8k ex/s/chip-eq, 0.361x baseline).
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

V2_HOTS = (3, 2, 1, 2, 6, 1, 1, 1, 1, 7, 3, 8, 1, 6, 9, 5, 1, 1, 1,
           12, 100, 27, 10, 3, 1, 1)
M = 8
D_AX = 1  # data axis of the deployment mesh (data=1, model=8)


class _StubMesh:
    """Shape-only mesh: StreamButterfly.__init__ consumes mesh.shape alone;
    the probe never calls the shard_map paths."""

    shape = {"data": D_AX, "model": M}


def build_shard(global_batch: int, spill: int, shared: bool,
                shared_cap=None, block_rows: int = 2048):
    from dlrm_tpu.config import DLRMConfig
    from dlrm_tpu.configs.presets import CRITEO_1TB_COUNTS
    from dlrm_tpu.models.dlrm import DLRMModel
    from dlrm_tpu.parallel.rw_bucket import default_bucket_caps
    from dlrm_tpu.parallel.stream_butterfly import StreamButterfly

    counts = tuple(int(c) for c in CRITEO_1TB_COUNTS)
    cfg = DLRMConfig(
        embedding_dim=128,
        table_sizes=counts,
        mlp_bot=(13, 512, 256, 128),
        mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot",
        loss="bce",
        num_indices_per_lookup=max(V2_HOTS),
        compute_dtype="bfloat16",
    )
    model = DLRMModel(cfg)
    cap = int(sum(counts) / M * 1.1)  # balanced-load budget (stripes the
    # 40M-row outliers; the PARITY.md deployment plan)
    pre = StreamButterfly(
        model, _StubMesh(), block_rows=block_rows, batch_size=global_batch,
        hot_sizes=V2_HOTS, capacity_rows=cap, table_dtype=jnp.bfloat16,
    )
    rw_hots = [V2_HOTS[int(t)] for t in pre.rw_ids]
    if shared:
        sb = StreamButterfly(
            model, _StubMesh(), block_rows=block_rows, batch_size=global_batch,
            hot_sizes=V2_HOTS, capacity_rows=cap, table_dtype=jnp.bfloat16,
            rw_shared_cap="auto" if shared_cap is None else shared_cap,
            rw_spill=spill,
        )
    else:
        caps = default_bucket_caps(rw_hots, M)
        sb = StreamButterfly(
            model, _StubMesh(), block_rows=block_rows, batch_size=global_batch,
            hot_sizes=V2_HOTS, capacity_rows=cap, table_dtype=jnp.bfloat16,
            rw_bucket_caps=caps, rw_spill=spill,
        )
    return model, cfg, sb


def host_batch_for_shard(sb, cfg, global_batch: int, seed: int, shard: int = 0):
    """Shard `shard`'s device arrays for one global batch: the exact host
    work shard_batch does, restricted to one shard (no mesh)."""
    from dlrm_tpu.ops.stream_plan import (
        build_stream_work, touched_update_items,
    )
    from dlrm_tpu.parallel.rw_bucket import bucket_rw_hits

    rng = np.random.default_rng(seed)
    b = global_batch
    num_t = cfg.num_tables
    hmax = max(V2_HOTS)
    idx = np.zeros((num_t, b, hmax), np.int32)
    wt = np.zeros((num_t, b, hmax), np.float32)
    for t, h in enumerate(V2_HOTS):
        idx[t, :, :h] = rng.integers(
            0, cfg.table_sizes[t], (b, h), dtype=np.int64
        ).astype(np.int32)
        wt[t, :, :h] = 1.0

    t0 = time.perf_counter()
    if sb.rw_shared is not None:
        from dlrm_tpu.parallel.rw_bucket import bucket_rw_hits_shared

        ib, wb, tb, sp_i, sp_w, sp_t = bucket_rw_hits_shared(
            idx[sb.rw_ids], wt[sb.rw_ids], sb.rw_shared, sb.rw_slice,
            sb.rw_off, M, sb.rw_spill,
        )
    else:
        ib, wb, sp_i, sp_w = bucket_rw_hits(
            idx[sb.rw_ids], wt[sb.rw_ids], sb.rw_bucket_caps, sb.rw_slice,
            sb.rw_off, M, sb.rw_spill,
        )
        tb = sp_t = None

    s = shard
    plan = sb.plan
    slot_hmax = max(max(sb.slot_hots), hmax)
    idx_s = np.zeros((sb.n_slots, b, slot_hmax), np.int32)
    wt_s = np.zeros((sb.n_slots, b, slot_hmax), np.float32)
    for j, t in enumerate(sb.shard_tables[s]):
        if t >= num_t:
            continue
        idx_s[j, :, :hmax] = idx[t]
        wt_s[j, :, :hmax] = wt[t]
        ht = V2_HOTS[t]
        if ht < slot_hmax:
            wt_s[j, :, ht:] = 0.0
    for i, t in enumerate(sb.rw_ids):
        t = int(t)
        sl = int(sb.rw_slice[i])
        lo = s * sl
        j = sb.t_local + i
        # masked fill; the slot's u_budget makes the builder DROP the
        # weight-0 foreign hits (owned-hits-only U, r5)
        own = (idx[t] >= lo) & (idx[t] < lo + sl)
        idx_s[j, :, :hmax] = np.where(own, idx[t] - lo, 0)
        wt_s[j, :, :hmax] = wt[t] * own
        ht = V2_HOTS[t]
        if ht < slot_hmax:
            wt_s[j, :, ht:] = 0.0
    w_ = build_stream_work(plan, idx_s[:, :, : max(plan.hot)],
                           wt_s[:, :, : max(plan.hot)])
    w_ = touched_update_items(plan, w_)
    host_ms = (time.perf_counter() - t0) * 1e3

    # forward-view arrays for shard s (what P("model","data") would deliver)
    tw_hmax = max(sb.slot_hots[: sb.t_local])
    idx_tw = np.zeros((sb.t_local, b, tw_hmax), np.int32)
    wt_tw = np.zeros((sb.t_local, b, tw_hmax), np.float32)
    for j, t in enumerate(sb.shard_tables[s]):
        if t >= num_t:
            continue
        ht = V2_HOTS[t]
        idx_tw[j, :, :ht] = idx[t, :, :ht]
        wt_tw[j, :, :ht] = wt[t, :, :ht]
    dense = rng.random((b // (D_AX * M), cfg.num_dense), dtype=np.float32)
    labels = (rng.random((b // (D_AX * M), 1)) < 0.3).astype(np.float32)

    dev = {
        "dense": jnp.asarray(dense),
        "labels": jnp.asarray(labels),
        "idx_tw": jnp.asarray(idx_tw),
        "wt_tw": jnp.asarray(wt_tw),
        "idx_rwb": jnp.asarray(ib[s]),
        "wt_rwb": jnp.asarray(wb[s]),
        "tid_rwb": None if tb is None else jnp.asarray(tb[s]),
        "idx_sp": jnp.asarray(sp_i),
        "wt_sp": jnp.asarray(sp_w),
        "tid_sp": None if sp_t is None else jnp.asarray(sp_t),
        "rows_u": jnp.asarray(w_.rows_u),
        "vals_u": jnp.asarray(w_.vals_u),
        "wts_u": jnp.asarray(w_.wts_u),
        "w2t": jnp.asarray(w_.w2t),
        "item_block": jnp.asarray(w_.item_block),
        "item_row0": jnp.asarray(w_.item_row0),
        "item_u": jnp.asarray(w_.item_u),
    }
    return dev, host_ms


def make_step(model, cfg, sb, global_batch: int):
    """One shard's local step, collectives replaced by identity-at-shape."""
    from dlrm_tpu.models.dlrm import masked_mean, per_example_loss
    from dlrm_tpu.ops.stream_kernels import gather_grads, stream_update
    from dlrm_tpu.optim.optimizers import apply_updates

    plan = sb.plan
    b_l = global_batch // (D_AX * M)
    t_all = cfg.num_tables
    num_rw = sb.num_rw
    caps = sb.rw_bucket_caps if sb.rw_shared is None else None
    cap0 = (
        None if caps is None
        else np.concatenate([[0], np.cumsum(np.asarray(caps))]).astype(int)
    )
    rw_off = jnp.asarray(sb.rw_off)
    rw_slice = jnp.asarray(sb.rw_slice)
    tw_off = jnp.asarray(
        np.asarray(plan.padded_offsets[: sb.t_local], np.int32)
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(emb_l, acc, dense_params, dense_state, bt, lr):
        # ---- forward: per-slot-hot tw gathers (device_fn, r5 geometry)
        parts = []
        for j in range(sb.t_local):
            hj = int(sb.slot_hots[j])
            fi = bt["idx_tw"][j, :, :hj] + tw_off[j]
            rows = jnp.take(emb_l, fi, axis=0)
            parts.append(
                jnp.sum(
                    rows * bt["wt_tw"][j, :, :hj, None].astype(rows.dtype),
                    axis=1, dtype=jnp.float32,
                )
            )
        pooled_tw = jnp.stack(parts).astype(emb_l.dtype)  # [t_local, B, d]

        # ---- striped: bucketed owned pools + shard-masked spill pools
        if sb.rw_shared is not None:
            # SHARED segment: one gather for all striped tables + per-table
            # masked einsums; shared [B, S] spill with tid-indexed ranges
            rows = jnp.take(emb_l, bt["idx_rwb"], axis=0)  # [B, C, d]
            outs = []
            for t in range(num_rw):
                w = bt["wt_rwb"] * (bt["tid_rwb"] == t).astype(jnp.float32)
                outs.append(
                    jnp.einsum("bcd,bc->bd", rows, w.astype(rows.dtype))
                )
            pooled_b = jnp.stack(outs)
            sl_h = jnp.take(rw_slice, bt["tid_sp"])  # [B, S] (shard 0)
            off_h = jnp.take(rw_off, bt["tid_sp"])
            maskh = (bt["idx_sp"] >= 0) & (bt["idx_sp"] < sl_h) & (
                bt["wt_sp"] != 0
            )
            loch = jnp.where(maskh, bt["idx_sp"] + off_h, 0)
            rows_h = jnp.take(emb_l, loch, axis=0)  # [B, S, d]
            sp_outs = []
            for t in range(num_rw):
                w = bt["wt_sp"] * (
                    maskh & (bt["tid_sp"] == t)
                ).astype(jnp.float32)
                sp_outs.append(
                    jnp.einsum("bsd,bs->bd", rows_h, w.astype(rows_h.dtype))
                )
            pooled_rw = pooled_b + jnp.stack(sp_outs)
        else:
            outs = []
            for i in range(num_rw):
                seg = bt["idx_rwb"][:, cap0[i] : cap0[i] + int(caps[i])]
                w = bt["wt_rwb"][:, cap0[i] : cap0[i] + int(caps[i])]
                rows = jnp.take(emb_l, seg, axis=0)
                outs.append(
                    jnp.einsum("bcd,bc->bd", rows, w.astype(rows.dtype))
                )
            pooled_b = jnp.stack(outs)  # [T_rw, B, d]
            lo = 0 * rw_slice  # shard 0
            mask = (bt["idx_sp"] >= lo[:, None, None]) & (
                bt["idx_sp"] < (lo + rw_slice)[:, None, None]
            )
            loc = jnp.where(mask, bt["idx_sp"] - lo[:, None, None]
                            + rw_off[:, None, None], 0)
            w_sp = bt["wt_sp"] * mask.astype(bt["wt_sp"].dtype)
            rows_sp = jnp.take(emb_l, loc, axis=0)
            pooled_rw = pooled_b + jnp.einsum(
                "tbhd,tbh->tbd", rows_sp, w_sp.astype(rows_sp.dtype)
            )

        # ---- FAKE collectives at matching shapes:
        # a2a: shard would receive its t_local slots from all M shards for
        # its b_l batch slice -> [t_local*M >= 21 tables, b_l, d]
        ly_tw = jnp.tile(pooled_tw[:, :b_l], (M, 1, 1))[: t_all - num_rw]
        # psum_scatter over model -> [T_rw, b_l, d]
        ly_rw = pooled_rw[:, :b_l]
        ly = jnp.transpose(
            jnp.concatenate([ly_tw, ly_rw], axis=0), (1, 0, 2)
        )  # [b_l, T, d]

        def rest(dp, pooled):
            probs, logits = model.forward_from_pooled(
                dp, bt["dense"], pooled
            )
            return masked_mean(
                per_example_loss(cfg, probs, bt["labels"], logits),
                bt["labels"],
            ), probs

        (loss, probs), (dgrads, dly) = jax.value_and_grad(
            rest, argnums=(0, 1), has_aux=True
        )(dense_params, ly)

        new_dense, new_dense_state = apply_updates(
            "rwsadagrad", dense_params, dgrads, dense_state, lr, eps=1e-10
        )

        # ---- FAKE transposed collectives: shard gets the FULL-batch
        # cotangent for its slots: [n_slots, B_global, d]
        dly_t = jnp.transpose(dly, (1, 0, 2))  # [T, b_l, d]
        dp_tw = jnp.tile(dly_t[: sb.t_local], (1, M, 1))
        dp_rw = jnp.tile(dly_t[t_all - num_rw :], (1, M, 1))
        dp_all = jnp.concatenate([dp_tw, dp_rw], axis=0)

        g_u = gather_grads(
            dp_all, bt["vals_u"], bt["wts_u"], bt["w2t"],
            out_dtype=jnp.bfloat16,
        )
        out = stream_update(
            "rwsadagrad", plan, emb_l, acc, g_u, bt["rows_u"],
            bt["item_block"], bt["item_row0"], bt["item_u"], lr,
            mm_dtype=jnp.bfloat16, eps=1e-10, stochastic_round=True,
            seed=dense_state["step"],
        )
        return out[0], out[1], new_dense, new_dense_state, loss

    return step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--global-batch", type=int, default=131072)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--staged", type=int, default=2)
    p.add_argument("--spill", type=int, default=6)
    p.add_argument("--shared", action="store_true",
                   help="shared-segment bucket (rw_shared_cap=auto)")
    p.add_argument("--block-rows", type=int, default=2048)
    p.add_argument("--shared-cap", type=int, default=None,
                   help="override the shared cap (auto = mean + 6 sigma; "
                   "3 sigma ~= 33 at the flagship shape)")
    args = p.parse_args()

    model, cfg, sb = build_shard(args.global_batch, args.spill, args.shared,
                                 args.shared_cap, args.block_rows)
    plan = sb.plan
    d = cfg.embedding_dim
    b_l = args.global_batch // (D_AX * M)
    print(f"shard 0: {sb.t_local} tw slots (hots {sb.slot_hots[:sb.t_local]})"
          f" + {sb.num_rw} striped (u budgets"
          f" {[sb.plan.u_budget[sb.t_local+i] for i in range(sb.num_rw)]});"
          f" {plan.padded_rows/1e6:.1f}M padded rows = "
          f"{plan.padded_rows*d*2/2**30:.2f} GiB bf16"
          f" (+{plan.padded_rows*4/2**30:.2f} acc); plan u={plan.u_size/1e6:.1f}M"
          f" -> G_u bf16 {(plan.u_size//1024+1)*1024*d*2/2**30:.2f} GiB",
          flush=True)

    staged, host_ms = [], []
    for i in range(args.staged):
        dev, hms = host_batch_for_shard(sb, cfg, args.global_batch, 100 + i)
        jax.block_until_ready(dev["rows_u"])
        staged.append(dev)
        host_ms.append(hms)
        print(f"staged batch {i}: host build {hms:.0f} ms", flush=True)

    # params: random shard table + dense params from a tiny-table twin
    import dataclasses

    from dlrm_tpu.models.dlrm import DLRMModel as _D

    tiny = _D(dataclasses.replace(cfg, table_sizes=(8,) * cfg.num_tables))
    dense_params = {
        k: v
        for k, v in tiny.init_params(jax.random.PRNGKey(0)).items()
        if k != "emb"
    }
    key = jax.random.PRNGKey(1)
    emb_l = jax.random.uniform(
        key, (plan.padded_rows, d), jnp.bfloat16, -0.01, 0.01
    )
    acc = jnp.zeros((plan.acc_rows, 128), jnp.float32)
    dense_state = {
        "step": jnp.zeros((), jnp.int32),
        "accum": jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), dense_params
        ),
    }

    step = make_step(model, cfg, sb, args.global_batch)
    t0 = time.perf_counter()
    emb_l, acc, dense_params, dense_state, loss = step(
        emb_l, acc, dense_params, dense_state, staged[0], 0.01
    )
    print(f"compile+first step {time.perf_counter()-t0:.1f}s "
          f"loss={float(loss):.4f}", flush=True)
    for i in range(2):  # warm
        emb_l, acc, dense_params, dense_state, loss = step(
            emb_l, acc, dense_params, dense_state,
            staged[i % args.staged], 0.01,
        )
    float(loss)
    t0 = time.perf_counter()
    for i in range(args.iters):
        emb_l, acc, dense_params, dense_state, loss = step(
            emb_l, acc, dense_params, dense_state,
            staged[i % args.staged], 0.01,
        )
    last = float(loss)
    dt = (time.perf_counter() - t0) / args.iters
    assert np.isfinite(last), last
    rate = b_l / dt
    print(f"per-shard step: {dt*1e3:.1f} ms at global batch "
          f"{args.global_batch} (local {b_l})")
    print(f"examples/s/chip-equivalent: {rate:,.0f} "
          f"({rate/148_800:.3f}x the 8xA100 per-chip baseline; "
          f"single-chip 200k-table headline for contrast: 185-202k)")
    print(f"8-chip aggregate projection: {rate*M/1e6:.2f}M examples/s "
          f"(reference 8xA100: 1.19M)")
    print(f"host U-build for one shard: {np.mean(host_ms):.0f} ms "
          "(one core; a production host parallelizes per-shard builds)")


if __name__ == "__main__":
    main()
