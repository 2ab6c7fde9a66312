"""Streamed-kernel butterfly: the U-layout sparse update under a mesh.

Combines the hybrid-parallel butterfly dataflow (parallel/butterfly.py —
the reference's distributed_forward, dlrm_s_pytorch.py:528-585) with the
streamed Pallas update kernels (ops/stream_kernels.py — the reference's
FBGEMM optimizer-in-backward, torchrec_dlrm/dlrm_main.py:649-653):

  * each model shard holds its tables in the shard-local STREAM layout
    (block-aligned padded stack, ops/stream_plan.py), replicated over "data";
  * forward is the ordinary butterfly: local gather+pool over the data
    group's batch slice -> lax.all_to_all -> dense tail;
  * backward all-gathers the pooled cotangent over "data" (each table
    replica sees every data group's hits — same exchange as the fused
    scatter path) and then runs K1-gather + K2 stream_update on the LOCAL
    shard: per-chip cost = one stream of the local table shard,
    batch-independent, so the update SCALES DOWN linearly with model
    parallelism;
  * the per-batch U-layout work is built on the host per model shard
    (native/stream_work.cc) over the FULL batch and ships replicated over
    "data" — the input-dist stage of the pipeline.

Every model shard shares ONE static plan geometry: tables are assigned by
size rank (size_rr — slot j holds comparably-sized tables on every shard)
and each slot is sized/hotted for the largest table occupying it anywhere;
smaller tables fill the extra hot columns with weight-0 hits, which are
exact no-ops through pooling and the update kernels. Skewed table sizes
and ragged per-table hot sizes are therefore supported.

Tables too big for one shard (rw_threshold / capacity_rows) are ROW-WISE
STRIPED: each shard holds an equal row slice as an extra stream slot after
the table-wise ones. Forward masks hits to the shard's row range and
reduces partial pools with psum_scatter (exactly the fused mixed plan,
butterfly.py); backward streams only the slice — the host U-layout build
masks each shard's work to its own rows, so per-shard update cost scales
down with the stripe. This is what trains the 40M-row flagship outliers
(torchrec_dlrm/README.MD:45-53) on the streamed (fastest) path. The
remaining restriction is pooling weights (v_w) on the SHARDED stream path:
this class has no v_w slot layout and raises loudly (v2_main routes the
combination to the fused butterfly with an explicit error). Single-chip
stream training of v_w is supported (train/stream_step.py, r5).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from dlrm_tpu.data.batch import Batch, StreamArrays
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.ops.stream_kernels import gather_grads, stream_update
from dlrm_tpu.ops.stream_plan import (
    build_stream_work,
    make_stream_plan,
    touched_update_items,
)
from dlrm_tpu.optim.optimizers import apply_updates
from dlrm_tpu.parallel.butterfly import ButterflyDLRM, _tree_specs


class StreamButterfly(ButterflyDLRM):
    """Butterfly-parallel DLRM whose table update runs the streamed kernels
    on each model shard."""

    def __init__(self, model: DLRMModel, mesh, *, block_rows: int = 2048,
                 batch_size: int, table_dtype=jnp.float32,
                 stochastic_round: Optional[bool] = None,
                 mm_dtype=jnp.bfloat16, interpret: bool = False,
                 hot_sizes=None, rw_threshold: Optional[int] = None,
                 capacity_rows: Optional[int] = None,
                 allow_capacity_overflow: bool = False,
                 rw_bucket_caps=None, rw_spill: int = 4,
                 rw_shared_cap=None):
        # size_rr assignment: slot j holds comparably-sized tables on every
        # shard, so the common per-slot plan geometry (max size / max hot
        # per slot) pays minimal padding on skewed configs.
        # rw_threshold / capacity_rows additionally stripe over-budget
        # tables ROW-WISE across the model shards: each shard holds (and
        # streams) only its row slice as an extra stream slot — the layout
        # that trains the 40M-row flagship outliers on the streamed path
        # (torchrec_dlrm/README.MD:45-53; VERDICT r2 next-round #1).
        # rw_bucket_caps owner-buckets the striped slots' FORWARD gather on
        # the host (parallel/rw_bucket.py), so each shard gathers ~h/M +
        # spill hits instead of ALL striped-table hits masked — the same
        # weak-scaling fix the fused path has (VERDICT r3 missing #2). The
        # backward is untouched: the host U-layout already masks each
        # shard's update work to its own rows.
        # rw_shared_cap ("auto" or int) buckets ALL striped tables' owned
        # hits into ONE [C] segment per (shard, bag) with per-slot table
        # ids (rw_bucket.bucket_rw_hits_shared): the sigma padding of the
        # per-table caps is paid once, cutting the forward's striped
        # gather count ~1.7x at the flagship shape (PERF_NOTES r5).
        super().__init__(model, mesh, strategy="size_rr",
                         rw_threshold=rw_threshold,
                         capacity_rows=capacity_rows,
                         allow_capacity_overflow=allow_capacity_overflow,
                         rw_bucket_caps=rw_bucket_caps, rw_spill=rw_spill)
        if rw_shared_cap is not None:
            if rw_bucket_caps is not None:
                raise ValueError(
                    "rw_shared_cap and rw_bucket_caps are mutually "
                    "exclusive bucketing modes"
                )
            if not self.num_rw:
                raise ValueError(
                    "rw_shared_cap given but the plan stripes no tables"
                )
            from dlrm_tpu.parallel.rw_bucket import default_shared_cap

            rw_hots_ = [
                (hot_sizes[int(t)] if hot_sizes is not None
                 else model.cfg.num_indices_per_lookup)
                for t in self.rw_ids
            ]
            self.rw_shared = (
                default_shared_cap(rw_hots_, self.msize)
                if rw_shared_cap == "auto"
                else int(rw_shared_cap)
            )
            self.rw_spill = int(rw_spill)
        else:
            self.rw_shared = None
        cfg = model.cfg
        if cfg.weighted_pooling is not None:
            raise NotImplementedError(
                "stream butterfly does not support learned pooling weights "
                "(v_w); use the fused butterfly"
            )
        num_t = cfg.num_tables
        self.hots_all = tuple(
            int(h) for h in hot_sizes
        ) if hot_sizes is not None else (cfg.num_indices_per_lookup,) * num_t
        if len(self.hots_all) != num_t:
            raise ValueError(
                f"{len(self.hots_all)} hot sizes for {num_t} tables"
            )
        self.table_dtype = jnp.dtype(table_dtype)
        self.sr = (
            stochastic_round
            if stochastic_round is not None
            else self.table_dtype == jnp.dtype(jnp.bfloat16)
        )
        self.mm_dtype = mm_dtype
        self.interpret = interpret
        self.batch_size = batch_size
        # tables of shard s, in slot order (includes dummies >= num_tables)
        self.shard_tables = [
            list(self.shard_tables_of(s)) for s in range(self.msize)
        ]
        # common per-slot geometry: slot j is sized/hotted for the largest
        # table occupying it on ANY shard; smaller tables use a prefix of
        # the slot's rows and pad the extra hot columns with weight-0 hits
        # (exact no-ops through pooling and the update kernels). Dummy-only
        # slots get a minimal 8-row / 1-hot footprint.
        slot_sizes, slot_hots = [], []
        for j in range(self.t_local):
            real = [
                int(self.shard_major_order[s * self.t_local + j])
                for s in range(self.msize)
            ]
            real = [t for t in real if t < num_t]
            slot_sizes.append(
                max(cfg.table_sizes[t] for t in real) if real else 8
            )
            slot_hots.append(
                max(self.hots_all[t] for t in real) if real else 1
            )
        # row-wise striped tables become EXTRA stream slots after the
        # table-wise ones: slot t_local+i holds table rw_ids[i]'s per-shard
        # row slice — identical geometry on every shard (equal slices), so
        # the common plan still holds. Forward masks hits to the shard's
        # row range (+psum_scatter); the update streams only the slice.
        #
        # OWNED-HITS U budgets for striped slots (r5): the shard-masked
        # weights zero ~(M-1)/M of a striped slot's hits, and the STATIC
        # u segment size is what G_u gathers, K2 items, and the host sort
        # all cost (PERF_NOTES r5 shard_slice_probe). Budgeting the
        # segment at the binomial owned-count mean + 6 sigma (+CHUNK
        # slack) lets the builder DROP the weight-0 foreign hits — exact,
        # with a LOUD overflow error at ~1e-9/batch odds — so per-shard
        # striped update work scales as ~h/M instead of h.
        u_budget = [None] * self.t_local
        for i, t in enumerate(self.rw_ids):
            slot_sizes.append(int(self.rw_slice[i]))
            ht = self.hots_all[int(t)]
            slot_hots.append(ht)
            bh = batch_size * ht
            p = 1.0 / self.msize
            bud = int(bh * p + 6.0 * np.sqrt(bh * p * (1 - p))) + 256
            u_budget.append(min(bh, bud))
        self.local_sizes = tuple(slot_sizes)
        self.slot_hots = tuple(slot_hots)
        self.n_slots = self.t_local + self.num_rw
        self.plan = make_stream_plan(
            self.local_sizes, cfg.embedding_dim, batch_size,
            self.slot_hots, block_rows=block_rows,
            u_budget=u_budget,
        )
        if self.num_rw:
            # the forward's masked lookup addresses rw slices at their
            # STREAM offsets, not the parent placement's
            self.rw_off = np.asarray(
                [
                    self.plan.padded_offsets[self.t_local + i]
                    for i in range(self.num_rw)
                ],
                dtype=np.int32,
            )

    # --------------------------------------------------------------- layout

    def shard_params(self, params):
        """Single-device params -> per-shard stream-padded layout
        [msize * plan.padded_rows, d], P('model')."""
        cfg = self.cfg
        stacked = np.asarray(params["emb"]["stacked"])
        d = stacked.shape[1]
        shards = []
        for s in range(self.msize):
            buf = np.zeros((self.plan.padded_rows, d), stacked.dtype)
            for j, t in enumerate(self.shard_tables[s]):
                if t >= cfg.num_tables:
                    continue
                off = int(self.model.row_offsets[t])
                n = cfg.table_sizes[t]
                buf[
                    self.plan.padded_offsets[j] : self.plan.padded_offsets[j]
                    + n
                ] = stacked[off : off + n]
            for i, t in enumerate(self.rw_ids):
                t = int(t)
                off = int(self.model.row_offsets[t])
                n = cfg.table_sizes[t]
                sl = int(self.rw_slice[i])
                lo, hi = s * sl, min(n, (s + 1) * sl)
                if lo >= hi:
                    continue
                dst = self.plan.padded_offsets[self.t_local + i]
                buf[dst : dst + (hi - lo)] = stacked[off + lo : off + hi]
            shards.append(buf)
        relaid = np.concatenate(shards, axis=0).astype(self.table_dtype)
        out = dict(params)
        out["emb"] = {"stacked": self._put(relaid, P("model"))}
        rep = NamedSharding(self.mesh, P())
        for k in ("bot", "top", "dcn", "proj_w1", "proj_w2"):
            if k in out:
                out[k] = jax.tree_util.tree_map(
                    lambda a: jax.device_put(jnp.asarray(a), rep), out[k]
                )
        return out

    def unshard_params(self, params):
        """Back to the single-device contiguous layout."""
        cfg = self.cfg
        stacked = np.asarray(
            jax.device_get(params["emb"]["stacked"]), np.float32
        )
        d = stacked.shape[1]
        out_tables = [None] * cfg.num_tables
        for s in range(self.msize):
            buf = stacked[
                s * self.plan.padded_rows : (s + 1) * self.plan.padded_rows
            ]
            for j, t in enumerate(self.shard_tables[s]):
                if t >= cfg.num_tables:
                    continue
                n = cfg.table_sizes[t]
                off = self.plan.padded_offsets[j]
                out_tables[t] = buf[off : off + n]
        for i, t in enumerate(self.rw_ids):
            t = int(t)
            n = cfg.table_sizes[t]
            sl = int(self.rw_slice[i])
            off = self.plan.padded_offsets[self.t_local + i]
            parts = []
            for s in range(self.msize):
                lo, hi = s * sl, min(n, (s + 1) * sl)
                if lo >= hi:
                    break
                base = s * self.plan.padded_rows + off
                parts.append(stacked[base : base + (hi - lo)])
            out_tables[t] = np.concatenate(parts, axis=0)
        out = dict(params)
        out["emb"] = {
            "stacked": jnp.asarray(np.concatenate(out_tables, axis=0))
        }
        return out

    def init_opt_state(self, optimizer: str, params):
        state = {"step": jnp.zeros((), jnp.int32)}
        if optimizer == "sgd":
            return state
        accum = {
            k: jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, jnp.float32), v
            )
            for k, v in params.items()
            if k != "emb"
        }
        if optimizer == "rwsadagrad":
            acc = jnp.zeros(
                (self.msize * self.plan.acc_rows, 128), jnp.float32
            )
        elif optimizer == "adagrad":
            acc = jnp.zeros_like(params["emb"]["stacked"], jnp.float32)
        else:
            raise ValueError(f"optimizer {optimizer!r} not supported")
        accum["emb"] = {"stacked": self._put(acc, P("model"))}
        state["accum"] = accum
        return state

    def shard_batch(self, batch_host, with_stream: bool = True) -> Batch:
        """HostBatch -> device batch with per-model-shard stream work.

        dense/labels: P(('data','model')); idx/wt: P('model','data') (the
        forward's view); stream arrays: P('model') with a leading shard
        axis, replicated over 'data' (the update's full-batch view).
        with_stream=False skips the U-layout build + transfer — eval only
        needs the forward's view."""
        hb = batch_host
        num_t, b, h = hb.idx.shape
        idx = np.asarray(hb.idx)
        wt = (
            np.asarray(hb.wt)
            if hb.wt is not None
            else np.ones((num_t, b, h), np.float32)
        )
        # owner-bucketed row-wise hits, computed ONCE: the forward's
        # bucketed view and (r5) the compact striped slots' U fill
        bucketed = shared = None
        if self.num_rw and self.rw_bucket:
            from dlrm_tpu.parallel.rw_bucket import bucket_rw_hits

            bucketed = bucket_rw_hits(
                idx[self.rw_ids], wt[self.rw_ids], self.rw_bucket_caps,
                self.rw_slice, self.rw_off, self.msize, self.rw_spill,
            )
        elif self.num_rw and self.rw_shared is not None and with_stream:
            # shared-segment bucketing (train batches; eval batches ride
            # the masked path below — with_stream=False)
            from dlrm_tpu.parallel.rw_bucket import bucket_rw_hits_shared

            shared = bucket_rw_hits_shared(
                idx[self.rw_ids], wt[self.rw_ids], self.rw_shared,
                self.rw_slice, self.rw_off, self.msize, self.rw_spill,
            )
        stream = None
        if with_stream:
            hmax = max(max(self.slot_hots), h)
            works = []
            for s in range(self.msize):
                idx_s = np.zeros((self.n_slots, b, hmax), np.int32)
                wt_s = np.zeros((self.n_slots, b, hmax), np.float32)
                for j, t in enumerate(self.shard_tables[s]):
                    if t >= num_t:
                        continue
                    idx_s[j, :, :h] = idx[t]
                    wt_s[j, :, :h] = wt[t]
                    # a table smaller-hotted than its slot pads the extra
                    # columns with weight-0 hits (exact no-ops)
                    ht = self.hots_all[t]
                    if ht < hmax:
                        wt_s[j, :, ht:] = 0.0
                # row-wise striped slots: each shard streams only the hits
                # landing in ITS row slice, exactly once globally — the
                # masked fill localizes foreign hits to row 0 at weight 0,
                # and the slot's u_budget makes the builder DROP those
                # weight-0 hits so the U segment holds only ~1/M owned
                # hits (r5; loud overflow if the 6-sigma budget is beat).
                for i, t in enumerate(self.rw_ids):
                    t = int(t)
                    sl = int(self.rw_slice[i])
                    lo = s * sl
                    j = self.t_local + i
                    own = (idx[t] >= lo) & (idx[t] < lo + sl)
                    idx_s[j, :, :h] = np.where(own, idx[t] - lo, 0)
                    wt_s[j, :, :h] = wt[t] * own
                    ht = self.hots_all[t]
                    if ht < hmax:
                        wt_s[j, :, ht:] = 0.0
                w_ = build_stream_work(self.plan, idx_s, wt_s)
                # the butterfly's forward is a gather (K3 never runs), so
                # the update worklist can always drop hit-free blocks when
                # the in-place aliased K2 is active (same call-time env
                # check as stream_kernels._k2_aliases)
                if not os.environ.get("DLRM_K2_NO_ALIAS"):
                    w_ = touched_update_items(self.plan, w_)
                works.append(w_)
            stack = lambda name: np.stack(  # noqa: E731
                [np.asarray(getattr(w, name)) for w in works]
            )
            spec_m = P("model")
            stream = StreamArrays(
                rows_u=self._put(stack("rows_u"), spec_m),
                vals_u=self._put(stack("vals_u"), spec_m),
                wts_u=self._put(stack("wts_u"), spec_m),
                w2t=self._put(stack("w2t"), spec_m),
                item_block=self._put(stack("item_block"), spec_m),
                item_row0=self._put(stack("item_row0"), spec_m),
                item_u=self._put(stack("item_u"), spec_m),
            )
        kw = {}
        if self.num_rw:
            if shared is not None:
                ib, wb, tb, si, sw_, st = shared
                kw = dict(
                    idx_rwb=self._put(ib, P("model", "data", None)),
                    wt_rwb=self._put(wb, P("model", "data", None)),
                    tid_rwb=self._put(tb, P("model", "data", None)),
                    idx_rw=self._put(si, P("data")),
                    wt_rw=self._put(sw_, P("data")),
                    tid_rw=self._put(st, P("data")),
                )
            elif self.rw_bucket:
                # owner-bucketed forward view: each shard receives only the
                # hits it owns, pre-localized to its STREAM offsets
                # (self.rw_off is the stream-plan layout here); overflow
                # spills ride the masked path at width rw_spill
                ib, wb, si, sw = bucketed
                kw = dict(
                    idx_rw=self._put(si, P(None, "data")),
                    wt_rw=self._put(sw, P(None, "data")),
                    idx_rwb=self._put(ib, P("model", "data", None)),
                    wt_rwb=self._put(wb, P("model", "data", None)),
                )
            else:
                # masked forward view: hits replicated over "model" (every
                # shard masks its own row range, like the fused mixed plan)
                kw = dict(
                    idx_rw=self._put(idx[self.rw_ids], P(None, "data")),
                    wt_rw=self._put(wt[self.rw_ids], P(None, "data")),
                )
        idx, wt = self._pad_reorder_sparse(idx, wt, num_t)
        return Batch(
            dense=self._put(hb.dense, P(("data", "model"))),
            idx=self._put(idx, P("model", "data")),
            wt=self._put(wt, P("model", "data")),
            labels=self._put(hb.labels, P(("data", "model"))),
            stream=stream,
            **kw,
        )

    # ----------------------------------------------------------------- steps

    def make_grad_accum_train_step(self, *args, **kwargs):
        # the inherited accum step targets the FUSED placement layout and
        # its per-row accumulators; the stream layout's packed rwsadagrad
        # accumulator ([rows/128, 128]) would shape-error confusingly deep
        # inside shard_map — reject up front with the supported path
        raise NotImplementedError(
            "gradient accumulation composes with the fused butterfly "
            "(ButterflyDLRM.make_grad_accum_train_step); the streamed "
            "update path does not implement an accumulation step"
        )

    def _local_offsets(self):
        # table j of every shard starts at the same (uniform) plan offset;
        # only the TABLE-WISE slots — the forward addresses rw slices
        # through self.rw_off (_rw_local_hits)
        offs = np.asarray(
            self.plan.padded_offsets[: self.t_local], np.int32
        )
        return self._put(np.tile(offs, self.msize), P("model"))

    def _rw_shared_pooled(self, params, idxb_l, wtb_l, tidb_l):
        """Partial pools from the SHARED bucket segment [b, C]: one gather
        for all striped tables, then one masked einsum per table (the
        einsum FLOPs are trivial next to the gathers this layout avoids —
        a per-table-caps layout gathers sum(C_t)+T_rw*spill columns where
        this gathers C_shared+S). Pad slots are tid 0 / weight 0 no-ops."""
        emb_l = params["emb"]["stacked"]
        rows = jnp.take(emb_l, idxb_l, axis=0)  # [b, C, d]
        outs = []
        for t in range(self.num_rw):
            w = wtb_l * (tidb_l == t).astype(wtb_l.dtype)
            outs.append(
                jnp.einsum("bcd,bc->bd", rows, w.astype(rows.dtype))
            )
        return jnp.stack(outs)  # [T_rw, b, d]

    def _rw_shared_spill_pooled(self, params, sp_row, sp_wt, sp_tid):
        """Shared [b, S] spill: GLOBAL rows + table ids; each shard masks
        to its per-table row range (tid-indexed slice lengths/offsets)."""
        emb_l = params["emb"]["stacked"]
        s = jax.lax.axis_index("model")
        sl = jnp.take(jnp.asarray(self.rw_slice), sp_tid)  # [b, S]
        off = jnp.take(jnp.asarray(self.rw_off), sp_tid)
        lo = s * sl
        mask = (sp_row >= lo) & (sp_row < lo + sl) & (sp_wt != 0)
        loc = jnp.where(mask, sp_row - lo + off, 0)
        rows = jnp.take(emb_l, loc, axis=0)  # [b, S, d]
        outs = []
        for t in range(self.num_rw):
            w = sp_wt * (mask & (sp_tid == t)).astype(sp_wt.dtype)
            outs.append(
                jnp.einsum("bsd,bs->bd", rows, w.astype(rows.dtype))
            )
        return jnp.stack(outs)  # [T_rw, b, d]

    def make_train_step(self, optimizer: str, global_batch: int, params,
                        opt_state, eps: float = None):
        cfg = self.cfg
        mesh = self.mesh
        plan = self.plan
        has_rw = self.num_rw > 0
        if optimizer not in ("sgd", "adagrad", "rwsadagrad"):
            raise ValueError(f"optimizer {optimizer!r} not supported")

        bucket = self.rw_bucket and has_rw
        shared = self.rw_shared is not None and has_rw

        def device_fn(params, opt_state, dense_l, idx_l, wt_l, labels_l,
                      off_l, sw, lr, *rw):
            sp_i_l = sp_w_l = sp_t_l = tid_rwb_l = None
            if bucket:
                idx_rw_l, wt_rw_l = rw[0], rw[1]  # spill (masked path)
                idx_rwb_l, wt_rwb_l = rw[2][0], rw[3][0]
            elif shared:
                sp_i_l, sp_w_l, sp_t_l = rw[0], rw[1], rw[2]
                idx_rwb_l, wt_rwb_l, tid_rwb_l = (
                    rw[3][0], rw[4][0], rw[5][0]
                )
                idx_rw_l = wt_rw_l = None
            else:
                idx_rw_l, wt_rw_l = rw if has_rw else (None, None)
            emb_l = params["emb"]["stacked"]  # [padded_rows, d] local shard
            # per-slot-hot gathers (r5): idx_l is padded to the GLOBAL hot
            # max (100 on the real v2 shape) but slot j's tables never use
            # more than slot_hots[j] columns — a single padded take would
            # gather [t_local, b, 100, d] (9.4 GiB at the flagship batch)
            # where the real hits are <= (10, 6, 1) per slot
            parts = []
            for j in range(self.t_local):
                hj = int(self.slot_hots[j])
                fi = idx_l[j, :, :hj] + off_l[j]
                rows = jnp.take(emb_l, fi, axis=0)  # [b, hj, d]
                parts.append(
                    jnp.sum(
                        rows * wt_l[j, :, :hj, None].astype(rows.dtype),
                        axis=1, dtype=jnp.float32,
                    )
                )
            pooled = jnp.stack(parts).astype(emb_l.dtype)  # [t_local, b, d]
            if has_rw:
                if shared:
                    pooled_rw = self._rw_shared_pooled(
                        params, idx_rwb_l, wt_rwb_l, tid_rwb_l
                    ) + self._rw_shared_spill_pooled(
                        params, sp_i_l, sp_w_l, sp_t_l
                    )
                else:
                    loc_rw, wt_rw_eff = self._rw_local_hits(
                        params, idx_rw_l, wt_rw_l
                    )
                    rows_rw = jnp.take(emb_l, loc_rw, axis=0)
                    pooled_rw = jnp.einsum(
                        "tbhd,tbh->tbd", rows_rw,
                        wt_rw_eff.astype(rows_rw.dtype),
                    )  # partial sums (this shard's rows only)
                    if bucket:  # the masked part carried only the spill
                        pooled_rw = pooled_rw + self._rw_bucket_pooled(
                            params, idx_rwb_l, wt_rwb_l
                        )
                pooled = (pooled, pooled_rw)
            loss, probs, dpooled, new_dense, new_dense_state = (
                self._dense_half(
                    optimizer, params, opt_state, emb_l,
                    pooled, dense_l, labels_l, lr, eps=eps,
                )
            )
            if has_rw:
                # AD through psum_scatter all-gathers the cotangent over
                # "model": every shard sees the striped tables' FULL pooled
                # grad for its data slice
                dpooled, dpooled_rw = dpooled

            # every table replica sees every data group's hits (same
            # exchange as the fused path), then streams its local shard
            dp_all = jax.lax.all_gather(
                dpooled, "data", axis=1, tiled=True
            )  # [t_local, B, d]
            if has_rw:
                dp_rw_all = jax.lax.all_gather(
                    dpooled_rw, "data", axis=1, tiled=True
                )  # [T_rw, B, d]
                # striped slots follow the tw slots in the stream plan; the
                # host-built U-layout masked their hits to this shard's row
                # slice, so the streamed update touches each hit once
                dp_all = jnp.concatenate([dp_all, dp_rw_all], axis=0)
            g_u = gather_grads(
                dp_all.astype(jnp.float32), sw.vals_u[0], sw.wts_u[0],
                sw.w2t[0],
            )
            acc = (
                None
                if optimizer == "sgd"
                else opt_state["accum"]["emb"]["stacked"]
            )
            from dlrm_tpu.ops.stream_kernels import ADAGRAD_EPS

            out = stream_update(
                optimizer, plan, emb_l, acc, g_u, sw.rows_u[0],
                sw.item_block[0], sw.item_row0[0], sw.item_u[0], lr,
                mm_dtype=self.mm_dtype,
                eps=ADAGRAD_EPS if eps is None else float(eps),
                stochastic_round=self.sr,
                seed=opt_state["step"], interpret=self.interpret,
            )
            new_params = dict(new_dense)
            new_params["emb"] = {"stacked": out[0]}
            if optimizer == "sgd":
                new_state = {"step": new_dense_state["step"]}
            else:
                new_state = {
                    "step": new_dense_state["step"],
                    "accum": {
                        **new_dense_state["accum"],
                        "emb": {"stacked": out[1]},
                    },
                }
            return new_params, new_state, loss, probs

        pspec = _tree_specs(params)
        ospec = _tree_specs(opt_state)
        sspec = StreamArrays(*([P("model")] * len(StreamArrays._fields)))
        in_specs = [
            pspec,
            ospec,
            P(("data", "model")),
            P("model", "data"),
            P("model", "data"),
            P(("data", "model")),
            P("model"),
            sspec,
            P(),
        ]
        if has_rw:
            if shared:
                in_specs += [P("data"), P("data"), P("data"),
                             P("model", "data", None),
                             P("model", "data", None),
                             P("model", "data", None)]
            else:
                in_specs += [P(None, "data"), P(None, "data")]
                if bucket:
                    in_specs += [P("model", "data", None),
                                 P("model", "data", None)]
        step = shard_map(
            device_fn,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(pspec, ospec, P(), P(("data", "model"))),
            check_vma=False,
        )
        local_off = self._local_offsets()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch: Batch, lr):
            if shared:
                rw = (batch.idx_rw, batch.wt_rw, batch.tid_rw,
                      batch.idx_rwb, batch.wt_rwb, batch.tid_rwb)
            else:
                rw = (batch.idx_rw, batch.wt_rw) if has_rw else ()
                if bucket:
                    rw = rw + (batch.idx_rwb, batch.wt_rwb)
            return step(
                params, opt_state, batch.dense, batch.idx, batch.wt,
                batch.labels, local_off, batch.stream, jnp.float32(lr), *rw,
            )

        return train_step

    def make_eval_step(self, params):
        mesh = self.mesh
        has_rw = self.num_rw > 0
        bucket = self.rw_bucket and has_rw

        def device_fn(params, dense_l, idx_l, wt_l, off_l, *rw):
            if bucket:
                idx_rw_l, wt_rw_l = rw[0], rw[1]  # spill (masked path)
                idx_rwb_l, wt_rwb_l = rw[2][0], rw[3][0]
            else:
                idx_rw_l, wt_rw_l = rw if has_rw else (None, None)
                idx_rwb_l = wt_rwb_l = None
            return self._forward_local(
                params, dense_l, idx_l, wt_l, off_l, idx_rw_l, wt_rw_l,
                idx_rwb_l=idx_rwb_l, wt_rwb_l=wt_rwb_l,
            )[0]

        pspec = _tree_specs(params)
        in_specs = [
            pspec,
            P(("data", "model")),
            P("model", "data"),
            P("model", "data"),
            P("model"),
        ]
        if has_rw:
            in_specs += [P(None, "data"), P(None, "data")]
            if bucket:
                in_specs += [P("model", "data", None),
                             P("model", "data", None)]
        step = shard_map(
            device_fn,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=P(("data", "model")),
            check_vma=False,
        )
        local_off = self._local_offsets()

        @jax.jit
        def eval_step(params, batch: Batch):
            rw = (batch.idx_rw, batch.wt_rw) if has_rw else ()
            if bucket:
                rw = rw + (batch.idx_rwb, batch.wt_rwb)
            return step(
                params, batch.dense, batch.idx, batch.wt, local_off, *rw
            )

        return eval_step
