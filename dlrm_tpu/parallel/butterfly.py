"""Hybrid-parallel DLRM train step: the butterfly all-to-all, TPU-native.

Reproduces the reference's distributed_forward dataflow (dlrm_s_pytorch.py:528-585
+ extend_distributed.py:389-486) as ONE jitted shard_map over a ("data", "model")
mesh:

  * embedding tables row-sharded over "model" in the planner's padded stacked
    layout (each model shard owns whole tables), replicated over "data";
  * sparse indices arrive [T, B, H] with tables sharded over "model" and batch
    sharded over "data" — each device looks up its local tables for its data
    group's FULL batch slice;
  * `lax.all_to_all` swaps (tables x batch) -> every device ends with ALL
    tables for its 1/(D*M) batch slice — the butterfly shuffle
    (dlrm_s_pytorch.py:555-569). XLA schedules the collective asynchronously,
    overlapping it with the bottom MLP exactly like the reference's explicit
    Request/Wait split (:563-568);
  * dense params replicated; their grads psum over the whole mesh (the DDP
    allreduce, dlrm_s_pytorch.py:1329-1336); table grads psum over "data" only
    and stay shard-local over "model" (the sparse path);
  * the optimizer update runs inside the same shard_map on local shards
    (the in-backward fused update of torchrec, dlrm_main.py:649-653).

Gradient scaling is single-device-consistent: the global loss is the mean over
the GLOBAL batch (local sum / B_global, then psum), so sharded training is
numerically equivalent to single-device training on the same global batch.
(The reference instead backpropagates each rank's local-mean loss, which scales
table gradients by world_size relative to single-device runs — a quirk we
deliberately do not reproduce; see SURVEY.md §2.3.)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.batch import Batch
from dlrm_tpu.models.dlrm import (
    DLRMModel,
    masked_mean,
    per_example_loss,
    valid_count,
)
from dlrm_tpu.ops.mlp import apply_mlp
from dlrm_tpu.optim.optimizers import apply_updates
from dlrm_tpu.parallel.planner import TablePlacement, plan_tables


class ButterflyDLRM:
    """Sharded DLRM runner over a ("data", "model") mesh.

    Holds static placement metadata; params/opt-state live in globally-shaped
    jax.Arrays with NamedShardings (single-controller view), so checkpointing
    and single-device export see ordinary arrays.
    """

    def __init__(
        self,
        model: DLRMModel,
        mesh: Mesh,
        strategy: str = "round_robin",
        rw_threshold: Optional[int] = None,
        capacity_rows: Optional[int] = None,
        cw_tables=None,
        rw_bucket_caps=None,
        rw_spill: int = 4,
        allow_capacity_overflow: bool = False,
    ):
        """strategy: 'round_robin' (v1 parity, dlrm_s_pytorch.py:636),
        'table_wise' (LPT packing), or 'mixed' (TorchRec-planner-style:
        row-wise stripe any table bigger than the balanced per-shard load,
        LPT-pack the rest — the layout that fits the real 26-table/104 GiB
        flagship config on a mesh, torchrec_dlrm/README.MD:45-53).

        rw_bucket_caps: per-striped-table bucket widths (aligned with the
        plan's rw table order) enabling host-side OWNER BUCKETING of
        row-wise hits (parallel/rw_bucket.py): each shard then gathers only
        the hits whose rows it owns (~h/M + spill per bag) instead of
        masking all h — the difference between ~1/M and ~1x per-shard
        gather load on the striped tables, which carry 149 of the 214
        hits/sample at the flagship shape. rw_spill: overflow columns that
        ride the masked path."""
        cfg = model.cfg
        if not model.fused:
            raise NotImplementedError(
                "butterfly path currently requires plain uniform-width tables "
                "(QR/MD tricks run table-wise replicated via the GSPMD path)"
            )
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.dsize = mesh.shape["data"]
        self.msize = mesh.shape["model"]
        self.placement = plan_tables(
            cfg.table_sizes, self.msize, strategy=strategy,
            rw_threshold=rw_threshold, capacity_rows=capacity_rows,
            cw_tables=cw_tables,
            allow_capacity_overflow=allow_capacity_overflow,
        )
        num_t = cfg.num_tables
        # ---- column-wise tables: separate [cw_rows, d] array sharded on the
        # FEATURE dim (TorchRec CW, dlrm_main.py:654-667). Each shard pools
        # a d/msize-wide partial for ALL hits; one a2a (split batch, concat
        # feature) assembles full-width vectors — 1/msize the a2a payload of
        # a table-wise slot, in exchange for gathering every hit on every
        # shard (worth it only for very hot / very wide tables; PARITY.md).
        # cw_ids/cw_offsets are parallel tuples in the placement (cw_tables()
        # returns the same sorted ids the planner stored)
        self.cw_ids = np.asarray(self.placement.cw_ids, dtype=np.int32)
        self.num_cw = len(self.cw_ids)
        self.cw_off = np.asarray(self.placement.cw_offsets, dtype=np.int32)
        if self.num_cw and cfg.embedding_dim % self.msize:
            raise ValueError(
                f"column-wise sharding needs embedding_dim "
                f"({cfg.embedding_dim}) divisible by the model axis "
                f"({self.msize})"
            )
        # ---- row-wise striped tables (mixed plan): every shard holds an
        # equal slice; lookups are masked-local + psum_scatter over "model"
        self.rw_ids = np.asarray(self.placement.rw_tables(), dtype=np.int32)
        self.num_rw = len(self.rw_ids)
        self.rw_off = np.asarray(
            [self.placement.global_offsets[t] for t in self.rw_ids],
            dtype=np.int32,
        )  # intra-shard offset of each rw table's slice
        self.rw_slice = np.asarray(
            [self.placement.slice_len(int(t)) for t in self.rw_ids],
            dtype=np.int32,
        )
        self.rw_bucket = rw_bucket_caps is not None
        if self.rw_bucket:
            if not self.num_rw:
                raise ValueError(
                    "rw_bucket_caps given but the plan stripes no tables"
                )
            if len(rw_bucket_caps) != self.num_rw:
                raise ValueError(
                    f"{len(rw_bucket_caps)} rw_bucket_caps for "
                    f"{self.num_rw} striped tables"
                )
            self.rw_bucket_caps = tuple(int(c) for c in rw_bucket_caps)
            if min(self.rw_bucket_caps) < 1:
                raise ValueError("rw_bucket_caps must be >= 1")
            self.rw_spill = int(rw_spill)
        # ---- table-wise slots: equal slot count per shard; LPT/round-robin
        # assignment comes from the placement, dummy slots fill the remainder
        # (their hits carry weight 0 and land on a padded row)
        per_shard = (
            [list(x) for x in self.placement.slots]
            if self.placement.slots is not None
            else [self.placement.local_tables(s) for s in range(self.msize)]
        )
        self.t_local = max(1, max(len(x) for x in per_shard))
        self.t_pad = self.t_local * self.msize
        shard_rows = self.placement.shard_rows
        order, local_off = [], []
        next_dummy = num_t
        for s in range(self.msize):
            slots = list(per_shard[s])
            while len(slots) < self.t_local:
                slots.append(next_dummy)
                next_dummy += 1
            for t in slots:
                order.append(t)
                local_off.append(
                    self.placement.global_offsets[t] % shard_rows
                    if t < num_t
                    else shard_rows - 1  # weight-0 hits: any row is safe
                )
        self.num_ids = next_dummy  # table-id space incl. dummies
        self.shard_major_order = np.asarray(order, dtype=np.int32)  # [t_pad]
        self.local_offsets_shard_major = np.asarray(local_off, dtype=np.int32)
        # merge permutation: original table t <- position in
        # concat([a2a output (t_pad slots, shard-major), rw tables, cw tables])
        slot_of = {int(t): i for i, t in enumerate(order)}
        merge = np.zeros(num_t, dtype=np.int32)
        for i, r in enumerate(self.rw_ids):
            merge[int(r)] = self.t_pad + i
        for i, c in enumerate(self.cw_ids):
            merge[int(c)] = self.t_pad + self.num_rw + i
        special = {int(r) for r in self.rw_ids} | {int(c) for c in self.cw_ids}
        for t in range(num_t):
            if t not in special:
                merge[t] = slot_of[t]
        self.merge_perm = merge  # [num_t] -> index into concat

        self._train_step = None
        self._eval_step = None

    def shard_tables_of(self, s: int):
        """Slot-ordered table ids (incl. dummies >= num_tables) of shard s."""
        return self.shard_major_order[s * self.t_local : (s + 1) * self.t_local]

    # ----------------------------------------------------------- shardings

    def shard_params(self, params):
        """Re-lay single-device params into the sharded placement layout."""
        from dlrm_tpu.parallel.planner import build_cw_stacked, build_stacked

        cfg = self.cfg
        if self.num_cw and "v_w" in params:
            raise NotImplementedError(
                "column-wise sharding does not compose with learned "
                "per-row pooling weights (v_w is row-laid-out)"
            )
        stacked = np.asarray(params["emb"]["stacked"])
        tables = []
        for t, n in enumerate(cfg.table_sizes):
            off = int(self.model.row_offsets[t])
            tables.append(stacked[off : off + n])
        relaid = build_stacked(self.placement, tables)
        out = dict(params)
        out["emb"] = {"stacked": self._put(relaid, P("model"))}
        if self.num_cw:
            out["emb"]["cw_stacked"] = self._put(
                build_cw_stacked(self.placement, tables), P(None, "model")
            )
        if "v_w" in params:
            vw = np.asarray(params["v_w"])
            vtabs = []
            for t, n in enumerate(cfg.table_sizes):
                off = int(self.model.row_offsets[t])
                vtabs.append(vw[off : off + n][:, None])
            vst = build_stacked(self.placement, vtabs)[:, 0]
            out["v_w"] = self._put(vst, P("model"))
        rep = NamedSharding(self.mesh, P())
        for k in ("bot", "top", "dcn", "proj_w1", "proj_w2"):
            if k in out:
                out[k] = jax.tree_util.tree_map(
                    lambda a: jax.device_put(jnp.asarray(a), rep), out[k]
                )
        return out

    def shard_opt_state(self, opt_state):
        """Re-lay a single-device optimizer state into the sharded layout
        (the checkpoint-resume path: cli --sharded --load-model). The emb
        accumulator rides the same placement relay as the table; dense
        accumulators replicate."""
        from dlrm_tpu.parallel.planner import build_stacked

        cfg = self.cfg
        out = {"step": jnp.asarray(opt_state["step"])}
        if "accum" not in opt_state:
            return out
        rep = NamedSharding(self.mesh, P())
        accum = {
            k: jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), rep), v
            )
            for k, v in opt_state["accum"].items()
            if k != "emb"
        }
        emb_acc = opt_state["accum"].get("emb", {}).get("stacked")
        if emb_acc is not None:
            from dlrm_tpu.parallel.planner import build_cw_stacked

            a = np.asarray(emb_acc)
            tabs = []
            for t, n in enumerate(cfg.table_sizes):
                off = int(self.model.row_offsets[t])
                sl = a[off : off + n]
                tabs.append(sl[:, None] if sl.ndim == 1 else sl)
            relaid = build_stacked(self.placement, tabs)
            if a.ndim == 1:
                relaid = relaid[:, 0]
            accum["emb"] = {"stacked": self._put(relaid, P("model"))}
            if self.num_cw:
                cw_acc = build_cw_stacked(self.placement, tabs)
                if a.ndim == 1:
                    # rwsadagrad per-row accumulator: identical on every
                    # shard (the update psums the row grad-square), so it
                    # rides replicated
                    accum["emb"]["cw_stacked"] = self._put(cw_acc[:, 0], P())
                else:
                    accum["emb"]["cw_stacked"] = self._put(
                        cw_acc, P(None, "model")
                    )
        out["accum"] = accum
        return out

    def unshard_params(self, params):
        """Back to the single-device contiguous layout (checkpoint export)."""
        from dlrm_tpu.parallel.planner import extract_cw_table, extract_table

        cfg = self.cfg
        stacked = np.asarray(jax.device_get(params["emb"]["stacked"]))
        cw_np = (
            np.asarray(jax.device_get(params["emb"]["cw_stacked"]))
            if self.num_cw
            else None
        )
        cw_set = {int(t) for t in self.cw_ids}
        tables = [
            extract_cw_table(self.placement, cw_np, t)
            if t in cw_set
            else extract_table(self.placement, stacked, t)
            for t in range(cfg.num_tables)
        ]
        out = dict(params)
        out["emb"] = {"stacked": jnp.asarray(np.concatenate(tables, axis=0))}
        if "v_w" in params:
            vst = np.asarray(jax.device_get(params["v_w"]))[:, None]
            vt = [
                extract_table(self.placement, vst, t)[:, 0]
                for t in range(cfg.num_tables)
            ]
            out["v_w"] = jnp.asarray(np.concatenate(vt))
        return out

    def _put(self, x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, spec))

    def shard_batch(self, batch: Batch) -> Batch:
        """idx/wt: [T_pad, B, H] tables sharded over model, batch over data;
        dense/labels: batch sharded over (data, model); row-wise tables'
        idx/wt replicated over model (every shard masks its row range).

        Grad-accumulation groups arrive stacked on a leading axis
        ([k, T, B, H] — built by harness._group_batches); the group axis
        stays unsharded and every spec shifts right by one."""
        grouped = batch.idx.ndim == 4
        num_t, b, h = batch.idx.shape[-3:]
        idx = np.asarray(batch.idx)
        wt = (
            np.asarray(batch.wt)
            if batch.wt is not None
            else np.ones(idx.shape, np.float32)
        )
        tax = 1 if grouped else 0  # table axis
        g = (None,) if grouped else ()
        kw = {}
        if self.num_rw:
            idx_rw = np.take(idx, self.rw_ids, axis=tax)
            wt_rw = np.take(wt, self.rw_ids, axis=tax)
            if self.rw_bucket:
                from dlrm_tpu.parallel.rw_bucket import bucket_rw_hits

                def _bucket(i, w):
                    return bucket_rw_hits(
                        i, w, self.rw_bucket_caps, self.rw_slice,
                        self.rw_off, self.msize, self.rw_spill,
                    )

                if grouped:
                    parts = [
                        _bucket(idx_rw[k], wt_rw[k])
                        for k in range(idx_rw.shape[0])
                    ]
                    ib, wb, si, sw = (
                        np.stack([p[j] for p in parts]) for j in range(4)
                    )
                else:
                    ib, wb, si, sw = _bucket(idx_rw, wt_rw)
                kw = dict(
                    # spill rides the masked path (idx_rw/wt_rw fields)
                    idx_rw=self._put(si, P(*g, None, "data")),
                    wt_rw=self._put(sw, P(*g, None, "data")),
                    idx_rwb=self._put(ib, P(*g, "model", "data", None)),
                    wt_rwb=self._put(wb, P(*g, "model", "data", None)),
                )
            else:
                kw = dict(
                    idx_rw=self._put(idx_rw, P(*g, None, "data")),
                    wt_rw=self._put(wt_rw, P(*g, None, "data")),
                )
        if self.num_cw:
            kw.update(
                idx_cw=self._put(
                    np.take(idx, self.cw_ids, axis=tax), P(*g, None, "data")
                ),
                wt_cw=self._put(
                    np.take(wt, self.cw_ids, axis=tax), P(*g, None, "data")
                ),
            )
        # shard-major table order so P("model") slices line up with ownership
        idx, wt = self._pad_reorder_sparse(idx, wt, num_t, axis=tax)
        return Batch(
            dense=self._put(batch.dense, P(*g, ("data", "model"))),
            idx=self._put(idx, P(*g, "model", "data")),
            wt=self._put(wt, P(*g, "model", "data")),
            labels=self._put(batch.labels, P(*g, ("data", "model"))),
            **kw,
        )

    # ------------------------------------------------------------- kernels

    def _rw_local_hits(self, params, idx_rw, wt_rw):
        """This model shard's view of the row-wise tables' hits: local row
        ids into the shard block (row 0 for foreign hits) and weights masked
        to the shard's row range — so partial pooling / masked scatter are
        exact under the later psum_scatter / psum."""
        s = jax.lax.axis_index("model")
        sl = jnp.asarray(self.rw_slice)[:, None, None]
        off = jnp.asarray(self.rw_off)[:, None, None]
        lo = s * sl
        mask = (idx_rw >= lo) & (idx_rw < lo + sl)
        loc = jnp.where(mask, idx_rw - lo + off, 0)
        wt_eff = wt_rw * mask.astype(wt_rw.dtype)
        if "v_w" in params:
            vw = jnp.take(self.model.pooling_weights(params), loc, axis=0)
            wt_eff = wt_eff * vw
        return loc, wt_eff

    def _rw_bucket_pooled(self, params, idxb_l, wtb_l):
        """Partial pools of the OWNED row-wise hits from the bucketed layout
        (parallel/rw_bucket.py): idxb_l/wtb_l are this shard's [b, C_total]
        slice of pre-localized rows; per-table static column segments.
        Returns [T_rw, b, d] partials — same contract as the masked partials
        (pad slots carry weight 0 on row 0), summed with the spill partials
        before the psum_scatter."""
        emb_l = params["emb"]["stacked"]
        outs = []
        c0 = 0
        for i in range(self.num_rw):
            c = self.rw_bucket_caps[i]
            seg = idxb_l[:, c0 : c0 + c]  # [b, C_t] local rows
            w = wtb_l[:, c0 : c0 + c]
            if "v_w" in params:
                w = w * jnp.take(
                    self.model.pooling_weights(params), seg, axis=0
                )
            rows = jnp.take(emb_l, seg, axis=0)  # [b, C_t, d]
            outs.append(jnp.einsum("bcd,bc->bd", rows, w.astype(rows.dtype)))
            c0 += c
        return jnp.stack(outs)  # [T_rw, b, d]

    def _cw_pooled(self, params, idx_cw_l, wt_cw_l):
        """Column-wise tables' partial pools: every shard gathers ALL hits
        from its full-row / d-slice block — [T_cw, b_d, d/m], no masking."""
        emb_cw = params["emb"]["cw_stacked"]  # [cw_rows, d/m] local columns
        flat = idx_cw_l + jnp.asarray(self.cw_off)[:, None, None]
        rows = jnp.take(emb_cw, flat, axis=0)  # [T_cw, b_d, H, d/m]
        return jnp.einsum("tbhd,tbh->tbd", rows, wt_cw_l.astype(rows.dtype))

    def _forward_local(self, params, dense_l, idx_l, wt_l, local_off,
                       idx_rw_l=None, wt_rw_l=None, idx_cw_l=None,
                       wt_cw_l=None, idx_rwb_l=None, wt_rwb_l=None):
        """Device-local forward: local-table lookup -> a2a -> interaction ->
        top MLP. Returns probabilities for this device's batch slice."""
        emb_l = params["emb"]["stacked"]  # [shard_rows, d] local rows
        flat_idx = idx_l + local_off[:, None, None]
        if "v_w" in params:
            vw = jnp.take(self.model.pooling_weights(params), flat_idx, axis=0)
            wt_eff = wt_l * vw
        else:
            wt_eff = wt_l
        rows = jnp.take(emb_l, flat_idx, axis=0)  # [t_local, b_d, H, d]
        pooled = jnp.einsum(
            "tbhd,tbh->tbd", rows, wt_eff.astype(rows.dtype)
        )  # [t_local, b_d, d]
        pooled_rw = None
        if idx_rw_l is not None:
            loc, wt_rw_eff = self._rw_local_hits(params, idx_rw_l, wt_rw_l)
            rows_rw = jnp.take(emb_l, loc, axis=0)
            pooled_rw = jnp.einsum(
                "tbhd,tbh->tbd", rows_rw, wt_rw_eff.astype(rows_rw.dtype)
            )  # [T_rw, b_d, d] PARTIAL sums (this shard's rows only)
            if idx_rwb_l is not None:  # bucketed: masked part is the spill
                pooled_rw = pooled_rw + self._rw_bucket_pooled(
                    params, idx_rwb_l, wt_rwb_l
                )
        if idx_cw_l is not None:
            pooled = (pooled, pooled_rw,
                      self._cw_pooled(params, idx_cw_l, wt_cw_l))
        elif pooled_rw is not None:
            pooled = (pooled, pooled_rw)
        return self._tail_from_pooled(params, dense_l, pooled)

    def _tail_from_pooled(self, params, dense_l, pooled):
        """The post-lookup tail: butterfly a2a (+ psum_scatter of the
        row-wise partial pools, + feature-assembling a2a of the column-wise
        partials) -> table-order restore -> interaction -> top MLP.
        `pooled` is [t_local, b_d, d], a (table-wise, row-wise-partial)
        pair, or a (table-wise, row-wise-or-None, column-wise) triple."""
        cfg = self.cfg
        pooled_rw = pooled_cw = None
        if isinstance(pooled, tuple):
            if len(pooled) == 2:
                pooled, pooled_rw = pooled
            else:
                pooled, pooled_rw, pooled_cw = pooled
        # ---- the butterfly: split batch over model ranks, gather all tables
        ly = jax.lax.all_to_all(
            pooled, "model", split_axis=1, concat_axis=0, tiled=True
        )  # [t_pad, b_dm, d] shard-major table order
        if pooled_rw is not None:
            # row-wise tables: partial sums reduce while the batch splits —
            # one reduce_scatter rides ICI alongside the a2a
            ly_rw = jax.lax.psum_scatter(
                pooled_rw, "model", scatter_dimension=1, tiled=True
            )  # [T_rw, b_dm, d]
            ly = jnp.concatenate([ly, ly_rw], axis=0)
        if pooled_cw is not None:
            # column-wise tables: the batch splits while the feature dim
            # assembles — the a2a ships d/m-wide partials (1/m the payload
            # of a table-wise slot)
            ly_cw = jax.lax.all_to_all(
                pooled_cw, "model", split_axis=1, concat_axis=2, tiled=True
            )  # [T_cw, b_dm, d]
            ly = jnp.concatenate([ly, ly_cw], axis=0)
        ly = jnp.take(ly, jnp.asarray(self.merge_perm), axis=0)  # [T, b_dm, d]
        ly = jnp.transpose(ly, (1, 0, 2))  # [b_dm, T, d]
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        x = apply_mlp(params["bot"], dense_l.astype(dtype), cfg.sigmoid_bot)
        z = self.model.interact(params, x, ly.astype(x.dtype))
        logits = apply_mlp(params["top"][:-1], z, sigmoid_layer=-1)
        last = params["top"][-1]
        logits = (
            jnp.dot(
                logits, last["w"].astype(logits.dtype),
                preferred_element_type=jnp.float32,
            )
            + last["b"]
        ).astype(jnp.float32)
        p = jax.nn.sigmoid(logits)
        if 0.0 < cfg.loss_threshold < 1.0:
            p = jnp.clip(p, cfg.loss_threshold, 1.0 - cfg.loss_threshold)
        return p, logits

    def _dense_half(self, optimizer, params, opt_state,
                    emb_l, pooled, dense_l, labels_l, lr, eps=None):
        """The dense tail shared by the fused and streamed butterfly steps:
        value_and_grad over (dense params, pooled), global-mean loss with
        psum, dense optimizer update. Returns (loss, probs, dpooled,
        new_dense, new_dense_state)."""
        cfg = self.cfg
        dense_params = {k: v for k, v in params.items() if k != "emb"}
        # global REAL-row count (bin-loader pad rows carry label -1 and
        # must not contribute to the loss or its gradients); equals
        # global_batch for full batches
        denom = jax.lax.psum(valid_count(labels_l), ("data", "model"))

        def rest(dp, pooled_in):
            probs, logits = self._tail_from_pooled(
                {**dp, "emb": {"stacked": emb_l}}, dense_l, pooled_in
            )
            per = per_example_loss(cfg, probs, labels_l, logits)
            return masked_mean(per, labels_l, denom=denom), probs

        (loss_local, probs), (dgrads, dpooled) = jax.value_and_grad(
            rest, argnums=(0, 1), has_aux=True
        )(dense_params, pooled)
        loss = jax.lax.psum(loss_local, ("data", "model"))
        dgrads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, ("data", "model")), dgrads
        )
        if optimizer == "sgd":
            dense_state = {"step": opt_state["step"]}
        else:
            dense_state = {
                "step": opt_state["step"],
                "accum": {
                    k: v for k, v in opt_state["accum"].items() if k != "emb"
                },
            }
        from dlrm_tpu.optim.optimizers import ADAGRAD_EPS

        new_dense, new_dense_state = apply_updates(
            optimizer, dense_params, dgrads, dense_state, lr,
            eps=ADAGRAD_EPS if eps is None else eps,
        )
        return loss, probs, dpooled, new_dense, new_dense_state

    def _cw_update(self, optimizer, opt_state, emb_cw, dp_all, idx_all,
                   wt_all, lr, eps_v):
        """Sparse update of the local column slice of the cw array: ALL hits
        update every shard (each owns distinct columns, so no masking).
        RWSAdagrad's per-row accumulator spans the FULL row width — the
        grad-square sum psums over "model" so every shard's (replicated)
        accumulator advances identically to a single-device run.
        Returns (new_emb_cw, new_accum_or_None)."""
        from dlrm_tpu.ops.sparse_update import (
            adagrad_from_coalesced,
            coalesce_hits,
            rowwise_adagrad_from_coalesced,
            sgd_from_coalesced,
        )

        # coalesce_hits sorts int (row, hit) pairs and gathers gradient rows
        # in already-sorted order — no [N, d/m] pre-sort materialization
        urows, G, valid = coalesce_hits(
            jnp.transpose(dp_all, (1, 0, 2)), idx_all, wt_all,
            jnp.asarray(self.cw_off), emb_cw.shape[0],
        )
        if optimizer == "sgd":
            return sgd_from_coalesced(emb_cw, urows, G, valid, lr), None
        acc = opt_state["accum"]["emb"]["cw_stacked"]
        if optimizer == "rwsadagrad":
            row_sq = (
                jax.lax.psum(jnp.sum(jnp.square(G), axis=1), "model")
                / self.cfg.embedding_dim
            )
            return rowwise_adagrad_from_coalesced(
                emb_cw, acc, urows, G, valid, lr, eps_v, row_sq=row_sq
            )
        return adagrad_from_coalesced(emb_cw, acc, urows, G, valid, lr, eps_v)

    def _fused_sparse_tail(
        self, optimizer, params, opt_state, new_dense, new_dense_state,
        dpooled, flat_idx, wt_l, dpooled_rw, idx_rw_l, wt_rw_l,
        dpooled_cw, idx_cw_l, wt_cw_l, lr, eps_v,
        idx_rwb_l=None, wt_rwb_l=None,
    ):
        """The coalesced sparse-update tail shared by the fused butterfly
        step and its grad-accum variant: all-gather each table's pooled
        cotangents/hits over "data" (every table replica sees the full
        batch), re-mask row-wise hits to their owning shard, one coalesced
        scatter update, then the column-wise update. Inputs are local
        [t, b_local, ...] arrays (the accum path pre-merges its micro-batch
        axis and pre-scales by 1/accum). Returns (new_params, new_state)."""
        from dlrm_tpu.ops.sparse_update import (
            apply_sparse_adagrad,
            apply_sparse_rowwise_adagrad,
            apply_sparse_sgd,
            per_hit_gradients,
        )

        emb_l = params["emb"]["stacked"]
        has_rw = dpooled_rw is not None
        has_cw = dpooled_cw is not None
        # gather ALL data-groups' hits for my tables (replicas stay equal)
        dp_all = jax.lax.all_gather(
            dpooled, "data", axis=1, tiled=True
        )  # [t_local, B, d]
        idx_all = jax.lax.all_gather(flat_idx, "data", axis=1, tiled=True)
        wt_all = jax.lax.all_gather(wt_l, "data", axis=1, tiled=True)
        if has_rw:
            dp_rw_all = jax.lax.all_gather(
                dpooled_rw, "data", axis=1, tiled=True
            )  # [T_rw, B, d]
            idx_rw_all = jax.lax.all_gather(
                idx_rw_l, "data", axis=1, tiled=True
            )
            wt_rw_all = jax.lax.all_gather(
                wt_rw_l, "data", axis=1, tiled=True
            )
            # re-mask on the full batch: each hit updates exactly the
            # one shard owning its row (foreign hits get weight 0)
            loc_all, wt_rw_eff_all = self._rw_local_hits(
                params, idx_rw_all, wt_rw_all
            )
            # the rw hit width can differ from the table-wise H (under
            # bucketing idx_rw carries only the spill columns): pad the
            # narrower side with weight-0 row-0 hits before the table concat
            hw, sw = idx_all.shape[-1], loc_all.shape[-1]
            if sw < hw:
                pad = [(0, 0), (0, 0), (0, hw - sw)]
                loc_all = jnp.pad(loc_all, pad)
                wt_rw_eff_all = jnp.pad(wt_rw_eff_all, pad)
            elif hw < sw:
                pad = [(0, 0), (0, 0), (0, sw - hw)]
                idx_all = jnp.pad(idx_all, pad)
                wt_all = jnp.pad(wt_all, pad)
            dp_all = jnp.concatenate([dp_all, dp_rw_all], axis=0)
            idx_all = jnp.concatenate([idx_all, loc_all], axis=0)
            wt_all = jnp.concatenate([wt_all, wt_rw_eff_all], axis=0)
        rows, g = per_hit_gradients(
            jnp.transpose(dp_all, (1, 0, 2)), idx_all, wt_all,
            jnp.zeros((idx_all.shape[0],), jnp.int32),
        )
        if idx_rwb_l is not None:
            # bucketed hits: per-hit grads straight from the pooled rw
            # cotangent (rows are already local; pad slots carry weight 0
            # so they coalesce to zero-gradient no-ops on row 0)
            idxb_all = jax.lax.all_gather(
                idx_rwb_l, "data", axis=0, tiled=True
            )  # [B, C_total]
            wtb_all = jax.lax.all_gather(wt_rwb_l, "data", axis=0, tiled=True)
            d = dp_rw_all.shape[-1]
            extra_r, extra_g = [rows], [g]
            c0 = 0
            for i in range(self.num_rw):
                c = self.rw_bucket_caps[i]
                extra_r.append(idxb_all[:, c0 : c0 + c].reshape(-1))
                extra_g.append(
                    (
                        dp_rw_all[i][:, None, :].astype(jnp.float32)
                        * wtb_all[:, c0 : c0 + c, None]
                    ).reshape(-1, d)
                )
                c0 += c
            rows = jnp.concatenate(extra_r)
            g = jnp.concatenate(extra_g)
        if optimizer == "sgd":
            new_emb = apply_sparse_sgd(emb_l, rows, g, lr)
            new_state = {"step": new_dense_state["step"]}
        else:
            acc_l = opt_state["accum"]["emb"]["stacked"]
            fn = (
                apply_sparse_rowwise_adagrad
                if optimizer == "rwsadagrad"
                else apply_sparse_adagrad
            )
            new_emb, new_acc = fn(emb_l, acc_l, rows, g, lr, eps=eps_v)
            new_state = {
                "step": new_dense_state["step"],
                "accum": {
                    **new_dense_state["accum"],
                    "emb": {"stacked": new_acc},
                },
            }
        new_params = dict(new_dense)
        new_params["emb"] = {"stacked": new_emb}
        if has_cw:
            dp_cw_all = jax.lax.all_gather(
                dpooled_cw, "data", axis=1, tiled=True
            )  # [T_cw, B, d/m]
            idx_cw_all = jax.lax.all_gather(
                idx_cw_l, "data", axis=1, tiled=True
            )
            wt_cw_all = jax.lax.all_gather(
                wt_cw_l, "data", axis=1, tiled=True
            )
            new_cw, new_cw_acc = self._cw_update(
                optimizer, opt_state, params["emb"]["cw_stacked"],
                dp_cw_all, idx_cw_all, wt_cw_all, lr, eps_v,
            )
            new_params["emb"]["cw_stacked"] = new_cw
            if new_cw_acc is not None:
                new_state["accum"]["emb"]["cw_stacked"] = new_cw_acc
        return new_params, new_state

    def _pad_reorder_sparse(self, idx, wt, num_t, axis: int = 0):
        """Pad idx/wt with dummy tables (on `axis`) and reorder shard-major.
        Row-wise tables (never referenced by shard_major_order) drop out."""
        pad_t = self.num_ids - num_t
        if pad_t:
            shape = list(idx.shape)
            shape[axis] = pad_t
            idx = np.concatenate(
                [idx, np.zeros(shape, idx.dtype)], axis=axis
            )
            wt = np.concatenate([wt, np.zeros(shape, wt.dtype)], axis=axis)
        return (
            np.take(idx, self.shard_major_order, axis=axis),
            np.take(wt, self.shard_major_order, axis=axis),
        )

    def make_train_step(
        self, optimizer: str, global_batch: int, params, opt_state,
        eps: float = None,
    ):
        """params/opt_state are templates used only to build the shard_map
        spec trees (structure, not values).

        When the config allows it (plain tables, no learned pooling, sgd/
        adagrad/rwsadagrad) the table update is the fused sparse path: the
        pooled-activation cotangent [t_local, b_d, d] is all-gathered over
        "data" (every table replica sees all hits for its tables) and
        scattered into the local shard — O(touched rows) traffic, exact
        coalesced semantics, like the single-device fused step."""
        cfg = self.cfg
        mesh = self.mesh
        has_rw = self.num_rw > 0
        has_cw = self.num_cw > 0
        fuse = (
            "v_w" not in params
            and optimizer in ("sgd", "adagrad", "rwsadagrad")
        )
        if has_cw and not fuse:
            raise NotImplementedError(
                "column-wise sharded tables require the fused sparse path "
                "(plain tables without learned pooling; sgd/adagrad/"
                "rwsadagrad)"
            )
        from dlrm_tpu.optim.optimizers import ADAGRAD_EPS

        eps_v = ADAGRAD_EPS if eps is None else float(eps)

        bucket = getattr(self, "rw_bucket", False)

        def device_fn(params, opt_state, dense_l, idx_l, wt_l, labels_l,
                      off_l, lr, *rw):
            idx_rw_l = wt_rw_l = idx_cw_l = wt_cw_l = None
            idx_rwb_l = wt_rwb_l = None
            if has_rw:
                idx_rw_l, wt_rw_l = rw[0], rw[1]
                if bucket:
                    # [1, b_d, C_total] local block of the model-sharded axis
                    idx_rwb_l = rw[2][0]
                    wt_rwb_l = rw[3][0]
            if has_cw:
                idx_cw_l, wt_cw_l = rw[-2], rw[-1]
            if not fuse:
                denom = jax.lax.psum(
                    valid_count(labels_l), ("data", "model")
                )

                def loss_fn(p):
                    probs, logits = self._forward_local(
                        p, dense_l, idx_l, wt_l, off_l, idx_rw_l, wt_rw_l,
                        idx_rwb_l=idx_rwb_l, wt_rwb_l=wt_rwb_l,
                    )
                    per = per_example_loss(cfg, probs, labels_l, logits)
                    return masked_mean(per, labels_l, denom=denom), probs

                (loss_local, probs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                loss = jax.lax.psum(loss_local, ("data", "model"))

                def reduce_grad(path, g):
                    keys = [
                        getattr(p, "key", getattr(p, "idx", None)) for p in path
                    ]
                    if keys and keys[0] in ("emb", "v_w"):
                        return jax.lax.psum(g, "data")
                    return jax.lax.psum(g, ("data", "model"))

                grads = jax.tree_util.tree_map_with_path(reduce_grad, grads)
                from dlrm_tpu.optim.optimizers import ADAGRAD_EPS

                new_params, new_state = apply_updates(
                    optimizer, params, grads, opt_state, lr,
                    eps=ADAGRAD_EPS if eps is None else eps,
                )
                return new_params, new_state, loss, probs

            # ------------------------- fused sparse path
            emb_l = params["emb"]["stacked"]  # local shard rows
            flat_idx = idx_l + off_l[:, None, None]  # [t_local, b_d, H]
            rows_v = jnp.take(emb_l, flat_idx, axis=0)
            pooled = jnp.einsum(
                "tbhd,tbh->tbd", rows_v, wt_l.astype(rows_v.dtype)
            )
            if has_rw:
                loc_rw, wt_rw_eff = self._rw_local_hits(
                    params, idx_rw_l, wt_rw_l
                )
                rows_rw = jnp.take(emb_l, loc_rw, axis=0)
                pooled_rw = jnp.einsum(
                    "tbhd,tbh->tbd", rows_rw, wt_rw_eff.astype(rows_rw.dtype)
                )
                if bucket:  # masked part above is only the spill
                    pooled_rw = pooled_rw + self._rw_bucket_pooled(
                        params, idx_rwb_l, wt_rwb_l
                    )
                pooled = (pooled, pooled_rw)
            if has_cw:
                tw_rw = pooled if has_rw else (pooled, None)
                pooled = (*tw_rw, self._cw_pooled(params, idx_cw_l, wt_cw_l))
            loss, probs, dpooled, new_dense, new_dense_state = (
                self._dense_half(
                    optimizer, params, opt_state, emb_l,
                    pooled, dense_l, labels_l, lr, eps=eps,
                )
            )
            dpooled_cw = None
            if has_cw:
                # AD through the feature-assembling a2a returns each shard
                # its OWN column slice's cotangent for its b_d batch
                *dpooled, dpooled_cw = dpooled
                dpooled = dpooled[0] if not has_rw else tuple(dpooled)
            dpooled_rw = None
            if has_rw:
                # AD through psum_scatter all-gathers the scattered
                # cotangent over "model": every shard sees the FULL pooled
                # grad of the row-wise tables for its data slice
                dpooled, dpooled_rw = dpooled
            new_params, new_state = self._fused_sparse_tail(
                optimizer, params, opt_state, new_dense, new_dense_state,
                dpooled, flat_idx, wt_l, dpooled_rw, idx_rw_l, wt_rw_l,
                dpooled_cw, idx_cw_l, wt_cw_l, lr, eps_v,
                idx_rwb_l=idx_rwb_l, wt_rwb_l=wt_rwb_l,
            )
            return new_params, new_state, loss, probs

        pspec = _tree_specs(params)
        ospec = _tree_specs(opt_state)
        in_specs = [
            pspec,
            ospec,
            P(("data", "model")),
            P("model", "data"),
            P("model", "data"),
            P(("data", "model")),
            P("model"),
            P(),
        ]
        if has_rw:
            in_specs += [P(None, "data"), P(None, "data")]
            if bucket:
                in_specs += [
                    P("model", "data"), P("model", "data"),
                ]
        if has_cw:
            in_specs += [P(None, "data"), P(None, "data")]
        step = shard_map(
            device_fn,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(pspec, ospec, P(), P(("data", "model"))),
            check_vma=False,
        )
        local_off = self._put(self.local_offsets_shard_major, P("model"))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch: Batch, lr):
            rw = (batch.idx_rw, batch.wt_rw) if has_rw else ()
            if has_rw and bucket:
                rw = rw + (batch.idx_rwb, batch.wt_rwb)
            if has_cw:
                rw = rw + (batch.idx_cw, batch.wt_cw)
            return step(
                params, opt_state, batch.dense, batch.idx, batch.wt,
                batch.labels, local_off, jnp.float32(lr), *rw,
            )

        return train_step

    def make_grad_accum_train_step(
        self, optimizer: str, global_batch: int, accum_iters: int,
        params, opt_state, eps: float = None,
    ):
        """Gradient accumulation COMPOSED with the sharded butterfly step
        (--sharded --mlperf-grad-accum-iter N; reference composes these at
        dlrm_s_pytorch.py:1017, 1604-1621 under distributed_forward).

        Micro-batches arrive stacked on a leading axis (shard_batch grouped
        layout). Inside the shard_map a lax.scan runs the forward + dense
        backward per micro-batch, accumulating dense grads and collecting the
        pooled-activation cotangents; then ONE coalesced sparse update
        applies all micro-batches' hits — mirroring
        fused_step.make_fused_grad_accum_train_step so sharded == single-
        device numerics (same mean-over-accum scaling, accumulator advances
        once per optimizer step). `global_batch` is the PER-MICRO-BATCH
        global size."""
        cfg = self.cfg
        mesh = self.mesh
        has_rw = self.num_rw > 0
        has_cw = self.num_cw > 0
        if "v_w" in params or optimizer not in (
            "sgd", "adagrad", "rwsadagrad",
        ):
            raise NotImplementedError(
                "sharded grad accumulation requires the fused sparse path "
                "(plain tables without learned pooling; sgd/adagrad/"
                "rwsadagrad)"
            )

        from dlrm_tpu.optim.optimizers import ADAGRAD_EPS

        eps_v = ADAGRAD_EPS if eps is None else float(eps)

        bucket = getattr(self, "rw_bucket", False)

        def device_fn(params, opt_state, dense_k, idx_k, wt_k, labels_k,
                      off_l, lr, *rw):
            idx_rw_k = wt_rw_k = idx_cw_k = wt_cw_k = None
            idx_rwb_k = wt_rwb_k = None
            if has_rw:
                idx_rw_k, wt_rw_k = rw[0], rw[1]
                if bucket:
                    # [k, 1, b, C_total] local block -> drop the model axis
                    idx_rwb_k = rw[2][:, 0]
                    wt_rwb_k = rw[3][:, 0]
            if has_cw:
                idx_cw_k, wt_cw_k = rw[-2], rw[-1]
            emb_l = params["emb"]["stacked"]
            dense_params = {k: v for k, v in params.items() if k != "emb"}

            def one(dgsum, micro):
                dense_l, idx_l, wt_l, labels_l = micro[:4]
                flat_idx = idx_l + off_l[:, None, None]
                rows_v = jnp.take(emb_l, flat_idx, axis=0)
                pooled = jnp.einsum(
                    "tbhd,tbh->tbd", rows_v, wt_l.astype(rows_v.dtype)
                )
                if has_rw:
                    idx_rw_l, wt_rw_l = micro[4], micro[5]
                    loc_rw, wt_rw_eff = self._rw_local_hits(
                        params, idx_rw_l, wt_rw_l
                    )
                    rows_rw = jnp.take(emb_l, loc_rw, axis=0)
                    pooled_rw = jnp.einsum(
                        "tbhd,tbh->tbd", rows_rw,
                        wt_rw_eff.astype(rows_rw.dtype),
                    )
                    if bucket:  # masked part above is only the spill
                        pooled_rw = pooled_rw + self._rw_bucket_pooled(
                            params, micro[6], micro[7]
                        )
                    pooled = (pooled, pooled_rw)
                if has_cw:
                    idx_cw_l, wt_cw_l = micro[-2], micro[-1]
                    tw_rw = pooled if has_rw else (pooled, None)
                    pooled = (
                        *tw_rw, self._cw_pooled(params, idx_cw_l, wt_cw_l)
                    )

                denom = jax.lax.psum(
                    valid_count(labels_l), ("data", "model")
                )

                def rest(dp, pooled_in):
                    probs, logits = self._tail_from_pooled(
                        {**dp, "emb": {"stacked": emb_l}}, dense_l, pooled_in
                    )
                    per = per_example_loss(cfg, probs, labels_l, logits)
                    return masked_mean(per, labels_l, denom=denom), probs

                (loss_local, _), (dgrads, dpooled) = jax.value_and_grad(
                    rest, argnums=(0, 1), has_aux=True
                )(dense_params, pooled)
                dgsum = jax.tree_util.tree_map(jnp.add, dgsum, dgrads)
                return dgsum, (loss_local, dpooled, flat_idx)

            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, jnp.float32), dense_params
            )
            xs = (dense_k, idx_k, wt_k, labels_k)
            if has_rw:
                xs = xs + (idx_rw_k, wt_rw_k)
                if bucket:
                    xs = xs + (idx_rwb_k, wt_rwb_k)
            if has_cw:
                xs = xs + (idx_cw_k, wt_cw_k)
            dgsum, (loss_locals, dpooleds, flat_idxs) = jax.lax.scan(
                one, zero, xs
            )
            dpooleds_cw = None
            if has_cw:
                *dpooleds, dpooleds_cw = dpooleds
                dpooleds = dpooleds[0] if not has_rw else tuple(dpooleds)
            loss = jax.lax.psum(
                jnp.mean(loss_locals), ("data", "model")
            )
            dgrads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, ("data", "model")) / accum_iters,
                dgsum,
            )
            if optimizer == "sgd":
                dense_state = {"step": opt_state["step"]}
            else:
                dense_state = {
                    "step": opt_state["step"],
                    "accum": {
                        k: v
                        for k, v in opt_state["accum"].items()
                        if k != "emb"
                    },
                }
            new_dense, new_dense_state = apply_updates(
                optimizer, dense_params, dgrads, dense_state, lr, eps=eps_v
            )

            # ---- one coalesced sparse update over ALL micro-batches' hits:
            # merge the group axis into the batch axis, scale cotangents by
            # 1/accum (mean over micro-batches), then the same all-gather +
            # masked-scatter tail as the non-accum fused step
            def merge_k(x):  # [k, t, b, ...] -> [t, k*b, ...]
                x = jnp.moveaxis(x, 0, 1)
                return x.reshape(x.shape[0], -1, *x.shape[3:])

            dpooleds_rw = None
            if has_rw:
                dpooleds, dpooleds_rw = dpooleds
            new_params, new_state = self._fused_sparse_tail(
                optimizer, params, opt_state, new_dense, new_dense_state,
                merge_k(dpooleds) / accum_iters,
                merge_k(flat_idxs),
                merge_k(wt_k),
                None if not has_rw else merge_k(dpooleds_rw) / accum_iters,
                None if not has_rw else merge_k(idx_rw_k),
                None if not has_rw else merge_k(wt_rw_k),
                None if not has_cw else merge_k(dpooleds_cw) / accum_iters,
                None if not has_cw else merge_k(idx_cw_k),
                None if not has_cw else merge_k(wt_cw_k),
                lr, eps_v,
                # bucketed arrays are [k, b, C]: batch axis leads, so the
                # group merge is a plain reshape
                idx_rwb_l=None if not bucket else idx_rwb_k.reshape(
                    -1, idx_rwb_k.shape[-1]
                ),
                wt_rwb_l=None if not bucket else wt_rwb_k.reshape(
                    -1, wt_rwb_k.shape[-1]
                ),
            )
            return new_params, new_state, loss, None

        pspec = _tree_specs(params)
        ospec = _tree_specs(opt_state)
        in_specs = [
            pspec,
            ospec,
            P(None, ("data", "model")),
            P(None, "model", "data"),
            P(None, "model", "data"),
            P(None, ("data", "model")),
            P("model"),
            P(),
        ]
        if has_rw:
            in_specs += [P(None, None, "data"), P(None, None, "data")]
            if bucket:
                in_specs += [
                    P(None, "model", "data"), P(None, "model", "data"),
                ]
        if has_cw:
            in_specs += [P(None, None, "data"), P(None, None, "data")]
        step = shard_map(
            device_fn,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(pspec, ospec, P(), None),
            check_vma=False,
        )
        local_off = self._put(self.local_offsets_shard_major, P("model"))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch: Batch, lr):
            rw = (batch.idx_rw, batch.wt_rw) if has_rw else ()
            if has_rw and bucket:
                rw = rw + (batch.idx_rwb, batch.wt_rwb)
            if has_cw:
                rw = rw + (batch.idx_cw, batch.wt_cw)
            return step(
                params, opt_state, batch.dense, batch.idx, batch.wt,
                batch.labels, local_off, jnp.float32(lr), *rw,
            )

        return train_step

    def make_eval_step(self, params):
        mesh = self.mesh
        has_rw = self.num_rw > 0
        has_cw = self.num_cw > 0
        bucket = getattr(self, "rw_bucket", False)

        def device_fn(params, dense_l, idx_l, wt_l, off_l, *rw):
            idx_rw_l = wt_rw_l = idx_cw_l = wt_cw_l = None
            idx_rwb_l = wt_rwb_l = None
            if has_rw:
                idx_rw_l, wt_rw_l = rw[0], rw[1]
                if bucket:
                    idx_rwb_l, wt_rwb_l = rw[2][0], rw[3][0]
            if has_cw:
                idx_cw_l, wt_cw_l = rw[-2], rw[-1]
            return self._forward_local(
                params, dense_l, idx_l, wt_l, off_l, idx_rw_l, wt_rw_l,
                idx_cw_l, wt_cw_l, idx_rwb_l=idx_rwb_l, wt_rwb_l=wt_rwb_l,
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
                in_specs += [P("model", "data"), P("model", "data")]
        if has_cw:
            in_specs += [P(None, "data"), P(None, "data")]
        step = shard_map(
            device_fn,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=P(("data", "model")),
            check_vma=False,
        )
        local_off = self._put(self.local_offsets_shard_major, P("model"))

        @jax.jit
        def eval_step(params, batch: Batch):
            rw = (batch.idx_rw, batch.wt_rw) if has_rw else ()
            if has_rw and bucket:
                rw = rw + (batch.idx_rwb, batch.wt_rwb)
            if has_cw:
                rw = rw + (batch.idx_cw, batch.wt_cw)
            return step(params, batch.dense, batch.idx, batch.wt, local_off,
                        *rw)

        return eval_step


def _spec_for_path(path, leaf) -> P:
    """Model-axis row sharding for embedding-table state (params AND their
    optimizer accumulators); column-wise tables shard on the FEATURE dim
    (their 1-D rwsadagrad accumulator replicates — the update psums the
    row grad-square so every shard advances it identically); everything
    else replicated."""
    from dlrm_tpu.optim.optimizers import path_keys

    keys = path_keys(path)
    if "cw_stacked" in keys:
        return P(None, "model") if getattr(leaf, "ndim", 0) >= 2 else P()
    if ("emb" in keys or "v_w" in keys) and getattr(leaf, "ndim", 0) >= 1:
        return P("model")
    return P()


def _tree_specs(tree):
    return jax.tree_util.tree_map_with_path(_spec_for_path, tree)
