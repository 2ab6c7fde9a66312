"""Host-side owner bucketing for row-wise-striped embedding tables.

The masked row-wise lookup (butterfly.py::_rw_local_hits) is simple and
static-shaped, but it makes EVERY model shard gather EVERY striped-table hit
(foreign hits fetch row 0 at weight 0) — per-shard gather work does not
shrink with the model-axis size M. At the flagship MLPerf-v2 shape the 5
striped 40M-row tables carry 149 of the 214 hits/sample (incl. the hot=100
and hot=27 tables), so on an 8-shard mesh the masked plan costs each chip
~6x the ideal weak-scaling gather load, and random row gathers are the
measured step bottleneck (~12 ns/row issue-rate bound,
bench_scripts/PERF_NOTES.md).

This module restores near-ideal scaling on the HOST side, where reordering
is free (the host already builds U-layouts per batch): each (table, sample)
bag's hits are bucketed by their owning shard — ownership is the contiguous
row-range striping butterfly.py already uses — into a dense per-shard layout

    idx_b [M, B, C_total] int32   LOCAL stacked-row ids (pre-localized)
    wt_b  [M, B, C_total] float32 hit weights (0 = pad slot -> row 0)

where C_total = sum of per-table caps C_t and table t owns the static column
range [c0_t, c0_t + C_t). Each shard receives ONLY its [B, C_total] slice
(the leading axis shards over "model"), gathers only rows it owns, and
partial-pools exactly as the masked path does — the psum_scatter exchange
and the coalesced update are unchanged.

Per-(table, sample, shard) hit counts are binomial(h_t, 1/M), so a static
cap C_t ~= h_t/M + sigma*sqrt(h_t/M(1-1/M)) covers almost all hits; the rare
overflow SPILLS into a small [T_rw, B, S] array of GLOBAL ids that rides the
existing masked path (which is exactly a spill handler: every shard masks to
its range at weight 0 cost S instead of H). The builder raises if S
overflows — caps are a plan-time choice, not a silent truncation.

Exactness: every real hit lands in exactly one of (bucket of its owner,
spill); pad slots carry weight 0 (the established convention — weight-0
hits coalesce to zero-gradient rows and are no-ops for sgd/adagrad/
rwsadagrad, see ops/sparse_update.py).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np


def default_bucket_caps(
    hot_sizes: Sequence[int], msize: int, sigma: float = 3.0
) -> Tuple[int, ...]:
    """Per-table bucket caps for binomial(h, 1/M) owner counts: mean +
    sigma standard deviations + 1, clamped to [1, h]. A cap of h means
    bucketing that table saves nothing (the masked path already costs h) —
    callers may route such tables through the spill-free masked path
    instead, but keeping them bucketed is still correct."""
    caps = []
    p = 1.0 / msize
    for h in hot_sizes:
        mu = h * p
        sd = math.sqrt(h * p * (1.0 - p))
        caps.append(int(min(h, max(1, math.ceil(mu + sigma * sd + 1)))))
    return tuple(caps)


def bucket_rw_hits(
    idx: np.ndarray,  # [T_rw, B, H] GLOBAL row ids
    wt: Optional[np.ndarray],  # [T_rw, B, H] or None (all-ones)
    caps: Sequence[int],  # [T_rw] per-table bucket width C_t
    slice_len: Sequence[int],  # [T_rw] rows per shard slice
    local_off: Sequence[int],  # [T_rw] table start inside the shard stack
    msize: int,
    spill: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (idx_b [M, B, C_total] local rows, wt_b, spill_idx
    [T_rw, B, spill] global rows, spill_wt). Raises ValueError when a
    (table, sample) pair overflows the spill width."""
    t_rw, b, h = idx.shape
    caps = [int(c) for c in caps]
    if len(caps) != t_rw:
        raise ValueError(f"{len(caps)} caps for {t_rw} row-wise tables")
    c_total = int(sum(caps))
    idx_b = np.zeros((msize, b, c_total), np.int32)
    wt_b = np.zeros((msize, b, c_total), np.float32)
    sp_idx = np.zeros((t_rw, b, spill), np.int32)
    sp_wt = np.zeros((t_rw, b, spill), np.float32)
    ar = np.broadcast_to(np.arange(h), (b, h))
    c0 = 0
    for t in range(t_rw):
        sl = int(slice_len[t])
        off = int(local_off[t])
        ids = np.asarray(idx[t])
        w = (
            np.ones((b, h), np.float32)
            if wt is None
            else np.asarray(wt[t], np.float32)
        )
        keep = w != 0
        owner = np.where(keep, ids // sl, msize)  # dropped pads -> group M
        order = np.argsort(owner, axis=1, kind="stable")
        own_s = np.take_along_axis(owner, order, 1)
        ids_s = np.take_along_axis(ids, order, 1)
        w_s = np.take_along_axis(w, order, 1)
        newgrp = np.ones((b, h), bool)
        if h > 1:
            newgrp[:, 1:] = own_s[:, 1:] != own_s[:, :-1]
        grp_start = np.maximum.accumulate(np.where(newgrp, ar, 0), axis=1)
        pos = ar - grp_start  # index within the (sample, owner) group
        valid = own_s < msize
        in_b = valid & (pos < caps[t])
        bi = np.nonzero(in_b)[0]
        m = own_s[in_b]
        idx_b[m, bi, c0 + pos[in_b]] = (ids_s[in_b] - m * sl + off).astype(
            np.int32
        )
        wt_b[m, bi, c0 + pos[in_b]] = w_s[in_b]
        sp_mask = valid & (pos >= caps[t])
        if sp_mask.any():
            scnt = np.cumsum(sp_mask, axis=1) - 1
            worst = int(scnt[sp_mask].max()) + 1
            if worst > spill:
                raise ValueError(
                    f"row-wise bucket overflow: table {t} needs {worst} "
                    f"spill slots (spill={spill}, cap={caps[t]}, "
                    f"hot={h}, shards={msize}) — raise the cap or spill "
                    "width in the plan"
                )
            sbi = np.nonzero(sp_mask)[0]
            sp_idx[t, sbi, scnt[sp_mask]] = ids_s[sp_mask].astype(np.int32)
            sp_wt[t, sbi, scnt[sp_mask]] = w_s[sp_mask]
        c0 += caps[t]
    return idx_b, wt_b, sp_idx, sp_wt


def default_shared_cap(
    hot_sizes: Sequence[int], msize: int, sigma: float = 6.0
) -> int:
    """Shared bucket cap for the TOTAL owned count per (bag, shard) across
    ALL striped tables: binomial(sum h_t, 1/M) mean + sigma sd. One shared
    segment pays the sigma padding ONCE instead of per table — at the
    flagship shape (152 striped hits/sample, M=8) the per-table caps sum
    to 51 columns where the shared cap is ~45 at 6 sigma and ~32 at 3 —
    and the forward gathers cap columns (PERF_NOTES r5 shard_slice_probe:
    the per-shard step is forward-gather bound)."""
    h = int(sum(hot_sizes))
    p = 1.0 / msize
    mu = h * p
    sd = math.sqrt(h * p * (1.0 - p))
    return int(min(h, max(1, math.ceil(mu + sigma * sd + 1))))


def bucket_rw_hits_shared(
    idx: np.ndarray,  # [T_rw, B, H] GLOBAL row ids
    wt: Optional[np.ndarray],  # [T_rw, B, H] or None (all-ones)
    cap: int,  # shared bucket width C (columns per shard per bag)
    slice_len: Sequence[int],  # [T_rw] rows per shard slice
    local_off: Sequence[int],  # [T_rw] table start inside the shard stack
    msize: int,
    spill: int,  # shared spill width S
) -> Tuple[np.ndarray, ...]:
    """Shared-segment variant of bucket_rw_hits: ALL striped tables' hits
    of a bag land in ONE [C] segment per owning shard, with an int32 table
    id per slot for the per-table pooling masks. Returns
    (idx_b [M, B, C] LOCAL stacked rows, wt_b, tid_b,
     sp_idx [B, S] GLOBAL rows, sp_wt, sp_tid). Raises on spill overflow."""
    t_rw, b, h = idx.shape
    ht = t_rw * h
    ids = np.ascontiguousarray(idx.transpose(1, 0, 2)).reshape(b, ht)
    w = (
        np.ones((b, ht), np.float32)
        if wt is None
        else np.ascontiguousarray(
            wt.transpose(1, 0, 2).astype(np.float32)
        ).reshape(b, ht)
    )
    tid_cols = np.repeat(np.arange(t_rw, dtype=np.int32), h)
    tid = np.broadcast_to(tid_cols, (b, ht))
    sl_all = np.asarray(slice_len, np.int64)[tid]  # [b, ht]
    off_all = np.asarray(local_off, np.int64)[tid]
    keep = w != 0
    owner = np.where(keep, ids // sl_all, msize)  # dropped pads -> group M
    order = np.argsort(owner, axis=1, kind="stable")
    own_s = np.take_along_axis(owner, order, 1)
    ids_s = np.take_along_axis(ids, order, 1)
    w_s = np.take_along_axis(w, order, 1)
    tid_s = np.take_along_axis(tid, order, 1)
    sl_s = np.take_along_axis(sl_all, order, 1)
    off_s = np.take_along_axis(off_all, order, 1)
    ar = np.broadcast_to(np.arange(ht), (b, ht))
    newgrp = np.ones((b, ht), bool)
    if ht > 1:
        newgrp[:, 1:] = own_s[:, 1:] != own_s[:, :-1]
    grp_start = np.maximum.accumulate(np.where(newgrp, ar, 0), axis=1)
    pos = ar - grp_start
    valid = own_s < msize

    idx_b = np.zeros((msize, b, cap), np.int32)
    wt_b = np.zeros((msize, b, cap), np.float32)
    tid_b = np.zeros((msize, b, cap), np.int32)
    sp_idx = np.zeros((b, spill), np.int32)
    sp_wt = np.zeros((b, spill), np.float32)
    sp_tid = np.zeros((b, spill), np.int32)

    in_b = valid & (pos < cap)
    bi = np.nonzero(in_b)[0]
    m = own_s[in_b]
    idx_b[m, bi, pos[in_b]] = (
        ids_s[in_b] - m * sl_s[in_b] + off_s[in_b]
    ).astype(np.int32)
    wt_b[m, bi, pos[in_b]] = w_s[in_b]
    tid_b[m, bi, pos[in_b]] = tid_s[in_b]
    sp_mask = valid & (pos >= cap)
    if sp_mask.any():
        scnt = np.cumsum(sp_mask, axis=1) - 1
        worst = int(scnt[sp_mask].max()) + 1
        if worst > spill:
            raise ValueError(
                f"shared row-wise bucket overflow: a bag needs {worst} "
                f"spill slots (spill={spill}, cap={cap}, shards={msize}) "
                "— raise the shared cap or spill width"
            )
        sbi = np.nonzero(sp_mask)[0]
        sp_idx[sbi, scnt[sp_mask]] = ids_s[sp_mask].astype(np.int32)
        sp_wt[sbi, scnt[sp_mask]] = w_s[sp_mask]
        sp_tid[sbi, scnt[sp_mask]] = tid_s[sp_mask]
    return idx_b, wt_b, tid_b, sp_idx, sp_wt, sp_tid
