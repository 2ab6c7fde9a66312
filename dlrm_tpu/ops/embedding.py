"""Embedding-bag ops: sum-pooled multi-hot lookups, TPU-native layout.

The reference's hot loop is one `nn.EmbeddingBag(mode="sum", sparse=True)` call per
table over ragged (indices, offsets) CSR inputs (dlrm_s_pytorch.py:407-462). On TPU we
use a *padded dense* layout instead — XLA requires static shapes, and a single large
gather over one stacked table array maps far better onto HBM bandwidth than 26 small
ragged ops:

    idx: int32[T, B, H]   padded multi-hot indices (H = max hot size, static)
    wt:  float32[T, B, H] per-index weights; 0.0 marks padding. Also carries
                          per-sample weights (weighted pooling) and 1/len for
                          mean pooling — one code path for all pooling modes.

All tables of equal width are stacked into one [sum(rows), dim] array; per-table row
offsets are static constants folded into the gather. The backward of jnp.take is an
XLA scatter-add, which on padded entries contributes exactly 0 (weight 0).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def embedding_bag(
    table: jax.Array,  # [n, d]
    idx: jax.Array,  # [B, H] int32
    wt: Optional[jax.Array] = None,  # [B, H] float32, 0 = padding
) -> jax.Array:  # [B, d]
    """Sum-pooled lookup on a single table (EmbeddingBag mode='sum' equivalent)."""
    rows = jnp.take(table, idx, axis=0)  # [B, H, d]
    if wt is None:
        return jnp.sum(rows, axis=1, dtype=jnp.float32).astype(rows.dtype)
    # broadcast-multiply + reduce (NOT einsum: XLA lowers the H-contraction
    # dot badly for low-precision inputs) with fp32 accumulation
    return jnp.sum(
        rows * wt[..., None].astype(rows.dtype), axis=1, dtype=jnp.float32
    ).astype(rows.dtype)


def stack_tables(tables: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Stack equal-width tables into one array; return (stacked, row_offsets)."""
    dims = {t.shape[1] for t in tables}
    if len(dims) != 1:
        raise ValueError(f"stack_tables requires equal widths, got {dims}")
    offsets = np.zeros(len(tables), dtype=np.int32)
    acc = 0
    for i, t in enumerate(tables):
        offsets[i] = acc
        acc += t.shape[0]
    return np.concatenate(tables, axis=0), offsets


def fused_embedding_bag(
    stacked: jax.Array,  # [sum_n, d]
    row_offsets: jax.Array,  # [T] int32 (static per model)
    idx: jax.Array,  # [T, B, H] int32 (per-table local indices)
    wt: Optional[jax.Array] = None,  # [T, B, H] float32
) -> jax.Array:  # [B, T, d]
    """Sum-pooled lookup over ALL tables in one gather.

    Equivalent to the reference's per-table apply_emb loop
    (dlrm_s_pytorch.py:407-462) but fused: local indices are shifted by the
    static per-table row offset and gathered from the stacked array at once.
    """
    flat_idx = idx + row_offsets[:, None, None]  # [T, B, H]
    rows = jnp.take(stacked, flat_idx, axis=0)  # [T, B, H, d]
    if wt is None:
        pooled = jnp.sum(rows, axis=2, dtype=jnp.float32).astype(rows.dtype)
    else:
        pooled = jnp.sum(
            rows * wt[..., None].astype(rows.dtype), axis=2,
            dtype=jnp.float32,
        ).astype(rows.dtype)
    return jnp.transpose(pooled, (1, 0, 2))  # [B, T, d]


def qr_embedding_bag(
    q_table: jax.Array,  # [ceil(n/c), d]
    r_table: jax.Array,  # [c, d]
    collisions: int,
    operation: str,
    idx: jax.Array,  # [B, H]
    wt: Optional[jax.Array] = None,  # [B, H]
) -> jax.Array:
    """Quotient-remainder compressed lookup (tricks/qr_embedding_bag.py:192-226).

    index -> (index // c) into the quotient table and (index % c) into the
    remainder table; the two pooled results are combined by mult/add/concat.
    The reference pools each bag first and then combines pooled vectors, which
    for 'mult' is NOT the same as combining per-index rows; we follow the
    reference's pooled-then-combine semantics exactly.
    """
    idx_q = idx // collisions
    idx_r = idx % collisions
    vq = embedding_bag(q_table, idx_q, wt)
    vr = embedding_bag(r_table, idx_r, wt)
    if operation == "mult":
        return vq * vr
    if operation == "add":
        return vq + vr
    if operation == "concat":
        return jnp.concatenate([vq, vr], axis=1)
    raise ValueError(f"qr operation {operation!r} not supported")


def offsets_to_padded(
    indices: np.ndarray,  # [nnz] flat indices of one table's batch (CSR values)
    offsets: np.ndarray,  # [B] bag start offsets (CSR indptr without the end)
    hot_size: int,
    per_sample_weights: Optional[np.ndarray] = None,  # [nnz]
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side conversion from the reference's ragged (indices, offsets) CSR
    format (dlrm_s_pytorch.py:407-414) to the padded (idx[B,H], wt[B,H]) layout.

    Bags longer than hot_size are truncated (the caller picks H = max bag len
    to avoid that); padding gets index 0 with weight 0.
    """
    indices = np.asarray(indices, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    batch = offsets.shape[0]
    ends = np.concatenate([offsets[1:], [indices.shape[0]]])
    idx = np.zeros((batch, hot_size), dtype=np.int32)
    wt = np.zeros((batch, hot_size), dtype=np.float32)
    for b in range(batch):
        lo, hi = offsets[b], ends[b]
        ln = min(hi - lo, hot_size)
        idx[b, :ln] = indices[lo : lo + ln]
        if per_sample_weights is None:
            wt[b, :ln] = 1.0
        else:
            wt[b, :ln] = per_sample_weights[lo : lo + ln]
    return idx, wt


def padded_to_offsets(
    idx: np.ndarray, wt: np.ndarray,
    lengths: Optional[np.ndarray] = None,  # [B] true bag lengths
) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse of offsets_to_padded.

    Without `lengths`, padding is inferred as wt == 0 — which also drops
    GENUINE zero per-sample weights (indistinguishable in this layout).
    Pass the true bag lengths to round-trip weighted bags faithfully."""
    batch = idx.shape[0]
    offsets = np.zeros(batch, dtype=np.int64)
    out = []
    acc = 0
    for b in range(batch):
        if lengths is not None:
            ln = int(lengths[b])
            keep = idx[b][:ln]
        else:
            keep = idx[b][wt[b] != 0.0]
        offsets[b] = acc
        out.extend(keep.tolist())
        acc += len(keep)
    return np.asarray(out, dtype=np.int64), offsets


def flat_hit_offsets(hot_sizes: Sequence[int], batch: int):
    """Static per-table start offsets into the flat per-hit layout
    (table-major blocks of batch*hot_sizes[t] hits each)."""
    offs, acc = [], 0
    for h in hot_sizes:
        offs.append(acc)
        acc += batch * int(h)
    return offs, acc


def grouped_embedding_bag(
    stacked: jax.Array,  # [sum_n, d]
    row_offsets: jax.Array,  # [T] int32
    idx: jax.Array,  # [T, B, Hmax] padded multi-hot OR [N] flat per-hit
    wt: Optional[jax.Array],  # same layout as idx, or None
    hot_sizes: Sequence[int],  # per-table real hot size (static)
    batch: Optional[int] = None,  # required for the flat layout
) -> jax.Array:  # [B, T, d]
    """Ragged-multi-hot fused lookup: tables grouped by hot size so each
    group gathers its REAL [Tg, B, Hg] hits instead of everyone paying the
    global max (the true MLPerf v2 config spans hot sizes 1..100 — padding
    all 26 tables to 100 would cost ~12x the hits). Equivalent of torchrec's
    ragged KJT lookup on a static-shape compiler: one gather per distinct
    hot size, all shapes static.

    idx may arrive FLAT ([sum_t B*h_t] per-hit, table-major — the layout
    HostBatch.to_device(flat_hots=...) ships): that drops the padded
    [T, B, Hmax] H2D/storage cost entirely (the real v2 shape pads 214
    hits/sample out to 26x100); the static slices+reshapes below are free
    in XLA."""
    flat = idx.ndim == 1
    if flat:
        if batch is None:
            raise ValueError("flat per-hit idx needs the static batch size")
        f_off, total = flat_hit_offsets(hot_sizes, batch)
        if idx.shape[0] != total:
            raise ValueError(
                f"flat idx has {idx.shape[0]} hits, layout expects {total}"
            )
    t = len(hot_sizes)
    groups: dict = {}
    for i, h in enumerate(hot_sizes):
        groups.setdefault(int(h), []).append(i)

    def take_group(tabs, h):
        """[Tg, B, h] idx/wt for one hot-size group, either layout."""
        if flat:
            g_idx = jnp.stack(
                [idx[f_off[i] : f_off[i] + batch * h].reshape(batch, h)
                 for i in tabs]
            )
            g_wt = (
                None
                if wt is None
                else jnp.stack(
                    [wt[f_off[i] : f_off[i] + batch * h].reshape(batch, h)
                     for i in tabs]
                )
            )
            return g_idx, g_wt
        if tabs == list(range(t)):  # whole-tensor group: slice, don't gather
            return (
                idx[:, :, :h],
                None if wt is None else wt[:, :, :h],
            )
        sel = jnp.asarray(tabs, jnp.int32)
        g_idx = jnp.take(idx, sel, axis=0)[:, :, :h]
        g_wt = None if wt is None else jnp.take(wt, sel, axis=0)[:, :, :h]
        return g_idx, g_wt

    if len(groups) == 1:
        (h,) = groups
        g_idx, g_wt = take_group(groups[h], h)
        return fused_embedding_bag(stacked, row_offsets, g_idx, g_wt)
    parts = []  # [B, Tg, d] per group
    order = []
    for h, tabs in sorted(groups.items()):
        g_idx, g_wt = take_group(tabs, h)
        g_off = jnp.take(row_offsets, jnp.asarray(tabs, jnp.int32))
        parts.append(fused_embedding_bag(stacked, g_off, g_idx, g_wt))
        order.extend(tabs)
    cat = jnp.concatenate(parts, axis=1)  # [B, T, d] in group order
    inv = np.zeros(t, np.int32)
    inv[np.asarray(order)] = np.arange(t, dtype=np.int32)
    return jnp.take(cat, jnp.asarray(inv), axis=1)
