"""Device batch layout.

The reference feeds (X, lS_o, lS_i, T): dense [B, D], per-table ragged CSR offsets
and indices, targets [B, 1] (dlrm_s_pytorch.py:407-414, dlrm_data_pytorch.py:324-411).
On TPU the ragged CSR form becomes a padded dense layout at the host boundary:

    dense:  float32[B, D]
    idx:    int32[T, B, H]    padded multi-hot indices (H static)
    wt:     float32[T, B, H]  index weights; 0 marks padding (None => all bags
                              are exactly H long: the fixed-multi-hot fast path,
                              like DLRM-v2's synthetic multi-hot batches)
    labels: float32[B, 1]
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax


class StreamArrays(NamedTuple):
    """Device copies of the host-built U-layout work plan
    (dlrm_tpu/ops/stream_plan.py) consumed by the streamed kernels."""

    rows_u: jax.Array  # [Uw, 8, 128] int32
    vals_u: jax.Array  # [Uw, 8, 128] int32
    wts_u: jax.Array  # [Uw, 8, 128] float32
    w2t: jax.Array  # [Uw] int32
    item_block: jax.Array  # [M] int32
    item_row0: jax.Array  # [M] int32
    item_u: jax.Array  # [M] int32


class Batch(NamedTuple):
    dense: jax.Array
    idx: jax.Array
    wt: Optional[jax.Array]
    labels: Optional[jax.Array]
    stream: Optional[StreamArrays] = None
    # Row-wise-striped tables of a mixed sharding plan travel separately:
    # their indices must be visible to EVERY model shard (each masks its
    # own row range), so they ship replicated over "model" instead of
    # table-sharded (dlrm_tpu/parallel/butterfly.py mixed path).
    idx_rw: Optional[jax.Array] = None  # [T_rw, B, H] int32
    wt_rw: Optional[jax.Array] = None  # [T_rw, B, H] float32
    # Column-wise tables' indices also ship replicated over "model": every
    # shard holds ALL rows (a feature slice of each), so it gathers every
    # hit with no remap and contributes a d/m-wide partial pool.
    idx_cw: Optional[jax.Array] = None  # [T_cw, B, H] int32
    wt_cw: Optional[jax.Array] = None  # [T_cw, B, H] float32
    # Owner-bucketed row-wise hits (parallel/rw_bucket.py): pre-localized
    # row ids per owning shard, leading axis SHARDED over "model" — each
    # shard gathers only rows it owns instead of masking all H hits. When
    # set, idx_rw/wt_rw above carry only the small overflow spill.
    idx_rwb: Optional[jax.Array] = None  # [M, B, C_total] int32 local rows
    wt_rwb: Optional[jax.Array] = None  # [M, B, C_total] float32
    # SHARED-segment bucketing (rw_bucket.bucket_rw_hits_shared): all
    # striped tables share one [C] segment per (shard, bag) — the sigma
    # padding is paid once, not per table — with an int32 table id per
    # slot for the per-table pooling masks. When set, idx_rw/wt_rw carry
    # the [B, S] shared spill (GLOBAL rows) and tid_rw its table ids.
    tid_rwb: Optional[jax.Array] = None  # [M, B, C] int32
    tid_rw: Optional[jax.Array] = None  # [B, S] int32

    @property
    def batch_size(self) -> int:
        return self.dense.shape[0]
