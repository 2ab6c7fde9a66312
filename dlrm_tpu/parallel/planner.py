"""Embedding-table sharding planner.

Plays the role of TorchRec's EmbeddingShardingPlanner + Topology
(torchrec_dlrm/dlrm_main.py:654-667) and of the v1 round-robin / contiguous
table assignment (dlrm_s_pytorch.py:636, extend_distributed.py:47-62), redesigned
for GSPMD: the planner produces ONE stacked [num_shards * shard_rows, dim] layout
where each model-axis shard's rows hold the tables assigned to it (plus padding),
so the whole embedding state is a single array sharded with PartitionSpec("model")
on dim 0 — XLA sees aligned shard boundaries and every lookup is one gather.

Strategies:
  * table_wise  — greedy longest-processing-time bin packing of whole tables
                  onto shards (balances rows like TorchRec's planner heuristic)
  * round_robin — table k -> shard k % num_shards (v1 semantics)
  * row_wise    — every table split evenly across all shards (for tables far
                  bigger than one device's HBM); lookup uses the same global
                  layout, indices map to (shard, local row) by row range.
  * mixed       — the TorchRec-planner equivalent for the REAL flagship
                  config (26 tables, up to 40M rows / 104 GiB,
                  torchrec_dlrm/README.MD:45-53): tables whose row count
                  exceeds the ideal balanced per-shard load are row-wise
                  striped across every shard; the rest are LPT-packed
                  table-wise. Per-shard layout = [row-wise slices | own
                  whole tables], identical rw-region geometry on every
                  shard, so the whole state is still ONE stacked array
                  sharded P("model") on dim 0.

All placement math is host-side numpy; the result is static metadata baked
into the jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

# TPU fp32 sublane tile: keep shard boundaries 8-row aligned.
_ROW_ALIGN = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class TablePlacement:
    """Static layout of all tables inside one globally-sharded stacked array."""

    table_sizes: Tuple[int, ...]
    num_shards: int
    strategy: str
    # per-table shard id (table_wise/round_robin); -1 = row-wise sharded;
    # -2 = column-wise sharded (lives in the separate cw array, split on
    # the FEATURE dim over shards — TorchRec's CW option,
    # torchrec_dlrm/dlrm_main.py:654-667)
    table_shard: Tuple[int, ...]
    # per-table start row. MEANING IS STRATEGY-DEPENDENT: for round_robin /
    # table_wise it is the offset into the GLOBAL stacked array; for
    # row_wise (and mixed row-wise tables) it is the table's offset WITHIN
    # each shard's block (use extract_table / global_index_map, never raw
    # slicing, for those)
    global_offsets: Tuple[int, ...]
    # rows per shard (equal across shards; includes padding)
    shard_rows: int
    # per-table UNPADDED rows-per-shard slice length; 0 = not row-wise.
    # (row_wise strategy leaves this empty for backward compat and uses
    # ceil(n / num_shards) implicitly.)
    rw_slice: Tuple[int, ...] = ()
    # explicit per-shard slot ordering (size_rr); None -> ascending table id
    slots: Optional[Tuple[Tuple[int, ...], ...]] = None
    # column-wise tables: ids + per-table row offset into the cw array
    # ([cw_rows, dim], sharded on the FEATURE dim: every shard holds ALL
    # rows but dim/num_shards columns — no index remap, no masking)
    cw_ids: Tuple[int, ...] = ()
    cw_offsets: Tuple[int, ...] = ()
    cw_rows: int = 0

    @property
    def total_rows(self) -> int:
        return self.num_shards * self.shard_rows

    def local_tables(self, shard: int) -> List[int]:
        return [t for t, s in enumerate(self.table_shard) if s == shard]

    def rw_tables(self) -> List[int]:
        return [t for t, s in enumerate(self.table_shard) if s == -1]

    def cw_tables(self) -> List[int]:
        return [t for t, s in enumerate(self.table_shard) if s == -2]

    def slice_len(self, t: int) -> int:
        """Unpadded rows-per-shard of row-wise table t."""
        if self.rw_slice:
            return self.rw_slice[t]
        return int(np.ceil(self.table_sizes[t] / self.num_shards))

    def _is_rw(self, t: int) -> bool:
        # every strategy marks row-wise tables with shard id -1
        # (row_wise marks all, mixed/size_rr the striped subset)
        return self.table_shard[t] == -1


def _rw_region(sizes, is_rw, num_shards):
    """Row-wise-striped region layout shared by the mixed and size_rr
    strategies: each striped table takes an equal aligned per-shard slice,
    packed first. Returns (rw_slice, rw_off, region_rows)."""
    num_t = len(sizes)
    rw_slice = [0] * num_t
    rw_off = [0] * num_t
    fill = 0
    for t in range(num_t):
        if not is_rw[t]:
            continue
        rw_slice[t] = int(np.ceil(sizes[t] / num_shards))
        rw_off[t] = fill
        fill += _round_up(rw_slice[t], _ROW_ALIGN)
    return rw_slice, rw_off, fill


def _stripe_until_fit(sizes, is_rw, num_shards, capacity_rows, layout,
                      shard_rows_of, what: str,
                      allow_capacity_overflow: bool = False):
    """Capacity-driven striping loop shared by mixed and size_rr: stripe
    the largest still-table-wise eligible table and re-pack until every
    shard meets the row budget (mutates is_rw). When even full striping
    cannot fit, the default is a LOUD error (on a real chip a silently
    overshot budget is an OOM discovered minutes into training);
    allow_capacity_overflow=True keeps the plan and downgrades to a
    warning."""
    out = layout(is_rw)
    if capacity_rows is None:
        return out
    num_t = len(sizes)
    while shard_rows_of(out) > int(capacity_rows) and not all(
        is_rw[t] or sizes[t] < num_shards for t in range(num_t)
    ):
        cand = max(
            (t for t in range(num_t)
             if not is_rw[t] and sizes[t] >= num_shards),
            key=lambda t: sizes[t],
        )
        is_rw[cand] = True
        out = layout(is_rw)
    if shard_rows_of(out) > int(capacity_rows):
        msg = (
            f"{what} plan cannot meet capacity_rows={capacity_rows}: "
            f"best-effort shard_rows={shard_rows_of(out)} "
            f"({shard_rows_of(out) - int(capacity_rows)} rows over budget) "
            "even with every eligible table row-wise striped — add shards, "
            "raise the HBM budget, or pass allow_capacity_overflow=True "
            "(--allow_capacity_overflow) to proceed anyway"
        )
        if not allow_capacity_overflow:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg + " [override active: expect HBM pressure]",
                      stacklevel=3)
    return out


def plan_tables(
    table_sizes: Sequence[int],
    num_shards: int,
    strategy: str = "table_wise",
    rw_threshold: Optional[int] = None,
    capacity_rows: Optional[int] = None,
    cw_tables: Optional[Sequence[int]] = None,
    allow_capacity_overflow: bool = False,
) -> TablePlacement:
    sizes = [int(n) for n in table_sizes]
    num_t = len(sizes)

    if cw_tables:
        # Column-wise tables compose with ANY strategy: they are pulled out
        # into their own [cw_rows, dim] array (feature-dim sharded) and the
        # chosen strategy plans the REST (TorchRec's planner mixes CW with
        # TW/RW per table the same way, torchrec_dlrm/dlrm_main.py:654-667).
        cw = sorted({int(t) for t in cw_tables})
        if any(t < 0 or t >= num_t for t in cw):
            raise ValueError(f"cw_tables out of range: {cw}")
        rest = [t for t in range(num_t) if t not in set(cw)]
        cw_off, fill = [], 0
        for t in cw:
            cw_off.append(fill)
            fill += _round_up(sizes[t], _ROW_ALIGN)
        if capacity_rows is not None:
            # each shard additionally holds cw_rows x dim/num_shards columns
            # = fill/num_shards full-width-row equivalents; deduct it from
            # the sub-plan's HBM row budget so the budget stays honest
            cw_per_shard = int(np.ceil(fill / num_shards))
            capacity_rows = int(capacity_rows) - cw_per_shard
            if capacity_rows <= 0:
                raise ValueError(
                    f"cw_tables={cw} alone exceed the per-shard row budget: "
                    f"cw per-shard footprint {cw_per_shard} rows >= "
                    f"capacity_rows — shard fewer/narrower tables "
                    "column-wise or add shards"
                )
        sub = plan_tables(
            [sizes[t] for t in rest], num_shards, strategy=strategy,
            rw_threshold=rw_threshold, capacity_rows=capacity_rows,
            allow_capacity_overflow=allow_capacity_overflow,
        )
        table_shard = [-2] * num_t
        goff = [0] * num_t
        rwsl = [0] * num_t
        for j, t in enumerate(rest):
            table_shard[t] = sub.table_shard[j]
            goff[t] = sub.global_offsets[j]
            rwsl[t] = sub.slice_len(j) if sub.table_shard[j] == -1 else 0
        for j, t in enumerate(cw):
            goff[t] = cw_off[j]
        slots = (
            tuple(tuple(rest[j] for j in sl) for sl in sub.slots)
            if sub.slots is not None
            else None
        )
        return TablePlacement(
            table_sizes=tuple(sizes),
            num_shards=num_shards,
            strategy=sub.strategy,
            table_shard=tuple(table_shard),
            global_offsets=tuple(goff),
            shard_rows=sub.shard_rows,
            rw_slice=tuple(rwsl) if any(rwsl) else (),
            slots=slots,
            cw_ids=tuple(cw),
            cw_offsets=tuple(cw_off),
            cw_rows=max(fill, _ROW_ALIGN),
        )

    if strategy == "mixed":
        # Per-table strategy choice mirroring TorchRec's size/topology-driven
        # planner (EmbeddingShardingPlanner, torchrec_dlrm/dlrm_main.py:654-667):
        #   1. any table that alone exceeds the ideal balanced per-shard load
        #      is row-wise striped (it could never balance table-wise);
        #   2. if capacity_rows is given (per-shard HBM row budget), further
        #      stripe the largest remaining tables until every shard fits —
        #      this is what lets the 26-table / 104 GiB flagship config
        #      (torchrec_dlrm/README.MD:45-53) train on a small mesh.
        thr = (
            int(rw_threshold)
            if rw_threshold is not None
            else max(1, sum(sizes) // max(1, num_shards))
        )
        is_rw = [n > thr and n >= num_shards for n in sizes]

        def _layout(is_rw):
            rw_slice, rw_off, rw_region = _rw_region(sizes, is_rw, num_shards)
            # tw region: greedy LPT over the remaining tables
            tw = [t for t in range(num_t) if not is_rw[t]]
            order = sorted(tw, key=lambda t: -sizes[t])
            load = [0] * num_shards
            assign = [-1] * num_t
            local_off = [0] * num_t
            for t in order:
                s = int(np.argmin(load))
                assign[t] = s
                local_off[t] = load[s]
                load[s] += _round_up(sizes[t], _ROW_ALIGN)
            tw_region = _round_up(max(load) if tw else 0, _ROW_ALIGN)
            shard_rows = max(_ROW_ALIGN, rw_region + tw_region)
            return rw_slice, rw_off, rw_region, assign, local_off, shard_rows

        out = _stripe_until_fit(
            sizes, is_rw, num_shards, capacity_rows, _layout,
            lambda o: o[5], "mixed",
            allow_capacity_overflow=allow_capacity_overflow,
        )
        rw_slice, rw_off, rw_region, assign, local_off, shard_rows = out
        global_offsets = tuple(
            rw_off[t]
            if is_rw[t]
            else assign[t] * shard_rows + rw_region + local_off[t]
            for t in range(num_t)
        )
        return TablePlacement(
            table_sizes=tuple(sizes),
            num_shards=num_shards,
            strategy="mixed",
            table_shard=tuple(assign),
            global_offsets=global_offsets,
            shard_rows=int(shard_rows),
            rw_slice=tuple(rw_slice),
        )

    if strategy == "row_wise":
        # every table striped across all shards: table t's shard-s slice has
        # ceil(n_t / S) rows; global layout groups by shard then table.
        per_shard_tbl = [_round_up(int(np.ceil(n / num_shards)), _ROW_ALIGN) for n in sizes]
        shard_rows = sum(per_shard_tbl)
        # global offset of table t within a shard block
        intra = np.concatenate([[0], np.cumsum(per_shard_tbl)[:-1]])
        return TablePlacement(
            table_sizes=tuple(sizes),
            num_shards=num_shards,
            strategy="row_wise",
            table_shard=tuple(-1 for _ in sizes),
            global_offsets=tuple(int(x) for x in intra),  # per-shard-block offset
            shard_rows=int(shard_rows),
        )

    if strategy == "size_rr":
        # Round-robin over SIZE RANKS: slot j of shard s holds the table
        # ranked j*S+s by descending row count, so aligned slots across
        # shards hold comparably-sized tables. This minimizes the padding
        # the stream butterfly pays for its common per-slot plan geometry
        # (every shard's slot j is sized for the largest table in that
        # slot across shards).
        #
        # With rw_threshold / capacity_rows the plan composes with row-wise
        # striping exactly like "mixed": over-budget tables get an equal
        # slice on every shard (rw region first), the rest are size_rr
        # slotted — this is what lets the STREAM butterfly hold the 40M-row
        # flagship outliers (torchrec_dlrm/README.MD:45-53) as striped
        # stream slots instead of excluding them.
        is_rw = [False] * num_t
        if rw_threshold is not None:
            thr = int(rw_threshold)
            is_rw = [n > thr and n >= num_shards for n in sizes]

        def _layout_rr(is_rw):
            rw_slice, rw_off, rw_region = _rw_region(sizes, is_rw, num_shards)
            tw = [t for t in range(num_t) if not is_rw[t]]
            order = sorted(tw, key=lambda t: (-sizes[t], t))
            slot_lists: List[List[int]] = [[] for _ in range(num_shards)]
            assign = [-1] * num_t
            for rank, t in enumerate(order):
                s = rank % num_shards
                assign[t] = s
                slot_lists[s].append(t)
            local_off = [0] * num_t
            shard_fill = [0] * num_shards
            for s in range(num_shards):
                for t in slot_lists[s]:
                    local_off[t] = rw_region + shard_fill[s]
                    shard_fill[s] += _round_up(sizes[t], _ROW_ALIGN)
            shard_rows = _round_up(
                max(rw_region + (max(shard_fill) if shard_fill else 0),
                    _ROW_ALIGN),
                _ROW_ALIGN,
            )
            return (rw_slice, rw_off, assign, local_off, shard_rows,
                    slot_lists)

        out = _stripe_until_fit(
            sizes, is_rw, num_shards, capacity_rows, _layout_rr,
            lambda o: o[4], "size_rr",
            allow_capacity_overflow=allow_capacity_overflow,
        )
        rw_slice, rw_off, assign, local_off, shard_rows, slot_lists = out
        return TablePlacement(
            table_sizes=tuple(sizes),
            num_shards=num_shards,
            strategy="size_rr",
            table_shard=tuple(assign),
            global_offsets=tuple(
                rw_off[t]
                if is_rw[t]
                else assign[t] * shard_rows + local_off[t]
                for t in range(num_t)
            ),
            shard_rows=int(shard_rows),
            rw_slice=tuple(rw_slice) if any(is_rw) else (),
            slots=tuple(tuple(x) for x in slot_lists),
        )

    if strategy == "round_robin":
        assign = [t % num_shards for t in range(num_t)]
    elif strategy == "table_wise":
        # greedy LPT: biggest table to the least-loaded shard
        order = np.argsort(sizes, kind="stable")[::-1]
        load = [0] * num_shards
        assign = [0] * num_t
        for t in order:
            s = int(np.argmin(load))
            assign[int(t)] = s
            load[s] += sizes[int(t)]
    else:
        raise ValueError(f"sharding strategy {strategy!r} not supported")

    # local offsets within each shard (aligned), then pad shards to equal rows
    local_off = [0] * num_t
    shard_fill = [0] * num_shards
    for t in range(num_t):
        s = assign[t]
        local_off[t] = shard_fill[s]
        shard_fill[s] += _round_up(sizes[t], _ROW_ALIGN)
    # max(..., _ROW_ALIGN): with zero tables (everything pulled into the cw
    # array) every shard_fill entry is 0 — keep one aligned dummy row so
    # the stacked array and the butterfly's pad-slot gathers stay non-empty
    shard_rows = _round_up(
        max([_ROW_ALIGN] + shard_fill), _ROW_ALIGN
    )
    global_offsets = tuple(
        assign[t] * shard_rows + local_off[t] for t in range(num_t)
    )
    return TablePlacement(
        table_sizes=tuple(sizes),
        num_shards=num_shards,
        strategy=strategy,
        table_shard=tuple(assign),
        global_offsets=global_offsets,
        shard_rows=int(shard_rows),
    )


def build_stacked(
    placement: TablePlacement, tables: Sequence[np.ndarray]
) -> np.ndarray:
    """Materialize the padded global stacked array from per-table arrays."""
    dim = tables[0].shape[1]
    out = np.zeros((placement.total_rows, dim), dtype=tables[0].dtype)
    S = placement.num_shards
    cw = set(placement.cw_ids)
    for t, w in enumerate(tables):
        if t in cw:  # lives in the separate cw array (build_cw_stacked)
            continue
        n = w.shape[0]
        if placement._is_rw(t):
            rows_per = placement.slice_len(t)
            for s in range(S):
                lo = s * rows_per
                hi = min(n, lo + rows_per)
                if lo >= n:
                    break
                dst = s * placement.shard_rows + placement.global_offsets[t]
                out[dst : dst + (hi - lo)] = w[lo:hi]
        else:
            off = placement.global_offsets[t]
            out[off : off + n] = w
    return out


def extract_table(
    placement: TablePlacement, stacked: np.ndarray, t: int
) -> np.ndarray:
    """Recover table t's rows from the stacked layout (checkpoint export)."""
    n = placement.table_sizes[t]
    if placement.table_shard[t] == -2:
        raise ValueError(
            f"table {t} is column-wise sharded; use extract_cw_table on the "
            "cw array"
        )
    if placement._is_rw(t):
        S = placement.num_shards
        rows_per = placement.slice_len(t)
        parts = []
        for s in range(S):
            lo = s * rows_per
            hi = min(n, lo + rows_per)
            if lo >= n:
                break
            src = s * placement.shard_rows + placement.global_offsets[t]
            parts.append(stacked[src : src + (hi - lo)])
        return np.concatenate(parts, axis=0)
    off = placement.global_offsets[t]
    return stacked[off : off + n]


def build_cw_stacked(
    placement: TablePlacement, tables: Sequence[np.ndarray]
) -> np.ndarray:
    """Materialize the column-wise tables' [cw_rows, dim] array (the FULL
    width; the mesh shards it on dim 1). `tables` is the full per-table
    list; non-cw entries are ignored."""
    dim = tables[0].shape[1]
    out = np.zeros((placement.cw_rows, dim), dtype=tables[0].dtype)
    for t, off in zip(placement.cw_ids, placement.cw_offsets):
        w = tables[t]
        out[off : off + w.shape[0]] = w
    return out


def extract_cw_table(
    placement: TablePlacement, cw_stacked: np.ndarray, t: int
) -> np.ndarray:
    """Recover column-wise table t from the (host-gathered) cw array."""
    i = placement.cw_ids.index(t)
    off = placement.cw_offsets[i]
    return cw_stacked[off : off + placement.table_sizes[t]]


def global_index_map(placement: TablePlacement):
    """Returns f(table_id, local_idx)->global_row as numpy arrays, usable both
    host-side and (as static constants) inside jit. Column-wise tables are
    addressed in their own array: to_global returns the cw-array row and the
    caller routes by placement.table_shard[t] == -2."""
    cw_off = {t: o for t, o in zip(placement.cw_ids, placement.cw_offsets)}
    if placement.strategy == "row_wise" or placement.rw_slice:
        S = placement.num_shards
        rows_per = np.asarray(
            [max(1, placement.slice_len(t)) for t in range(len(placement.table_sizes))],
            dtype=np.int64,
        )
        is_rw = np.asarray(
            [
                placement._is_rw(t)
                for t in range(len(placement.table_sizes))
            ]
        )
        intra = np.asarray(placement.global_offsets, dtype=np.int64)
        shard_rows = placement.shard_rows

        def to_global(t: int, idx):
            if t in cw_off:
                return cw_off[t] + idx
            if not is_rw[t]:
                return intra[t] + idx
            s = idx // rows_per[t]
            local = idx % rows_per[t]
            return s * shard_rows + intra[t] + local

        return to_global
    offs = np.asarray(placement.global_offsets, dtype=np.int64)

    def to_global(t: int, idx):
        return offs[t] + idx

    return to_global
