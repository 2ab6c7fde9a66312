"""Pallas TPU kernels over the U-layout (see ops/stream_plan.py).

Replaces the issue-rate-bound gather/sort/scatter path of the fused sparse
optimizer (and optionally the embedding forward) with bandwidth-bound
streaming + MXU one-hot matmuls:

  K1 window_grads    dly [T,B,d] -> per-hit grads G_u [U,d] in U-order.
                     One one-hot matmul per 128 hits: G = onehot(bag,wt)^T @
                     dly. Exact: sentinel slots have weight 0.
  K2 stream_update_* stream the stacked table (and optimizer state) through
                     VMEM block by block; per 256-hit work item accumulate
                     the block's summed per-row gradient Gsum with a one-hot
                     matmul; at the block's last item apply the optimizer
                     update densely and emit the new block. Exact duplicate
                     coalescing falls out of the matmul accumulation (the
                     nonlinear Adagrad update sees the fully-summed row
                     gradient — semantics of optim/rwsadagrad.py:117-143 and
                     torch.optim.Adagrad sparse).
  K3 stream_rows     stream the table; per work item emit the (unweighted)
                     rows of its hits into R_u [U,d] (forward phase 1).
  K4 window_pool     R_u -> pooled [T,B,d]: one one-hot matmul per 128 hits,
                     weights folded into the one-hot (forward phase 2).

All four are grid-sequential, fully static, and every random access has been
converted into either a sequential stream (pipelined BlockSpec) or a matmul.

Design notes (measured on v5e, bench_scripts/PERF_NOTES.md):
  * jnp.take / dynamic_gather inside kernels is unsupported (hangs Mosaic);
    one-hot matmuls are built WITHOUT transposes: lane vectors broadcast
    against a sublane iota, and dot_general contracts dim 0 so the MXU does
    the transposition.
  * int32 window data is over-fetched in 8-tile-aligned (16,128) slabs and
    sliced at a dynamic sublane offset (HBM slices must be tile-aligned).
  * input_output_aliases on blocked OUTPUT specs is catastrophically slow
    on this toolchain, but K2's outputs are ANY with manual DMA-out and
    aliasing those is free: the update kernels run IN PLACE (table + acc),
    which removes a per-step whole-table XLA copy and halves table HBM
    residency (a 9.3 GiB bf16 table state fits one 16 GiB chip). Safe
    because each block is written once, after its last read, in item
    order. DLRM_K2_NO_ALIAS=1 restores functional buffers for A/B runs.

Reference parity: together K1+K2 implement FBGEMM's
EXACT_ROWWISE_ADAGRAD/EXACT_ADAGRAD/EXACT_SGD in-backward updates invoked by
torchrec's apply_optimizer_in_backward (torchrec_dlrm/dlrm_main.py:649-653);
K3+K4 implement nn.EmbeddingBag(mode="sum") pooling (dlrm_s_pytorch.py:407).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlrm_tpu.ops.stream_plan import CHUNK, WINDOW, StreamPlan

ADAGRAD_EPS = 1e-10  # matches optim/optimizers.py ADAGRAD_EPS

import os as _os


def _k2_aliases(pairs):
    """In-place K2 buffers; DLRM_K2_NO_ALIAS=1 (read at call time, so an
    A/B toggle set after import still works) restores functional buffers."""
    return {} if _os.environ.get("DLRM_K2_NO_ALIAS") else pairs


def _onehot(iota, keys, vals=None, dtype=jnp.float32):
    """[rows, 128] one-hot: iota [rows,128] sublane-iota, keys [128] lane
    vector; entry (r, k) = (iota[r,k]==keys[k]) * (vals[k] or 1)."""
    cond = iota == keys
    if vals is None:
        return cond.astype(dtype)
    return jnp.where(cond, vals, jnp.zeros_like(vals)).astype(dtype)


# ----------------------------------------------------------------- K1
def _window_grads_kernel(w2t_ref, vals_ref, wts_ref, dly_ref, out_ref,
                         *, mm_dtype):
    b = dly_ref.shape[1]
    dly = dly_ref[0].astype(mm_dtype)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 0)
    for s in range(WINDOW // 128):
        oh = _onehot(iota_b, vals_ref[0, s, :], wts_ref[0, s, :], mm_dtype)
        g = jax.lax.dot_general(
            oh, dly,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[s * 128 : (s + 1) * 128, :] = g.astype(out_ref.dtype)


def window_grads(
    dly: jax.Array,  # [T, B, d] pooled-embedding cotangent (pre-cast ok)
    vals_u: jax.Array,  # [Uw, 8, 128] int32
    wts_u: jax.Array,  # [Uw, 8, 128] f32
    w2t: jax.Array,  # [Uw] int32
    *,
    out_dtype=jnp.float32,
    mm_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:  # G_u [Uw*1024, d]
    uw = vals_u.shape[0]
    t, b, d = dly.shape
    # double-buffered dly block + window/out blocks vs the 16M scoped VMEM
    # limit (b=12288, d=128 compiled to a 19M allocation — leave headroom)
    if b * d * 4 * 2 > 10 * 2**20:
        raise ValueError(
            f"window_grads holds one [batch={b}, d={d}] dly block (x2 "
            "buffers) in VMEM — too large for this chip; use "
            "grad_impl='gather' (gather_grads) at large batch"
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(uw,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda w, w2t: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda w, w2t: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, d), lambda w, w2t: (w2t[w], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((WINDOW, d), lambda w, w2t: (w, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_window_grads_kernel, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((uw * WINDOW, d), out_dtype),
        interpret=interpret,
    )(w2t, vals_u, wts_u, dly)


def gather_grads(
    dly: jax.Array,  # [T, B, d] pooled-embedding cotangent
    vals_u: jax.Array,  # [Uw, 8, 128] int32 bag index (0 at sentinels)
    wts_u: jax.Array,  # [Uw, 8, 128] f32 weight (0 at sentinels)
    w2t: jax.Array,  # [Uw] int32 window -> table
    *,
    out_dtype=jnp.float32,
) -> jax.Array:  # G_u [Uw*1024, d]
    """K1 alternative: per-hit grads via one fused XLA gather.

    window_grads' one-hot matmul costs B*d*2 FLOPs per hit (quadratic in
    batch x hits); this costs one issue-rate-bound row gather per hit
    (~18.5ns measured) independent of B — the right choice for large batch.
    Sentinel slots gather bag 0 of the window's table and are zeroed by the
    weight."""
    t, b, d = dly.shape
    dly2 = dly.reshape(t * b, d)
    idx = w2t[:, None, None] * b + vals_u  # [Uw, 8, 128]
    g = jnp.take(dly2, idx.reshape(-1), axis=0)
    return (g * wts_u.reshape(-1, 1)).astype(out_dtype)


# ----------------------------------------------------------------- K2
def _accumulate_gsum(iu_ref, ir_ref, g_hbm, rows_hbm, gsum,
                     rows0, rows1, g0, g1, sr0, sr1, sg0, sg1,
                     *, first, br, mm_dtype, g_idx):
    """Shared by the update kernels: one-hot accumulate this item's grads
    into gsum [br, d]. Per-item data is DOUBLE-BUFFERED across grid steps:
    item g+1's rows+grads DMA is issued before item g's wait, so the copies
    overlap the matmuls (a plain start/wait per item left the kernel
    latency-bound at ~2.9us/item measured; see PERF_NOTES.md). Parity
    branches are statically unrolled — dynamic scratch indexing hangs
    Mosaic."""
    g = g_idx
    m = pl.num_programs(0)

    def dmas(i, rbuf, gbuf, sr, sg):
        # item u offsets are CHUNK-aligned by construction
        # (stream_plan.build_stream_work emits items at CHUNK strides);
        # the hint lets Mosaic prove tile alignment for bf16 G_u (whose
        # (8,128)(2,1) tiling otherwise fails the divisibility proof)
        u = pl.multiple_of(iu_ref[i], CHUNK)
        rtile = (u // WINDOW) * 8
        return (
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(rtile, 16), :], rbuf, sr
            ),
            pltpu.make_async_copy(g_hbm.at[pl.ds(u, CHUNK), :], gbuf, sg),
        )

    even = jax.lax.rem(g, 2) == 0

    @pl.when(g == 0)
    def _():
        a, b = dmas(0, rows0, g0, sr0, sg0)
        a.start()
        b.start()

    @pl.when(jnp.logical_and(g + 1 < m, even))
    def _():
        a, b = dmas(g + 1, rows1, g1, sr1, sg1)
        a.start()
        b.start()

    @pl.when(jnp.logical_and(g + 1 < m, jnp.logical_not(even)))
    def _():
        a, b = dmas(g + 1, rows0, g0, sr0, sg0)
        a.start()
        b.start()

    @pl.when(first)
    def _():
        gsum[:] = jnp.zeros_like(gsum)

    def compute(rbuf, gbuf, sr, sg):
        a, b = dmas(g, rbuf, gbuf, sr, sg)
        a.wait()
        b.wait()
        u = iu_ref[g]
        row0 = ir_ref[g]
        rtile = (u // WINDOW) * 8
        off = u // 128 - rtile
        local = rbuf[pl.ds(off, CHUNK // 128), :] - row0  # [2, 128]
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 0)
        for s_ in range(CHUNK // 128):
            oh = _onehot(iota_r, local[s_, :], None, mm_dtype)
            gs = gbuf[s_ * 128 : (s_ + 1) * 128, :].astype(mm_dtype)
            gsum[:] += jax.lax.dot_general(
                oh, gs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    pl.when(even)(lambda: compute(rows0, g0, sr0, sg0))
    pl.when(jnp.logical_not(even))(lambda: compute(rows1, g1, sr1, sg1))


def _flags(ib_ref, g):
    m = pl.num_programs(0)
    blk = ib_ref[g]
    prev = ib_ref[jnp.maximum(g - 1, 0)]
    nxt = ib_ref[jnp.minimum(g + 1, m - 1)]
    first = jnp.logical_or(g == 0, blk != prev)
    last = jnp.logical_or(g == m - 1, blk != nxt)
    return first, last


def _cast_out(val_f32, out_dtype, sr):
    """Cast the updated block to the table dtype; when sr is set and the
    table is bfloat16, use stochastic rounding (add uniform bits below the
    bf16 mantissa, then truncate) — FBGEMM does the same for its low-precision
    split-TBE updates so that tiny Adagrad steps don't round to zero."""
    if not sr or out_dtype != jnp.bfloat16:
        return val_f32.astype(out_dtype)
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(val_f32.shape), jnp.uint32
    ) & jnp.uint32(0xFFFF)
    u = pltpu.bitcast(val_f32, jnp.uint32) + bits
    return pltpu.bitcast(
        u & jnp.uint32(0xFFFF0000), jnp.float32
    ).astype(jnp.bfloat16)


def _identity128(dtype=jnp.float32):
    a = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (a == b).astype(dtype)


def _wait_prev_write(when_ok, blk, buf, out_hbm, sem, rows_per_blk):
    """Buffer-reuse guard: wait out the PREVIOUS block's in-flight write
    before the caller overwrites `buf`. Must run BEFORE the `buf[:] = ...`
    store (waiting after would race the DMA still reading the buffer).
    The wait is semaphore-count based, so a descriptor of the same size
    (aimed at this block's destination) stands in for the previous one."""
    dma = pltpu.make_async_copy(
        buf, out_hbm.at[pl.ds(blk * rows_per_blk, rows_per_blk)], sem
    )

    @pl.when(when_ok)
    def _():
        dma.wait()


def _write_block(blk, buf, out_hbm, sem, rows_per_blk):
    """Manual per-block DMA-out (pl.ANY output).

    A BLOCKED output spec with a data-dependent index map serializes the
    Mosaic pipeline catastrophically (~8.9ms per grid step measured on v5e,
    bench_scripts/k2_bisect.py V4); K3's blocked-INPUT + manual-output shape
    runs the same grid at full bandwidth. The write drains while the next
    block accumulates; _wait_prev_write guards buffer reuse."""
    pltpu.make_async_copy(
        buf, out_hbm.at[pl.ds(blk * rows_per_blk, rows_per_blk)], sem
    ).start()


def _finalize_writes(g, m, blk, out_hbm, buf, sem, acc_pack):
    """At the final grid step, drain the in-flight write(s)."""

    @pl.when(g == m - 1)
    def _():
        rows_per_blk = buf.shape[0]
        pltpu.make_async_copy(
            buf, out_hbm.at[pl.ds(blk * rows_per_blk, rows_per_blk)], sem
        ).wait()
        for b2, o2, s2 in acc_pack:
            rp = b2.shape[0]
            pltpu.make_async_copy(
                b2, o2.at[pl.ds(blk * rp, rp)], s2
            ).wait()


def _sgd_kernel(ib_ref, ir_ref, iu_ref, g_hbm, rows_hbm, table_ref, lr_ref,
                out_hbm, gsum, rows0, rows1, g0, g1, upd,
                sr0, sr1, sg0, sg1, sem_w,
                *, br, mm_dtype, sr):
    g = pl.program_id(0)
    m = pl.num_programs(0)
    if sr:
        pltpu.prng_seed(lr_ref[0, 1].astype(jnp.int32), g)
    first, last = _flags(ib_ref, g)
    _accumulate_gsum(iu_ref, ir_ref, g_hbm, rows_hbm, gsum,
                     rows0, rows1, g0, g1, sr0, sr1, sg0, sg1,
                     first=first, br=br, mm_dtype=mm_dtype, g_idx=g)
    blk = ib_ref[g]

    @pl.when(last)
    def _():
        # "a previous write exists" = this is not the FIRST block in the
        # item list (blk > 0 assumed a dense 0..N block walk; the
        # touched-only worklist may start anywhere)
        _wait_prev_write(blk != ib_ref[0], blk, upd, out_hbm, sem_w, br)
        upd[:] = _cast_out(
            table_ref[:].astype(jnp.float32) - lr_ref[0, 0] * gsum[:],
            upd.dtype, sr,
        )
        _write_block(blk, upd, out_hbm, sem_w, br)

    _finalize_writes(g, m, blk, out_hbm, upd, sem_w, ())


def _rowwise_adagrad_kernel(ib_ref, ir_ref, iu_ref, g_hbm, rows_hbm,
                            table_ref, acc_ref, lr_ref, out_hbm, acc_hbm,
                            gsum, rows0, rows1, g0, g1, upd, acc_upd,
                            sr0, sr1, sg0, sg1, sem_w, sem_wa,
                            *, br, d, mm_dtype, eps, sr):
    g = pl.program_id(0)
    m = pl.num_programs(0)
    if sr:
        pltpu.prng_seed(lr_ref[0, 1].astype(jnp.int32), g)
    first, last = _flags(ib_ref, g)
    _accumulate_gsum(iu_ref, ir_ref, g_hbm, rows_hbm, gsum,
                     rows0, rows1, g0, g1, sr0, sr1, sg0, sg1,
                     first=first, br=br, mm_dtype=mm_dtype, g_idx=g)
    blk = ib_ref[g]

    @pl.when(last)
    def _():
        nf = blk != ib_ref[0]  # not the first written block (see _sgd)
        _wait_prev_write(nf, blk, upd, out_hbm, sem_w, br)
        _wait_prev_write(nf, blk, acc_upd, acc_hbm, sem_wa, br // 128)
        gs = gsum[:]
        mrow = jnp.sum(gs * gs, axis=1, keepdims=True) / d  # [br, 1]
        ident = _identity128()
        acc16 = acc_ref[:]  # [br/128, 128] packed row-wise accumulator
        cols = [
            jax.lax.dot_general(
                ident, acc16[i : i + 1, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [128, 1]: col[a] = acc16[i, a]
            for i in range(br // 128)
        ]
        acc_col = jnp.concatenate(cols, axis=0)  # [br, 1]
        new_acc = acc_col + mrow
        denom = jnp.sqrt(new_acc) + eps
        upd[:] = _cast_out(
            table_ref[:].astype(jnp.float32) - lr_ref[0, 0] * gs / denom,
            upd.dtype, sr,
        )
        rows_back = [
            jax.lax.dot_general(
                new_acc[i * 128 : (i + 1) * 128, :], ident,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, 128]: row[b] = new_acc[i*128 + b]
            for i in range(br // 128)
        ]
        acc_upd[:] = jnp.concatenate(rows_back, axis=0)
        _write_block(blk, upd, out_hbm, sem_w, br)
        _write_block(blk, acc_upd, acc_hbm, sem_wa, br // 128)

    _finalize_writes(g, m, blk, out_hbm, upd, sem_w,
                     ((acc_upd, acc_hbm, sem_wa),))


def _adagrad_kernel(ib_ref, ir_ref, iu_ref, g_hbm, rows_hbm, table_ref,
                    acc_ref, lr_ref, out_hbm, acc_hbm,
                    gsum, rows0, rows1, g0, g1, upd, acc_upd,
                    sr0, sr1, sg0, sg1, sem_w, sem_wa,
                    *, br, mm_dtype, eps, sr):
    g = pl.program_id(0)
    m = pl.num_programs(0)
    if sr:
        pltpu.prng_seed(lr_ref[0, 1].astype(jnp.int32), g)
    first, last = _flags(ib_ref, g)
    _accumulate_gsum(iu_ref, ir_ref, g_hbm, rows_hbm, gsum,
                     rows0, rows1, g0, g1, sr0, sr1, sg0, sg1,
                     first=first, br=br, mm_dtype=mm_dtype, g_idx=g)
    blk = ib_ref[g]

    @pl.when(last)
    def _():
        nf = blk != ib_ref[0]  # not the first written block (see _sgd)
        _wait_prev_write(nf, blk, upd, out_hbm, sem_w, br)
        _wait_prev_write(nf, blk, acc_upd, acc_hbm, sem_wa, br)
        gs = gsum[:]
        new_acc = acc_ref[:].astype(jnp.float32) + gs * gs
        denom = jnp.sqrt(new_acc) + eps
        upd[:] = _cast_out(
            table_ref[:].astype(jnp.float32) - lr_ref[0, 0] * gs / denom,
            upd.dtype, sr,
        )
        acc_upd[:] = new_acc.astype(acc_upd.dtype)
        _write_block(blk, upd, out_hbm, sem_w, br)
        _write_block(blk, acc_upd, acc_hbm, sem_wa, br)

    _finalize_writes(g, m, blk, out_hbm, upd, sem_w,
                     ((acc_upd, acc_hbm, sem_wa),))


def _rows2d_padded(rows_u: jax.Array) -> jax.Array:
    """[Uw,8,128] -> [(Uw*8)+16, 128] with a 16-row tail pad so the
    (16,128) over-fetch slab never reads out of bounds."""
    r2 = rows_u.reshape(-1, 128)
    pad = jnp.zeros((16, 128), jnp.int32)
    return jnp.concatenate([r2, pad], axis=0)


def stream_update(
    optimizer: str,  # sgd | rwsadagrad | adagrad
    plan: StreamPlan,
    table: jax.Array,  # [padded_rows, d]
    acc: Optional[jax.Array],  # packed [padded_rows/128,128] (rwsadagrad),
    #                            [padded_rows, d] (adagrad), None (sgd)
    g_u: jax.Array,  # [U, d] from window_grads
    rows_u: jax.Array,  # [Uw, 8, 128] int32
    item_block: jax.Array,  # [M] int32
    item_row0: jax.Array,  # [M] int32
    item_u: jax.Array,  # [M] int32
    lr,
    *,
    mm_dtype=jnp.float32,
    eps: float = ADAGRAD_EPS,
    stochastic_round: bool = False,
    seed=0,  # SR stream seed; pass the step counter for train-time variation
    interpret: bool = False,
):
    """Returns (new_table,) for sgd or (new_table, new_acc) otherwise."""
    br = plan.block_rows
    d = table.shape[1]
    m = item_block.shape[0]
    # pltpu.prng_* has no CPU lowering: interpret-mode tests silently use
    # round-to-nearest; SR itself is validated on-chip (stream_bench phase 1)
    sr = (bool(stochastic_round) and not interpret
          and jnp.dtype(table.dtype).name == "bfloat16")
    rows2d = _rows2d_padded(rows_u)
    lr_arr = jnp.stack(
        [jnp.asarray(lr, jnp.float32),
         jnp.asarray(seed, jnp.int32).astype(jnp.float32)]
    ).reshape(1, 2)

    table_spec = pl.BlockSpec((br, d), lambda g, ib, ir, iu: (ib[g], 0),
                              memory_space=pltpu.VMEM)
    acc16_spec = pl.BlockSpec(
        (br // 128, 128), lambda g, ib, ir, iu: (ib[g], 0),
        memory_space=pltpu.VMEM,
    )
    def make_scratch(acc_upd_shape=None):
        """Scratch in kernel-signature order: gsum, rows0/1, g0/1 (the
        double-buffered per-item slabs), upd, [acc_upd], then the DMA
        semaphores sr0/1, sg0/1, sem_w[, sem_wa]."""
        vmem = [
            pltpu.VMEM((br, d), jnp.float32),
            pltpu.VMEM((16, 128), jnp.int32),
            pltpu.VMEM((16, 128), jnp.int32),
            pltpu.VMEM((CHUNK, d), g_u.dtype),
            pltpu.VMEM((CHUNK, d), g_u.dtype),
            pltpu.VMEM((br, d), table.dtype),  # upd (manual write buffer)
        ]
        sems = [pltpu.SemaphoreType.DMA] * 5  # sr0, sr1, sg0, sg1, sem_w
        if acc_upd_shape is not None:
            vmem.append(pltpu.VMEM(acc_upd_shape, jnp.float32))
            sems.append(pltpu.SemaphoreType.DMA)  # sem_wa
        return vmem + sems

    scratch = make_scratch()
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    side = pltpu.CompilerParams(has_side_effects=True)

    if optimizer == "sgd":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(m,),
            in_specs=[any_spec, any_spec, table_spec, smem_spec],
            out_specs=any_spec,
            scratch_shapes=scratch,
        )
        new_table = pl.pallas_call(
            functools.partial(_sgd_kernel, br=br, mm_dtype=mm_dtype, sr=sr),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
            compiler_params=side,
            # table updates in place: without the alias XLA keeps TWO
            # copies of the table (9.3 GiB each at capacity scale) plus a
            # per-step copy inside loop-carried scans. Safe: each block is
            # written once, after its last read, in item order.
            input_output_aliases=_k2_aliases({5: 0}),
            interpret=interpret,
        )(item_block, item_row0, item_u, g_u, rows2d, table, lr_arr)
        return (new_table,)

    if optimizer == "rwsadagrad":
        if acc is None or acc.shape != (plan.acc_rows, 128):
            raise ValueError("rwsadagrad needs the packed [rows/128,128] acc")
        if (br // 128) % 8 != 0:
            raise ValueError(
                "rwsadagrad stream update needs block_rows >= 1024 (the "
                "packed accumulator block must have >= 8 sublanes)"
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(m,),
            in_specs=[any_spec, any_spec, table_spec, acc16_spec, smem_spec],
            out_specs=(any_spec, any_spec),
            scratch_shapes=make_scratch((br // 128, 128)),
        )
        new_table, new_acc = pl.pallas_call(
            functools.partial(
                _rowwise_adagrad_kernel, br=br, d=d, mm_dtype=mm_dtype,
                eps=eps, sr=sr,
            ),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(table.shape, table.dtype),
                jax.ShapeDtypeStruct(acc.shape, jnp.float32),
            ),
            compiler_params=side,
            input_output_aliases=_k2_aliases({5: 0, 6: 1}),  # in-place table + acc
            interpret=interpret,
        )(item_block, item_row0, item_u, g_u, rows2d, table, acc, lr_arr)
        return new_table, new_acc

    if optimizer == "adagrad":
        if acc is None or acc.shape != table.shape:
            raise ValueError("adagrad needs a [padded_rows, d] accumulator")
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(m,),
            in_specs=[any_spec, any_spec, table_spec, table_spec, smem_spec],
            out_specs=(any_spec, any_spec),
            scratch_shapes=make_scratch((br, d)),
        )
        new_table, new_acc = pl.pallas_call(
            functools.partial(
                _adagrad_kernel, br=br, mm_dtype=mm_dtype, eps=eps, sr=sr,
            ),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(table.shape, table.dtype),
                jax.ShapeDtypeStruct(table.shape, jnp.float32),
            ),
            compiler_params=side,
            input_output_aliases=_k2_aliases({5: 0, 6: 1}),  # in-place table + acc
            interpret=interpret,
        )(item_block, item_row0, item_u, g_u, rows2d, table, acc, lr_arr)
        return new_table, new_acc

    raise ValueError(f"optimizer {optimizer!r} not supported")


# ----------------------------------------------------------------- K3
def _stream_rows_kernel(ib_ref, ir_ref, iu_ref, rows_hbm, table_ref,
                        r_out_hbm, rows_scr, rchunk, sem_r, sem_w,
                        *, br, mm_dtype):
    g = pl.program_id(0)
    u = iu_ref[g]
    row0 = ir_ref[g]
    rtile = (u // WINDOW) * 8
    dma_r = pltpu.make_async_copy(
        rows_hbm.at[pl.ds(rtile, 16), :], rows_scr, sem_r
    )
    dma_r.start()
    dma_r.wait()
    off = u // 128 - rtile
    local = rows_scr[pl.ds(off, CHUNK // 128), :] - row0
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 0)
    tbl = table_ref[:].astype(mm_dtype)
    for s in range(CHUNK // 128):
        oh = _onehot(iota_r, local[s, :], None, mm_dtype)
        rw = jax.lax.dot_general(
            oh, tbl,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [128, d] rows of this chunk's hits (0 where no match)
        rchunk[s * 128 : (s + 1) * 128, :] = rw.astype(rchunk.dtype)
    dma_w = pltpu.make_async_copy(
        rchunk, r_out_hbm.at[pl.ds(u, CHUNK), :], sem_w
    )
    dma_w.start()
    dma_w.wait()


def stream_rows(
    plan: StreamPlan,
    table: jax.Array,  # [padded_rows, d]
    rows_u: jax.Array,
    item_block: jax.Array,
    item_row0: jax.Array,
    item_u: jax.Array,
    *,
    out_dtype=jnp.float32,
    mm_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:  # R_u [U, d]
    br = plan.block_rows
    d = table.shape[1]
    m = item_block.shape[0]
    rows2d = _rows2d_padded(rows_u)
    u_total = rows_u.shape[0] * WINDOW

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((br, d), lambda g, ib, ir, iu: (ib[g], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((16, 128), jnp.int32),
            pltpu.VMEM((CHUNK, d), out_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_stream_rows_kernel, br=br, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((u_total, d), out_dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(item_block, item_row0, item_u, rows2d, table)


# ----------------------------------------------------------------- K4
def _window_pool_kernel(w2t_ref, vals_ref, wts_ref, r_ref, out_ref,
                        *, mm_dtype):
    w = pl.program_id(0)
    b = out_ref.shape[1]
    prev_t = w2t_ref[jnp.maximum(w - 1, 0)]
    table_first = jnp.logical_or(w == 0, w2t_ref[w] != prev_t)

    @pl.when(table_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 0)
    for s in range(WINDOW // 128):
        oh = _onehot(iota_b, vals_ref[0, s, :], wts_ref[0, s, :], mm_dtype)
        rs = r_ref[s * 128 : (s + 1) * 128, :].astype(mm_dtype)
        out_ref[0] += jax.lax.dot_general(
            oh, rs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def window_pool(
    plan: StreamPlan,
    r_u: jax.Array,  # [U, d] from stream_rows
    vals_u: jax.Array,
    wts_u: jax.Array,
    w2t: jax.Array,
    *,
    mm_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:  # pooled [T, B, d] float32
    uw = vals_u.shape[0]
    t = len(plan.table_sizes)
    b = plan.batch
    d = r_u.shape[1]
    # same VMEM budget as window_grads (K1): one [b, d] f32 block x2 buffers
    if b * d * 4 * 2 > 10 * 2**20:
        raise ValueError(
            f"window_pool holds one [batch={b}, d={d}] pooled output block "
            "(x2 buffers) in VMEM — too large for this chip; use "
            "fwd_impl='gather' (fused_embedding_bag) at large batch"
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(uw,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda w, w2t: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda w, w2t: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WINDOW, d), lambda w, w2t: (w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, d), lambda w, w2t: (w2t[w], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_window_pool_kernel, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, b, d), jnp.float32),
        interpret=interpret,
    )(w2t, vals_u, wts_u, r_u)


def stream_embedding_fwd(
    plan: StreamPlan,
    table: jax.Array,
    rows_u, vals_u, wts_u, w2t, item_block, item_row0, item_u,
    *,
    mm_dtype=jnp.float32,
    r_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:  # pooled [T, B, d] f32
    """Forward = K3 (stream rows) + K4 (window pool)."""
    r_u = stream_rows(
        plan, table, rows_u, item_block, item_row0, item_u,
        out_dtype=r_dtype, mm_dtype=mm_dtype, interpret=interpret,
    )
    return window_pool(
        plan, r_u, vals_u, wts_u, w2t, mm_dtype=mm_dtype,
        interpret=interpret,
    )
