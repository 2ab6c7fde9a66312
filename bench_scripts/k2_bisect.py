"""Bisect the K2 stream_update pathology (34.9s vs K3's 13.9ms).

Variants at bench scale, 3 iters each:
  V1 sgd baseline (conditional write, lr SMEM, gsum, DMAs, matmul)
  V2 sgd unconditional write
  V3 sgd no-DMA no-matmul (I/O skeleton only, conditional write)
  V4 sgd no-DMA no-matmul, unconditional write
  V5 rws baseline
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlrm_tpu.ops.stream_plan import CHUNK, WINDOW, build_stream_work, make_stream_plan
from dlrm_tpu.ops.stream_kernels import _onehot, _flags, _rows2d_padded


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0]


def make_sgd_kernel(cond_write, do_dma, do_matmul, br):
    def kernel(ib_ref, ir_ref, iu_ref, g_hbm, rows_hbm, table_ref, lr_ref,
               out_ref, gsum, rows_scr, gscr, sem_r, sem_g):
        g = pl.program_id(0)
        first, last = _flags(ib_ref, g)
        if do_dma:
            u = iu_ref[g]
            row0 = ir_ref[g]
            rtile = (u // WINDOW) * 8
            dma_r = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(rtile, 16), :], rows_scr, sem_r)
            dma_g = pltpu.make_async_copy(
                g_hbm.at[pl.ds(u, CHUNK), :], gscr, sem_g)
            dma_r.start()
            dma_g.start()

            @pl.when(first)
            def _():
                gsum[:] = jnp.zeros_like(gsum)

            dma_r.wait()
            dma_g.wait()
            if do_matmul:
                off = u // 128 - rtile
                local = rows_scr[pl.ds(off, CHUNK // 128), :] - row0
                iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 0)
                for s in range(CHUNK // 128):
                    oh = _onehot(iota_r, local[s, :], None, jnp.float32)
                    gs = gscr[s * 128:(s + 1) * 128, :]
                    gsum[:] += jax.lax.dot_general(
                        oh, gs, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        def write():
            out_ref[:] = (
                table_ref[:] - lr_ref[0, 0] * gsum[:]
            ).astype(out_ref.dtype)

        if cond_write:
            pl.when(last)(write)
        else:
            write()

    return kernel


def make_sgd_manual_out(do_dma, do_matmul, br):
    """V5: table in via blocked spec (fast, K3-proven); OUT via pl.ANY +
    manual per-block DMA at `last` (avoids the pathological blocked dynamic
    output)."""

    def kernel(ib_ref, ir_ref, iu_ref, g_hbm, rows_hbm, table_ref, lr_ref,
               out_hbm, gsum, rows_scr, gscr, upd, sem_r, sem_g, sem_w):
        g = pl.program_id(0)
        first, last = _flags(ib_ref, g)
        if do_dma:
            u = iu_ref[g]
            row0 = ir_ref[g]
            rtile = (u // WINDOW) * 8
            dma_r = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(rtile, 16), :], rows_scr, sem_r)
            dma_g = pltpu.make_async_copy(
                g_hbm.at[pl.ds(u, CHUNK), :], gscr, sem_g)
            dma_r.start()
            dma_g.start()

            @pl.when(first)
            def _():
                gsum[:] = jnp.zeros_like(gsum)

            dma_r.wait()
            dma_g.wait()
            if do_matmul:
                off = u // 128 - rtile
                local = rows_scr[pl.ds(off, CHUNK // 128), :] - row0
                iota_r = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 0)
                for s in range(CHUNK // 128):
                    oh = _onehot(iota_r, local[s, :], None, jnp.float32)
                    gs = gscr[s * 128:(s + 1) * 128, :]
                    gsum[:] += jax.lax.dot_general(
                        oh, gs, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        @pl.when(last)
        def _():
            blk = ib_ref[g]
            upd[:] = (
                table_ref[:] - lr_ref[0, 0] * gsum[:]
            ).astype(upd.dtype)
            dma_w = pltpu.make_async_copy(
                upd, out_hbm.at[pl.ds(blk * br, br), :], sem_w)
            dma_w.start()
            dma_w.wait()

    return kernel


def run_variant_manual(name, kernel, plan, table, g_u, rows2d, ib, ir, iu,
                       iters=3):
    br = plan.block_rows
    d = table.shape[1]
    m = ib.shape[0]
    print(f"[{time.strftime('%H:%M:%S')}] {name}: building (m={m})",
          flush=True)
    lr_arr = jnp.full((1, 1), 0.01, jnp.float32)
    table_spec = pl.BlockSpec((br, d), lambda g, ibb, irr, iuu: (ibb[g], 0),
                              memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(m,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      table_spec,
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((br, d), jnp.float32),
                pltpu.VMEM((16, 128), jnp.int32),
                pltpu.VMEM((CHUNK, d), jnp.float32),
                pltpu.VMEM((br, d), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def many(t, ib, ir, iu, g_u, rows2d, lr_arr):
        def step(t, _):
            return call(ib, ir, iu, g_u, rows2d, t, lr_arr), ()

        t, _ = jax.lax.scan(step, t, None, length=iters)
        return t

    t0 = time.perf_counter()
    out = many(table, ib, ir, iu, g_u, rows2d, lr_arr)
    fetch(out)
    print(f"[{time.strftime('%H:%M:%S')}] {name}: compile+first "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    fetch(many(out, ib, ir, iu, g_u, rows2d, lr_arr))
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:10.2f} ms",
          flush=True)


def run_variant(name, kernel, plan, table, g_u, rows2d, ib, ir, iu, iters=3):
    br = plan.block_rows
    d = table.shape[1]
    m = ib.shape[0]
    print(f"[{time.strftime('%H:%M:%S')}] {name}: building (m={m})", flush=True)
    lr_arr = jnp.full((1, 1), 0.01, jnp.float32)
    table_spec = pl.BlockSpec((br, d), lambda g, ibb, irr, iuu: (ibb[g], 0),
                              memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(m,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      table_spec,
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=table_spec,
            scratch_shapes=[
                pltpu.VMEM((br, d), jnp.float32),
                pltpu.VMEM((16, 128), jnp.int32),
                pltpu.VMEM((CHUNK, d), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
    )

    @jax.jit
    def many(t, ib, ir, iu, g_u, rows2d, lr_arr):
        def step(t, _):
            return call(ib, ir, iu, g_u, rows2d, t, lr_arr), ()

        t, _ = jax.lax.scan(step, t, None, length=iters)
        return t

    t0 = time.perf_counter()
    out = many(table, ib, ir, iu, g_u, rows2d, lr_arr)
    fetch(out)
    print(f"[{time.strftime('%H:%M:%S')}] {name}: compile+first "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    fetch(many(out, ib, ir, iu, g_u, rows2d, lr_arr))
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:10.2f} ms",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    tables_n = tuple([200_000] * 26)
    d, b, h, br = 128, 2048, 8, 2048
    rng = np.random.default_rng(0)
    plan = make_stream_plan(tables_n, d, b, h, block_rows=br)
    idx = rng.integers(0, 200_000, (26, b, h)).astype(np.int32)
    work = build_stream_work(plan, idx)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (plan.padded_rows, d), jnp.float32)
    g_u = jax.random.normal(key, (plan.u_total, d), jnp.float32) * 1e-6
    rows2d = _rows2d_padded(jnp.asarray(work.rows_u))
    ib = jnp.asarray(work.item_block)
    ir = jnp.asarray(work.item_row0)
    iu = jnp.asarray(work.item_u)

    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "V4"
    variants = {
        "V3": ("V3 skeleton cond-write", (True, False, False)),
        "V4": ("V4 skeleton uncond-write", (False, False, False)),
        "V2": ("V2 sgd uncond-write", (False, True, True)),
        "V1": ("V1 sgd baseline cond-write", (True, True, True)),
    }
    manual = {
        "V5": ("V5 manual-out skeleton", (False, False)),
        "V6": ("V6 manual-out full sgd", (True, True)),
    }
    for v in which.split(","):
        if v in manual:
            name, flags = manual[v]
            run_variant_manual(name, make_sgd_manual_out(*flags, br),
                               plan, table, g_u, rows2d, ib, ir, iu)
        else:
            name, flags = variants[v]
            run_variant(name, make_sgd_kernel(*flags, br),
                        plan, table, g_u, rows2d, ib, ir, iu)


if __name__ == "__main__":
    main()
