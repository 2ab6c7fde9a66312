"""Isolate the blocked-pipeline pathology (k2_bisect V4: 8.9ms/grid-step).

Toy kernel: out[blk] = table[blk] + 1 over a grid with ONE item per block.
Variants:
  S  static identity map (g, 0)            — baseline Mosaic pipeline
  D  dynamic map ib[g] (scalar prefetch), ib = iota (same access pattern)
  M  dynamic IN + manual DMA OUT (pl.ANY)
  N  static IN + manual DMA OUT (pl.ANY)
If S is fast and D is slow, data-dependent index maps kill pipelining.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
BR = int(os.environ.get("BR", 2048))
NBLK = int(os.environ.get("NBLK", 1024))
D_ = 128


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0]


def build(variant):
    if variant == "E":
        # whole-array elementwise: XLA's overlapped-DMA ceiling (~412 GB/s
        # aggregate measured r4) in this harness's units
        def call_e(ib, t):
            return t + 1.0

        return call_e
    if variant == "X":
        # pure-XLA revolve (VERDICT r4 next-round #4): fori_loop of
        # dynamic_slice -> +1 -> dynamic_update_slice over the same
        # dynamic block walk as D/M. Tests whether XLA's loop lowering
        # overlaps the read and write streams (like its elementwise path)
        # where Pallas manual DMAs do not (~205 GB/s/dir, PERF_NOTES r4).
        def call_x(ib, t):
            def body(g, t):
                off = ib[g] * BR
                sl = jax.lax.dynamic_slice(t, (off, 0), (BR, D_))
                return jax.lax.dynamic_update_slice(t, sl + 1.0, (off, 0))

            return jax.lax.fori_loop(0, NBLK, body, t)

        return call_x
    blocked_dyn = pl.BlockSpec((BR, D_), lambda g, ib: (ib[g], 0),
                               memory_space=pltpu.VMEM)
    blocked_static = pl.BlockSpec((BR, D_), lambda g, ib: (g, 0),
                                  memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    if variant in ("S", "D"):
        def kernel(ib_ref, t_ref, o_ref):
            o_ref[:] = t_ref[:] + 1.0

        in_spec = blocked_static if variant == "S" else blocked_dyn
        out_spec = in_spec
        scratch = []
    else:
        def kernel(ib_ref, t_ref, o_hbm, upd, sem):
            g = pl.program_id(0)
            blk = ib_ref[g]
            upd[:] = t_ref[:] + 1.0
            dma = pltpu.make_async_copy(
                upd, o_hbm.at[pl.ds(blk * BR, BR)], sem)
            dma.start()
            dma.wait()

        in_spec = blocked_dyn if variant == "M" else blocked_static
        out_spec = any_spec
        scratch = [pltpu.VMEM((BR, D_), jnp.float32),
                   pltpu.SemaphoreType.DMA]

    if variant == "P":
        # fully manual: double-buffered read-ahead + write-behind.
        # Parity branches are STATICALLY unrolled (dynamic scratch indexing
        # hangs Mosaic).
        def kernel(ib_ref, t_hbm, o_hbm, buf0, buf1, upd0, upd1,
                   sem_r0, sem_r1, sem_w0, sem_w1):
            g = pl.program_id(0)
            n = pl.num_programs(0)

            def read(blk, buf, sem):
                return pltpu.make_async_copy(
                    t_hbm.at[pl.ds(blk * BR, BR)], buf, sem
                )

            def write(blk, upd, sem):
                return pltpu.make_async_copy(
                    upd, o_hbm.at[pl.ds(blk * BR, BR)], sem
                )

            @pl.when(g == 0)
            def _():
                read(0, buf0, sem_r0).start()
                read(1, buf1, sem_r1).start()

            def body(buf, upd, sem_r, sem_w):
                read(g, buf, sem_r).wait()

                @pl.when(g >= 2)
                def _():
                    write(g - 2, upd, sem_w).wait()

                upd[:] = buf[:] + 1.0
                write(g, upd, sem_w).start()

                @pl.when(g + 2 < n)
                def _():
                    read(g + 2, buf, sem_r).start()

            even = jax.lax.rem(g, 2) == 0
            pl.when(even)(lambda: body(buf0, upd0, sem_r0, sem_w0))
            pl.when(jnp.logical_not(even))(
                lambda: body(buf1, upd1, sem_r1, sem_w1))

            @pl.when(g == n - 1)
            def _():
                pl.when(even)(lambda: write(g, upd0, sem_w0).wait())
                pl.when(jnp.logical_not(even))(
                    lambda: write(g, upd1, sem_w1).wait())

                @pl.when(even)
                def _():
                    write(g - 1, upd1, sem_w1).wait()

                @pl.when(jnp.logical_not(even))
                def _():
                    write(g - 1, upd0, sem_w0).wait()

        in_spec = any_spec
        out_spec = any_spec
        scratch = [pltpu.VMEM((BR, D_), jnp.float32),
                   pltpu.VMEM((BR, D_), jnp.float32),
                   pltpu.VMEM((BR, D_), jnp.float32),
                   pltpu.VMEM((BR, D_), jnp.float32),
                   pltpu.SemaphoreType.DMA,
                   pltpu.SemaphoreType.DMA,
                   pltpu.SemaphoreType.DMA,
                   pltpu.SemaphoreType.DMA]

    if variant == "Q":
        # fully manual DEPTH-4 read-ahead + write-behind-4 (P is depth-2):
        # tests whether the ~205 GB/s Pallas revolve floor is outstanding-DMA
        # depth. Requires NBLK % 4 == 0. Phase branches statically unrolled.
        DEPTH = 4

        def kernel(ib_ref, t_hbm, o_hbm, *scr):
            bufs = scr[0:DEPTH]
            upds = scr[DEPTH : 2 * DEPTH]
            sem_r = scr[2 * DEPTH : 3 * DEPTH]
            sem_w = scr[3 * DEPTH : 4 * DEPTH]
            g = pl.program_id(0)
            n = pl.num_programs(0)

            def read(blk, buf, sem):
                return pltpu.make_async_copy(
                    t_hbm.at[pl.ds(blk * BR, BR)], buf, sem
                )

            def write(blk, upd, sem):
                return pltpu.make_async_copy(
                    upd, o_hbm.at[pl.ds(blk * BR, BR)], sem
                )

            @pl.when(g == 0)
            def _():
                for q in range(DEPTH):
                    read(q, bufs[q], sem_r[q]).start()

            def body(p):
                read(g, bufs[p], sem_r[p]).wait()

                @pl.when(g >= DEPTH)
                def _():
                    write(g - DEPTH, upds[p], sem_w[p]).wait()

                upds[p][:] = bufs[p][:] + 1.0
                write(g, upds[p], sem_w[p]).start()

                @pl.when(g + DEPTH < n)
                def _():
                    read(g + DEPTH, bufs[p], sem_r[p]).start()

            phase = jax.lax.rem(g, DEPTH)
            for q in range(DEPTH):
                pl.when(phase == q)(lambda q=q: body(q))

            @pl.when(g == n - 1)
            def _():
                # drain: the last DEPTH writes (one per phase) are in flight
                for q in range(DEPTH):
                    write(g, upds[q], sem_w[q]).wait()

        in_spec = any_spec
        out_spec = any_spec
        scratch = (
            [pltpu.VMEM((BR, D_), jnp.float32) for _ in range(2 * DEPTH)]
            + [pltpu.SemaphoreType.DMA for _ in range(2 * DEPTH)]
        )

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NBLK,),
            in_specs=[in_spec],
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((NBLK * BR, D_), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


ITERS = 8


def main():
    print("devices:", jax.devices(), flush=True)
    table = jnp.ones((NBLK * BR, D_), jnp.float32)
    ib = jnp.arange(NBLK, dtype=jnp.int32)
    for variant in sys.argv[1].split(","):
        call = build(variant)

        @jax.jit
        def fn(ib, t):
            def step(t, _):
                return call(ib, t), ()

            t, _ = jax.lax.scan(step, t, None, length=ITERS)
            return t[0, 0]  # scalar: nothing big crosses the tunnel

        t0 = time.perf_counter()
        fetch(fn(ib, table))
        print(f"[{time.strftime('%H:%M:%S')}] {variant}: compile+first "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        fetch(fn(ib, table))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{variant}: {dt*1e3:9.2f} ms/iter  "
              f"({dt/NBLK*1e6:7.1f} us/blk, "
              f"{2*NBLK*BR*D_*4/dt/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
