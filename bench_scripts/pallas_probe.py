"""Measure Pallas per-row DMA issue rates for gather and scatter-RMW.

XLA's gather costs ~13ns/row and scatter ~44ns/row on v5e (see gather_probe).
Both are issue-rate bound, not bandwidth bound. This probes whether a Pallas
kernel with a tight DMA-issue loop beats those rates — which decides the
design of the fused embedding kernels.

Indices live in HBM and are DMA'd chunk-wise into SMEM scratch (1D blocked
SMEM inputs hit XLA/Mosaic layout-tiling restrictions).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, iters=20, per_row=None):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    pr = f"  {dt/per_row*1e9:7.2f} ns/row" if per_row else ""
    print(f"{name:44s} {dt*1e3:9.3f} ms{pr}")
    return out


# ------------------------------------------------------------------ gather
def _gather_kernel(idx_hbm, table_ref, out_ref, idx_s, sem, rsem):
    c = out_ref.shape[0]
    i = pl.program_id(0)

    idma = pltpu.make_async_copy(idx_hbm.at[pl.ds(i * c, c)], idx_s, sem)
    idma.start()
    idma.wait()

    def issue(k, _):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_s[k], 1), :],
            out_ref.at[pl.ds(k, 1), :],
            rsem,
        ).start()
        return 0

    jax.lax.fori_loop(0, c, issue, 0)

    def wait(k, _):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_s[k], 1), :],
            out_ref.at[pl.ds(k, 1), :],
            rsem,
        ).wait()
        return 0

    jax.lax.fori_loop(0, c, wait, 0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def pallas_gather(table, idx, chunk=512):
    n = idx.shape[0]
    d = table.shape[1]
    return pl.pallas_call(
        _gather_kernel,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
    )(idx, table)


# ------------------------------------------------------------- scatter RMW
def _scatter_kernel(idx_hbm, delta_ref, table_in, table_out,
                    idx_s, scratch, sem, rsem):
    c = delta_ref.shape[0]
    i = pl.program_id(0)

    idma = pltpu.make_async_copy(idx_hbm.at[pl.ds(i * c, c)], idx_s, sem)
    idma.start()
    idma.wait()

    def issue_in(k, _):
        pltpu.make_async_copy(
            table_in.at[pl.ds(idx_s[k], 1), :],
            scratch.at[pl.ds(k, 1), :],
            rsem,
        ).start()
        return 0

    jax.lax.fori_loop(0, c, issue_in, 0)

    def wait_in(k, _):
        pltpu.make_async_copy(
            table_in.at[pl.ds(idx_s[k], 1), :],
            scratch.at[pl.ds(k, 1), :],
            rsem,
        ).wait()
        return 0

    jax.lax.fori_loop(0, c, wait_in, 0)

    scratch[:] = scratch[:] + delta_ref[:]

    def issue_out(k, _):
        pltpu.make_async_copy(
            scratch.at[pl.ds(k, 1), :],
            table_out.at[pl.ds(idx_s[k], 1), :],
            rsem,
        ).start()
        return 0

    jax.lax.fori_loop(0, c, issue_out, 0)

    def wait_out(k, _):
        pltpu.make_async_copy(
            scratch.at[pl.ds(k, 1), :],
            table_out.at[pl.ds(idx_s[k], 1), :],
            rsem,
        ).wait()
        return 0

    jax.lax.fori_loop(0, c, wait_out, 0)


@functools.partial(jax.jit, static_argnames=("chunk",), donate_argnums=(0,))
def pallas_scatter_add(table, idx, delta, chunk=512):
    n = idx.shape[0]
    d = table.shape[1]
    return pl.pallas_call(
        _scatter_kernel,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((chunk, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, delta, table)


def main():
    print("devices:", jax.devices())
    rows_total = 26 * 200_000
    d = 128
    n = 26 * 2048 * 8  # 425,984 — multiple of 512

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (rows_total, d), jnp.float32)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, rows_total, size=(n,)), jnp.int32)
    idx_unique = jnp.asarray(rng.permutation(rows_total)[:n].astype(np.int32))
    delta = jax.random.normal(key, (n, d), jnp.float32)

    ref = jnp.take(table, idx, axis=0)
    for chunk in (1024, 2048):
        out = timeit(
            f"pallas gather chunk={chunk}",
            functools.partial(pallas_gather, chunk=chunk),
            table, idx, per_row=n,
        )
        assert jnp.allclose(out, ref), f"gather mismatch chunk={chunk}"

    expect = table.at[idx_unique].add(
        delta, indices_are_sorted=False, unique_indices=True
    )
    for chunk in (1024,):
        got = pallas_scatter_add(table.copy(), idx_unique, delta, chunk=chunk)
        assert jnp.allclose(got, expect), f"scatter mismatch chunk={chunk}"
        t = table.copy()
        t = jax.block_until_ready(
            pallas_scatter_add(t, idx_unique, delta, chunk=chunk)
        )
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            t = pallas_scatter_add(t, idx_unique, delta, chunk=chunk)
        jax.block_until_ready(t)
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{f'pallas scatter-RMW chunk={chunk}':44s} {dt*1e3:9.3f} ms"
            f"  {dt/n*1e9:7.2f} ns/row"
        )


if __name__ == "__main__":
    main()
