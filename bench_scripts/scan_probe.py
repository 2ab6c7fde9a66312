"""Trustworthy op timings on the tunneled TPU.

Rules learned the hard way:
  * iterate inside ONE lax.scan (back-to-back python calls with identical
    args can be deduped/pipelined by the relay);
  * the carry must REALLY feed the next iteration (xor indices with a
    runtime-0 bit derived from the previous output — nothing multiplies
    by zero, so XLA cannot fold it);
  * calibrate against ops with known physics (2.6 GB copy at ~819 GB/s)
    before believing anything.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 10


def scan_time(name, body, carry0, *consts, per_row=None, iters=ITERS,
              bytes_moved=None):
    @jax.jit
    def many(c, *cs):
        def step(c, _):
            return body(c, *cs), ()

        c, _ = jax.lax.scan(step, c, None, length=iters)
        return c

    def fetch(c):
        # only a host transfer truly forces execution on this backend
        leaf = jax.tree_util.tree_leaves(c)[0]
        return np.asarray(leaf.reshape(-1)[0])

    c = many(carry0, *consts)
    fetch(c)
    t0 = time.perf_counter()
    c = many(c, *consts)
    fetch(c)
    dt = (time.perf_counter() - t0) / iters
    pr = f"  {dt/per_row*1e9:7.2f} ns/row" if per_row else ""
    bw = f"  {bytes_moved/dt/1e9:7.1f} GB/s" if bytes_moved else ""
    print(f"{name:46s} {dt*1e3:9.3f} ms{pr}{bw}", flush=True)
    return dt


def bit(x):
    """Runtime 0/1 derived from a float — opaque to the compiler."""
    return (jnp.abs(x) > 1e30).astype(jnp.int32)


# --------------------------------------------------------------- pallas ops
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


def pallas_gather(table, idx, chunk=1024):
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


def main():
    print("devices:", jax.devices(), flush=True)
    rows_total = 26 * 200_000
    d = 128
    n = 26 * 2048 * 8
    tb = rows_total * d * 4

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (rows_total, d), jnp.float32)
    table_bf = table.astype(jnp.bfloat16)
    rng = np.random.default_rng(0)
    # even indices so idx^1 stays in range
    idx0 = jnp.asarray(
        (rng.integers(0, rows_total // 2 - 1, size=(n,)) * 2), jnp.int32
    )
    idx_sorted = jnp.sort(idx0)
    g = jax.random.normal(key, (n, d), jnp.float32) * 1e-6

    # ---- physics calibration: full-array copy ~ 2 x 2.66 GB at ~819 GB/s
    scan_time(
        "CAL copy 2.66GB (read+write)",
        lambda t: t + 1.0,
        table, bytes_moved=2 * tb,
    )

    # ---- XLA gather (chained via xor bit)
    scan_time(
        "xla gather random fp32",
        lambda c, t, i: jnp.take(t, i ^ bit(c[0, 0]), axis=0),
        jnp.take(table, idx0, axis=0), table, idx0, per_row=n,
    )
    scan_time(
        "xla gather random bf16",
        lambda c, t, i: jnp.take(t, i ^ bit(c[0, 0].astype(jnp.float32)),
                                 axis=0),
        jnp.take(table_bf, idx0, axis=0), table_bf, idx0, per_row=n,
    )
    idx2 = idx0.reshape(n // 8, 8)
    scan_time(
        "xla gather+pool fp32",
        lambda c, t, i: jnp.sum(
            jnp.take(t, i ^ bit(c[0, 0]), axis=0), axis=1
        ),
        jnp.sum(jnp.take(table, idx2, axis=0), axis=1), table, idx2,
        per_row=n,
    )
    # ---- XLA scatter-add, table carried
    scan_time(
        "xla scatter-add sorted+unique",
        lambda t, i, gg: t.at[i ^ bit(t[0, 0])].add(
            gg, indices_are_sorted=True, unique_indices=True
        ),
        table, idx_sorted, g, per_row=n,
    )
    # ---- sort
    hit = jnp.arange(n, dtype=jnp.int32)
    scan_time(
        "sort_key_val 425k (carried keys)",
        lambda kv, h: (jax.lax.sort_key_val(kv[0] ^ bit(kv[1][0] + 0.5), h)[0], kv[1]),
        (idx0, jnp.zeros((n,), jnp.float32)), hit,
    )
    # batched per-table sort 26 x 16384
    keys_t = idx0.reshape(26, 16384)
    scan_time(
        "batched sort 26x16k (vmapped)",
        lambda kv, h: (jax.vmap(jax.lax.sort_key_val)(
            kv[0] ^ bit(kv[1][0, 0] + 0.5), h
        )[0], kv[1]),
        (keys_t, jnp.zeros((26, 16384), jnp.float32)),
        hit.reshape(26, 16384),
    )

    # ---- pallas gather
    for chunk in (1024, 2048):
        scan_time(
            f"pallas gather chunk={chunk}",
            lambda c, t, i, ch=chunk: pallas_gather(
                t, i ^ bit(c[0, 0]), chunk=ch
            ),
            jnp.take(table, idx0, axis=0), table, idx0, per_row=n,
        )

    out = jax.jit(pallas_gather, static_argnames=("chunk",))(
        table, idx0, chunk=1024
    )
    ref = jnp.take(table, idx0, axis=0)
    assert jnp.allclose(out, ref), "pallas gather mismatch"
    print("pallas gather correct", flush=True)


if __name__ == "__main__":
    main()
