"""Probe achievable gather/scatter/sort bandwidth on the local chip.

Answers: how fast can 425k random 512B rows be read/written, what do the
building blocks of the fused sparse update cost, and which formulation of
each is fastest — to set the speed-of-light target for Pallas kernels.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20, bytes_moved=None):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    bw = f"  {bytes_moved/dt/1e9:8.1f} GB/s" if bytes_moved else ""
    print(f"{name:46s} {dt*1e3:9.3f} ms{bw}")
    return dt


def main():
    print("devices:", jax.devices())
    rows_total = 26 * 200_000
    d = 128
    n = 26 * 2048 * 8  # 425,984 lookups

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (rows_total, d), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, rows_total, size=(n,)), jnp.int32
    )
    idx_sorted = jnp.sort(idx)
    idx_contig = jnp.arange(n, dtype=jnp.int32)
    g = jax.random.normal(key, (n, d), jnp.float32)

    nbytes = n * d * 4

    # ---------- gathers
    timeit("gather random rows (take)", jax.jit(lambda t: jnp.take(t, idx, axis=0)),
           table, bytes_moved=2 * nbytes)
    timeit("gather sorted rows", jax.jit(lambda t: jnp.take(t, idx_sorted, axis=0)),
           table, bytes_moved=2 * nbytes)
    timeit("gather contiguous rows", jax.jit(lambda t: jnp.take(t, idx_contig, axis=0)),
           table, bytes_moved=2 * nbytes)
    timeit("gather random bf16", jax.jit(lambda t: jnp.take(t, idx, axis=0)),
           table.astype(jnp.bfloat16), bytes_moved=nbytes)
    # gather + reduce fused? [n//8, 8, d] -> sum
    idx2 = idx.reshape(n // 8, 8)
    timeit("gather random + pool (take+sum)",
           jax.jit(lambda t: jnp.sum(jnp.take(t, idx2, axis=0), axis=1)),
           table, bytes_moved=nbytes + nbytes // 8)

    # ---------- scatters
    timeit("scatter-add random",
           jax.jit(lambda t: t.at[idx].add(g)), table, bytes_moved=3 * nbytes)
    timeit("scatter-add sorted+unique hints",
           jax.jit(lambda t: t.at[idx_sorted].add(
               g, indices_are_sorted=True, unique_indices=True)),
           table, bytes_moved=3 * nbytes)
    timeit("scatter-add contiguous sorted+unique",
           jax.jit(lambda t: t.at[idx_contig].add(
               g, indices_are_sorted=True, unique_indices=True)),
           table, bytes_moved=3 * nbytes)
    timeit("scatter-SET contiguous",
           jax.jit(lambda t: t.at[idx_contig].set(
               g, indices_are_sorted=True, unique_indices=True)),
           table, bytes_moved=2 * nbytes)
    timeit("scatter-SET random sorted+unique",
           jax.jit(lambda t: t.at[idx_sorted].set(
               g, indices_are_sorted=True, unique_indices=True)),
           table, bytes_moved=2 * nbytes)

    # ---------- sort / segsum building blocks
    hit = jnp.arange(n, dtype=jnp.int32)
    timeit("sort_key_val int32 x int32 (425k)",
           jax.jit(lambda k: jax.lax.sort_key_val(k, hit)), idx)
    seg = jnp.cumsum(jnp.ones((n,), jnp.int32)) - 1
    timeit("segment_sum [n,128] sorted ids",
           jax.jit(lambda x: jax.ops.segment_sum(
               x, seg, num_segments=n, indices_are_sorted=True)),
           g, bytes_moved=3 * nbytes)
    # cumsum-based dedup-sum alternative: cumsum over [n, d] then gather ends
    timeit("cumsum [n,128] axis0", jax.jit(lambda x: jnp.cumsum(x, axis=0)),
           g, bytes_moved=2 * nbytes)

    # one-hot matmul pooling for ONE 200k table (bf16)
    b, h = 2048, 8
    t1 = table[:200_000].astype(jnp.bfloat16)
    i1 = idx2[:b] % 200_000

    def onehot_pool(t):
        oh = jax.nn.one_hot(i1, 200_000, dtype=jnp.bfloat16).sum(axis=1)
        return oh @ t

    timeit("one-hot matmul pool 1 table", jax.jit(onehot_pool), t1)


if __name__ == "__main__":
    main()
