"""Why is the bf16 gather+pool 3x slower than fp32? Probe formulations.

Variants (tables bf16, idx [26,8192,8]):
  v0  take -> sum native dtype (bf16 accumulate)
  v1  take -> sum(dtype=f32) -> cast bf16   (current fused_embedding_bag)
  v2  take -> astype(f32) -> sum -> cast
  v3  take on f32 VIEW?? n/a — take -> sum f32 keepdtype
  f32 reference: fp32 table, sum native
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

T, B, H, D = 26, 8192, 8, 128
N = 200_000


def chain(name, fn, *big, iters=10):
    def bit(x):
        return (jnp.abs(x.reshape(-1)[0].astype(jnp.float32)) > 1e30
                ).astype(jnp.int32)

    @jax.jit
    def many(*big):
        def step(c, _):
            out = fn(c, *big)
            return bit(out) | c, ()

        c, _ = jax.lax.scan(step, jnp.int32(0), None, length=iters)
        return c

    np.asarray(many(*big))
    t0 = time.perf_counter()
    np.asarray(many(*big))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, (T, B, H)).astype(np.int32))
    offs = jnp.asarray((np.arange(T) * N).astype(np.int32))
    key = jax.random.PRNGKey(0)
    tab32 = jax.random.normal(key, (T * N, D), jnp.float32)
    tab16 = tab32.astype(jnp.bfloat16)

    def flat(c):
        return (idx ^ c) + offs[:, None, None]

    chain("f32 take->sum native", lambda c, t: jnp.sum(
        jnp.take(t, flat(c), axis=0), axis=2), tab32)
    chain("bf16 take->sum native", lambda c, t: jnp.sum(
        jnp.take(t, flat(c), axis=0), axis=2), tab16)
    chain("bf16 take->sum(dtype=f32)", lambda c, t: jnp.sum(
        jnp.take(t, flat(c), axis=0), axis=2, dtype=jnp.float32
    ).astype(jnp.bfloat16), tab16)
    chain("bf16 take->astype f32->sum", lambda c, t: jnp.sum(
        jnp.take(t, flat(c), axis=0).astype(jnp.float32), axis=2
    ).astype(jnp.bfloat16), tab16)
    chain("f32 take->sum(dtype=f32)", lambda c, t: jnp.sum(
        jnp.take(t, flat(c), axis=0), axis=2, dtype=jnp.float32), tab32)


if __name__ == "__main__":
    main()
