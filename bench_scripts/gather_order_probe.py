"""Does index ORDER affect XLA gather throughput? random vs sorted vs
block-local-sorted (the U-layout's achievable order) at bench scale.

N = 2.05M rows from a [213k, 128] f32 source (gather_grads' shape).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 2_050_048
SRC = 26 * 8192


def chain(name, idx, src, iters=10):
    def bit(x):
        return (jnp.abs(x.reshape(-1)[0].astype(jnp.float32)) > 1e30
                ).astype(jnp.int32)

    @jax.jit
    def many(idx, src):
        def step(c, _):
            out = jnp.take(src, idx ^ c, axis=0)
            return bit(out) | c, ()

        c, _ = jax.lax.scan(step, jnp.int32(0), None, length=iters)
        return c

    np.asarray(many(idx, src))
    t0 = time.perf_counter()
    np.asarray(many(idx, src))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms  ({dt/N*1e9:5.2f} ns/row)",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((SRC, 128)).astype(np.float32))
    rand = rng.integers(0, SRC, N).astype(np.int32)
    chain("random order", jnp.asarray(rand), src)
    chain("fully sorted", jnp.asarray(np.sort(rand)), src)
    # sorted within 256-slot chunks only (what the U-layout can provide)
    chunked = rand.copy().reshape(-1, 256)
    chunked.sort(axis=1)
    chain("sorted per 256-chunk", jnp.asarray(chunked.reshape(-1)), src)
    # bf16 source
    src16 = src.astype(jnp.bfloat16)
    chain("random order bf16 src", jnp.asarray(rand), src16)


if __name__ == "__main__":
    main()
