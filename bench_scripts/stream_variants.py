"""T5 follow-up: find a fast streaming formulation.

Variants: (a) no aliasing (separate output buffer), (b) aliasing + jit
donation, (c) no aliasing + donation at jit level.
Also re-probe T1 (VMEM take) with alternate index shapes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 26 * 200_000 // 2048 * 2048
D = 128
BR = 2048


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0]


def kernel(tin_ref, tout_ref):
    tout_ref[:] = tin_ref[:] * 1.000001 + 0.5


def make_stream(alias, donate):
    def stream(t):
        return pl.pallas_call(
            kernel,
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((BR, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((BR, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
            **({"input_output_aliases": {0: 0}} if alias else {}),
        )(t)

    return jax.jit(stream, donate_argnums=(0,) if donate else ())


def time_stream(name, fn, iters=5):
    t = jax.random.normal(jax.random.PRNGKey(0), (R, D), jnp.float32)
    t = fn(t)
    fetch(t)
    t0 = time.perf_counter()
    for _ in range(iters):
        t = fn(t)
    fetch(t)
    dt = (time.perf_counter() - t0) / iters
    nb = R * D * 4 * 2
    print(f"{name:38s} {dt*1e3:9.2f} ms = {nb/dt/1e9:6.0f} GB/s", flush=True)


def t1_variants():
    B, d = 256, 128

    # v1: indices as (8,128) grid matching data sublane/lane structure
    def k1(dly_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(dly_ref[:], idx_ref[:], axis=0)

    rng = np.random.default_rng(0)
    dly = jax.random.normal(jax.random.PRNGKey(0), (B, d))
    idx2 = jnp.asarray(rng.integers(0, B, (8, 128)), jnp.int32)
    try:
        out = pl.pallas_call(
            k1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128, d), jnp.float32),
        )(dly, idx2)
        ref = jnp.take(dly, idx2, axis=0)
        ok = np.allclose(np.asarray(out), np.asarray(ref))
        print(f"T1v1 take 2D idx: {'OK' if ok else 'WRONG'}", flush=True)
    except Exception as e:
        print(f"T1v1 take 2D idx: FAIL — {str(e).splitlines()[0][:160]}",
              flush=True)

    # v2: one row of indices, data laid out [d, B] and gather along lanes
    def k2(dlyT_ref, idx_ref, out_ref):
        # dlyT [d(sublanes...), B(lanes)] gather lanes by idx[lane]
        out_ref[:] = jnp.take(dlyT_ref[:], idx_ref[0], axis=1)

    dlyT = dly.T  # [128, 256]
    idx1 = idx2[:1]  # [1, 128]
    try:
        out = pl.pallas_call(
            k2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d, 128), jnp.float32),
        )(dlyT, idx1)
        ref = jnp.take(dlyT, idx1[0], axis=1)
        ok = np.allclose(np.asarray(out), np.asarray(ref))
        print(f"T1v2 take lanes: {'OK' if ok else 'WRONG'}", flush=True)
    except Exception as e:
        print(f"T1v2 take lanes: FAIL — {str(e).splitlines()[0][:160]}",
              flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    t1_variants()
    time_stream("stream no-alias no-donate", make_stream(False, False))
    time_stream("stream no-alias donate", make_stream(False, True))
    time_stream("stream alias donate", make_stream(True, True))
