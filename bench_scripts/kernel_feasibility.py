"""Feasibility probes for the streamed fused-update kernel's building blocks.

Each test compiles+runs a tiny Pallas kernel on the real chip and prints
OK/FAIL — deciding which formulation the production kernel uses:
  T1  jnp.take gather from a VMEM block by an int32 vector
  T2  dot_general with TWO contracting dims (no reshape one-hot path)
  T3  int32 reshape (8,128)->(1024,) inside a kernel
  T4  one-hot build + plain matmul on MXU inside a kernel
  T5  streamed aliased block copy at 2.66 GB scale (pipelined, in-place) + BW
  T6  revolving accumulation: out block written across multi-step runs
"""

import functools
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        fn()
        print(f"{name}: OK", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL — {msg}", flush=True)


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0]


# T1: VMEM gather via jnp.take
def t1():
    def kernel(dly_ref, idx_ref, out_ref):
        idx = idx_ref[0]  # [128] int32 row of the (8,128) block
        out_ref[:] = jnp.take(dly_ref[:], idx, axis=0)

    B, d, cap = 256, 128, 128
    dly = jax.random.normal(jax.random.PRNGKey(0), (B, d))
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, B, (8, cap)), jnp.int32
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cap, d), jnp.float32),
    )(dly, idx)
    ref = jnp.take(dly, idx[0], axis=0)
    assert np.allclose(np.asarray(out), np.asarray(ref)), "T1 mismatch"


# T2: dot_general with two contracting dims
def t2():
    def kernel(a_ref, b_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a = jax.random.normal(jax.random.PRNGKey(0), (8, 128, 256))
    b = jax.random.normal(jax.random.PRNGKey(1), (8, 128, 128))
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(a, b)
    ref = jnp.einsum("slr,sld->rd", a, b)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3), "T2 mism"


# T3: int32 reshape (8,128)->(1024,) then use as gather indices shape
def t3():
    def kernel(x_ref, out_ref):
        flat = x_ref[:].reshape(8 * 128)
        out_ref[:] = flat.reshape(8, 128) + 1

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(x)
    assert np.array_equal(np.asarray(out), np.asarray(x) + 1), "T3 mismatch"


# T4: one-hot build + matmul: oh[cap, rows] = (idx[:,None]==iota), Gsum=oh^T @ G
def t4():
    cap, rows, d = 256, 512, 128

    def kernel(idx_ref, g_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (cap, rows), 1)
        oh = (idx_ref[:].reshape(cap, 1) == iota).astype(jnp.float32)
        out_ref[:] = jax.lax.dot_general(
            oh, g_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, rows, (cap, 1)), jnp.int32)
    g = jax.random.normal(jax.random.PRNGKey(0), (cap, d))
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), jnp.float32),
    )(idx, g)
    oh = jax.nn.one_hot(idx[:, 0], rows, dtype=jnp.float32)
    ref = oh.T @ g
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4), "T4 mism"


# T5: streamed aliased in-place block update at full scale, measure BW
def t5():
    R, d, br = 26 * 200_000 // 2048 * 2048, 128, 2048

    def kernel(tin_ref, tout_ref):
        tout_ref[:] = tin_ref[:] * 1.000001 + 0.5

    @jax.jit
    def stream(t):
        return pl.pallas_call(
            kernel,
            grid=(R // br,),
            in_specs=[
                pl.BlockSpec((br, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((br, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, d), jnp.float32),
            input_output_aliases={0: 0},
        )(t)

    t = jax.random.normal(jax.random.PRNGKey(0), (R, d), jnp.float32)
    nb = R * d * 4
    t = stream(t)
    fetch(t)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        t = stream(t)
    fetch(t)
    dt = (time.perf_counter() - t0) / iters
    print(f"  T5 stream {nb*2/1e9:.2f} GB r+w: {dt*1e3:.2f} ms "
          f"= {nb*2/dt/1e9:.0f} GB/s", flush=True)


# T6: revolving accumulation — out block index repeats across grid steps
def t6():
    nb, br, d, steps_per_block = 4, 256, 128, 3

    def kernel(x_ref, out_ref):
        g = pl.program_id(0)
        j = g % steps_per_block

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += x_ref[:]

    x = jax.random.normal(
        jax.random.PRNGKey(0), (nb * steps_per_block * br, d)
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb * steps_per_block,),
        in_specs=[
            pl.BlockSpec((br, d), lambda g: (g, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (br, d), lambda g: (g // steps_per_block, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb * br, d), jnp.float32),
    )(x)
    ref = x.reshape(nb, steps_per_block, br, d).sum(axis=1).reshape(nb * br, d)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5), "T6 mism"


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for name, fn in [("T1 vmem take", t1), ("T2 dot 2-contract", t2),
                     ("T3 int reshape", t3), ("T4 onehot matmul", t4),
                     ("T5 aliased stream", t5), ("T6 revolving accum", t6)]:
        run(name, fn)
