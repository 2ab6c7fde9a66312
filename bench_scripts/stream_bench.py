"""On-chip validation + timing of the streamed U-layout kernels.

Phase 1: small config — numeric parity vs the XLA paths ON THE REAL TPU.
Phase 2: bench config (26x200k, d=128, B=2048, H=8) — per-kernel timing with
         chained dependencies (the relay dedupes identical dispatches).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlrm_tpu.ops.embedding import fused_embedding_bag, stack_tables
from dlrm_tpu.ops.sparse_update import (
    coalesce_hits,
    rowwise_adagrad_from_coalesced,
)
from dlrm_tpu.ops.stream_kernels import (
    stream_embedding_fwd,
    stream_rows,
    stream_update,
    window_grads,
    window_pool,
)
from dlrm_tpu.ops.stream_plan import (
    build_stream_work,
    make_stream_plan,
    stack_tables_padded,
)


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0]


def small_numeric_check():
    print("== phase 1: numeric parity on the real chip ==", flush=True)
    tables_n = (3000, 50, 7000)
    d, b, h, br = 128, 256, 4, 1024
    rng = np.random.default_rng(3)
    plan = make_stream_plan(tables_n, d, b, h, block_rows=br)
    idx = np.stack(
        [rng.integers(0, n, (b, h)) for n in tables_n]
    ).astype(np.int32)
    tables = [rng.normal(size=(n, d)).astype(np.float32) for n in tables_n]
    dly = rng.normal(size=(len(tables_n), b, d)).astype(np.float32)
    work = build_stream_work(plan, idx)
    stacked = jnp.asarray(stack_tables_padded(tables, plan))

    jw = {
        k: jnp.asarray(getattr(work, k))
        for k in ("rows_u", "vals_u", "wts_u", "w2t", "item_block",
                  "item_row0", "item_u")
    }

    # forward
    fwd = jax.jit(functools.partial(stream_embedding_fwd, plan))
    pooled = fwd(stacked, jw["rows_u"], jw["vals_u"], jw["wts_u"],
                 jw["w2t"], jw["item_block"], jw["item_row0"], jw["item_u"])
    st, offs = stack_tables(tables)
    ref = fused_embedding_bag(
        jnp.asarray(st), jnp.asarray(offs), jnp.asarray(idx),
        jnp.asarray(np.ones_like(idx, np.float32)),
    )
    err = np.abs(
        np.asarray(pooled).transpose(1, 0, 2) - np.asarray(ref)
    ).max()
    print(f"fwd max err: {err:.2e}", flush=True)
    assert err < 5e-2, "stream fwd mismatch on chip"

    # update (rwsadagrad)
    g_u = jax.jit(window_grads)(
        jnp.asarray(dly), jw["vals_u"], jw["wts_u"], jw["w2t"]
    )
    accp = jnp.asarray(
        np.full((plan.acc_rows, 128), 0.02, np.float32)
    )
    upd = jax.jit(functools.partial(stream_update, "rwsadagrad", plan))
    new_table, new_acc = upd(stacked, accp, g_u, jw["rows_u"],
                             jw["item_block"], jw["item_row0"],
                             jw["item_u"], 0.05)
    # oracle on chip via XLA path
    dpooled = jnp.asarray(dly).transpose(1, 0, 2)
    urows, G, valid = coalesce_hits(
        dpooled, jnp.asarray(idx), None, jnp.asarray(offs), st.shape[0]
    )
    acc_flat = jnp.full((st.shape[0],), 0.02, jnp.float32)
    ref_t, ref_a = rowwise_adagrad_from_coalesced(
        jnp.asarray(st), acc_flat, urows, G, valid, 0.05
    )
    new_table = np.asarray(new_table)
    ref_t = np.asarray(ref_t)
    errs = []
    for t, n in enumerate(tables_n):
        got = new_table[plan.padded_offsets[t] : plan.padded_offsets[t] + n]
        want = ref_t[offs[t] : offs[t] + n]
        errs.append(np.abs(got - want).max())
    print(f"update max err per table: {[f'{e:.2e}' for e in errs]}",
          flush=True)
    assert max(errs) < 5e-2, "stream update mismatch on chip"
    print("phase 1 OK", flush=True)


def bench_scale_timing():
    print("== phase 2: bench-scale timing ==", flush=True)
    tables_n = tuple([200_000] * 26)
    d, b, h, br = 128, 2048, 8, 2048
    rng = np.random.default_rng(0)
    plan = make_stream_plan(tables_n, d, b, h, block_rows=br)
    print(f"u_size={plan.u_size} windows={plan.num_windows} "
          f"M={plan.max_items} padded_rows={plan.padded_rows}", flush=True)
    idx = rng.integers(0, 200_000, (26, b, h)).astype(np.int32)

    t0 = time.perf_counter()
    work = build_stream_work(plan, idx)
    t_host = time.perf_counter() - t0
    print(f"host build_stream_work: {t_host*1e3:.1f} ms "
          f"(items {work.num_real_items}/{plan.max_items})", flush=True)

    key = jax.random.PRNGKey(0)
    stacked = jax.random.normal(key, (plan.padded_rows, d), jnp.float32)
    dly = jax.random.normal(key, (26, b, d), jnp.float32)
    accp = jnp.zeros((plan.acc_rows, 128), jnp.float32) + 0.01
    jw = {
        k: jnp.asarray(getattr(work, k))
        for k in ("rows_u", "vals_u", "wts_u", "w2t", "item_block",
                  "item_row0", "item_u")
    }

    def bit(x):
        return (jnp.abs(x) > 1e30).astype(jnp.int32)

    iters = 10

    # K1 chained via vals xor
    @jax.jit
    def k1_many(dly, vals, wts, w2t):
        def step(c, _):
            g = window_grads(dly, vals ^ bit(c), wts, w2t)
            return bit(g[0, 0]), ()

        c, _ = jax.lax.scan(step, jnp.int32(0), None, length=iters)
        return c

    c = k1_many(dly, jw["vals_u"], jw["wts_u"], jw["w2t"])
    fetch(c)
    t0 = time.perf_counter()
    fetch(k1_many(dly, jw["vals_u"], jw["wts_u"], jw["w2t"]))
    print(f"K1 window_grads: {(time.perf_counter()-t0)/iters*1e3:.2f} ms",
          flush=True)

    # K2 chained via carried table+acc
    g_u = jax.jit(window_grads)(dly, jw["vals_u"], jw["wts_u"], jw["w2t"])

    @jax.jit
    def k2_many(table, acc, g_u, rows, ib, ir, iu):
        def step(carry, _):
            t, a = carry
            t, a = stream_update("rwsadagrad", plan, t, a, g_u, rows,
                                 ib, ir, iu, 0.01)
            return (t, a), ()

        (t, a), _ = jax.lax.scan(step, (table, acc), None, length=iters)
        return t[0, 0] + a[0, 0]  # scalar: nothing big crosses the tunnel

    out = k2_many(stacked, accp, g_u, jw["rows_u"], jw["item_block"],
                  jw["item_row0"], jw["item_u"])
    fetch(out)
    t0 = time.perf_counter()
    fetch(k2_many(stacked, accp, g_u, jw["rows_u"], jw["item_block"],
                  jw["item_row0"], jw["item_u"]))
    print(f"K2 stream_update(rwsadagrad): "
          f"{(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)

    # K3+K4 forward chained via item_u xor (bit is runtime-0)
    @jax.jit
    def fwd_many(table, rows, vals, wts, w2t, ib, ir, iu):
        def step(c, _):
            p = stream_embedding_fwd(plan, table, rows ^ c, vals, wts, w2t,
                                     ib, ir, iu)
            return bit(p[0, 0, 0]), ()

        c, _ = jax.lax.scan(step, jnp.int32(0), None, length=iters)
        return c

    args = (stacked, jw["rows_u"], jw["vals_u"], jw["wts_u"], jw["w2t"],
            jw["item_block"], jw["item_row0"], jw["item_u"])
    fetch(fwd_many(*args))
    t0 = time.perf_counter()
    fetch(fwd_many(*args))
    print(f"K3+K4 stream fwd: {(time.perf_counter()-t0)/iters*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    small_numeric_check()
    bench_scale_timing()
