"""Numerical validation of the streamed U-layout kernels (interpret mode).

Oracles: the existing XLA ops (ops/embedding.py fused_embedding_bag) and the
exact sparse-update appliers (ops/sparse_update.py), which are themselves
tested against torch references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlrm_tpu.ops.embedding import fused_embedding_bag
from dlrm_tpu.ops.sparse_update import (
    coalesce,
    rowwise_adagrad_from_coalesced,
    adagrad_from_coalesced,
    sgd_from_coalesced,
)
from dlrm_tpu.ops.stream_plan import (
    StreamPlan,
    build_stream_work,
    make_stream_plan,
    pack_rowwise_accum,
    stack_tables_padded,
    unpack_rowwise_accum,
)
from dlrm_tpu.ops.stream_kernels import (
    gather_grads,
    stream_embedding_fwd,
    stream_update,
    window_grads,
)

TABLES = (300, 50, 700)
D = 128
B = 256  # B*H = 512: exercises multi-chunk block runs
H = 2
BR = 1024  # rwsadagrad packed accumulator needs block_rows >= 1024


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    plan = make_stream_plan(TABLES, D, B, H, block_rows=BR)
    idx = np.stack(
        [rng.integers(0, n, (B, H)) for n in TABLES]
    ).astype(np.int32)
    wt = rng.uniform(0.5, 1.5, size=(len(TABLES), B, H)).astype(np.float32)
    tables = [rng.normal(size=(n, D)).astype(np.float32) for n in TABLES]
    dly = rng.normal(size=(len(TABLES), B, D)).astype(np.float32)
    work = build_stream_work(plan, idx, wt)
    stacked = stack_tables_padded(tables, plan)
    return plan, idx, wt, tables, dly, work, stacked


def _g_u_reference(plan, work, dly):
    """G_u[u] = wt_u[u] * dly[table(u), val(u)]"""
    rows = work.rows_u.reshape(-1)
    vals = work.vals_u.reshape(-1)
    wts = work.wts_u.reshape(-1)
    g = np.zeros((plan.u_total, D), np.float32)
    t_ = len(plan.table_sizes)
    for t in range(t_):
        lo = plan.u_base[t]
        hi = plan.u_base[t + 1] if t + 1 < t_ else plan.u_size
        for u in range(lo, hi):
            if wts[u] != 0.0:
                g[u] = wts[u] * dly[t, vals[u]]
    return g, rows, wts


def test_window_grads(setup):
    plan, idx, wt, tables, dly, work, stacked = setup
    g_u = window_grads(
        jnp.asarray(dly),
        jnp.asarray(work.vals_u),
        jnp.asarray(work.wts_u),
        jnp.asarray(work.w2t),
        interpret=True,
    )
    ref, _, _ = _g_u_reference(plan, work, dly)
    np.testing.assert_allclose(np.asarray(g_u), ref, rtol=1e-6, atol=1e-6)


def test_gather_grads_matches_window_grads(setup):
    plan, idx, wt, tables, dly, work, stacked = setup
    g_u = gather_grads(
        jnp.asarray(dly),
        jnp.asarray(work.vals_u),
        jnp.asarray(work.wts_u),
        jnp.asarray(work.w2t),
    )
    ref, _, _ = _g_u_reference(plan, work, dly)
    np.testing.assert_allclose(np.asarray(g_u), ref, rtol=1e-6, atol=1e-6)


def test_stream_fwd_matches_fused_embedding_bag(setup):
    plan, idx, wt, tables, dly, work, stacked = setup
    pooled = stream_embedding_fwd(
        plan,
        jnp.asarray(stacked),
        jnp.asarray(work.rows_u),
        jnp.asarray(work.vals_u),
        jnp.asarray(work.wts_u),
        jnp.asarray(work.w2t),
        jnp.asarray(work.item_block),
        jnp.asarray(work.item_row0),
        jnp.asarray(work.item_u),
        interpret=True,
    )  # [T, B, d]
    # oracle: the XLA fused path over the UNPADDED stacked layout
    from dlrm_tpu.ops.embedding import stack_tables

    st, offs = stack_tables(tables)
    ref = fused_embedding_bag(
        jnp.asarray(st), jnp.asarray(offs), jnp.asarray(idx), jnp.asarray(wt)
    )  # [B, T, d]
    np.testing.assert_allclose(
        np.asarray(pooled).transpose(1, 0, 2), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )


def _sparse_oracle(optimizer, tables, idx, wt, dly, lr):
    """Exact coalesced sparse update on the UNPADDED stacked layout."""
    from dlrm_tpu.ops.embedding import stack_tables
    from dlrm_tpu.ops.sparse_update import coalesce_hits

    st, offs = stack_tables(tables)
    st = jnp.asarray(st)
    dpooled = jnp.asarray(dly).transpose(1, 0, 2)  # [B, T, d]
    urows, G, valid = coalesce_hits(
        dpooled, jnp.asarray(idx), jnp.asarray(wt), jnp.asarray(offs),
        st.shape[0],
    )
    if optimizer == "sgd":
        return sgd_from_coalesced(st, urows, G, valid, lr), None
    rows_total = st.shape[0]
    if optimizer == "rwsadagrad":
        acc = jnp.full((rows_total,), 0.03, jnp.float32)
        t2, a2 = rowwise_adagrad_from_coalesced(st, acc, urows, G, valid, lr)
        return t2, a2
    acc = jnp.full((rows_total, D), 0.03, jnp.float32)
    t2, a2 = adagrad_from_coalesced(st, acc, urows, G, valid, lr)
    return t2, a2


def _compare_tables(plan, tables, new_stacked, ref_stacked_unpadded):
    from dlrm_tpu.ops.embedding import stack_tables

    _, offs = stack_tables(tables)
    new_stacked = np.asarray(new_stacked)
    ref = np.asarray(ref_stacked_unpadded)
    for t, tab in enumerate(tables):
        n = tab.shape[0]
        got = new_stacked[plan.padded_offsets[t] : plan.padded_offsets[t] + n]
        want = ref[offs[t] : offs[t] + n]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"table {t}")


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad", "adagrad"])
def test_stream_update(setup, optimizer):
    plan, idx, wt, tables, dly, work, stacked = setup
    lr = 0.05
    g_u = window_grads(
        jnp.asarray(dly),
        jnp.asarray(work.vals_u),
        jnp.asarray(work.wts_u),
        jnp.asarray(work.w2t),
        interpret=True,
    )
    if optimizer == "sgd":
        acc = None
    elif optimizer == "rwsadagrad":
        total = sum(TABLES)
        acc_flat = np.full(total, 0.03, np.float32)
        # pack into padded layout: place each table's acc at its padded rows
        accp = np.zeros(plan.padded_rows, np.float32)
        pos = 0
        for t, n in enumerate(TABLES):
            accp[plan.padded_offsets[t] : plan.padded_offsets[t] + n] = (
                acc_flat[pos : pos + n]
            )
            pos += n
        acc = jnp.asarray(accp.reshape(plan.acc_rows, 128))
    else:
        accp = np.zeros((plan.padded_rows, D), np.float32)
        for t, n in enumerate(TABLES):
            accp[plan.padded_offsets[t] : plan.padded_offsets[t] + n] = 0.03
        acc = jnp.asarray(accp)

    out = stream_update(
        optimizer, plan, jnp.asarray(stacked), acc, g_u,
        jnp.asarray(work.rows_u), jnp.asarray(work.item_block),
        jnp.asarray(work.item_row0), jnp.asarray(work.item_u), lr,
        interpret=True,
    )
    new_table = out[0]
    ref_table, ref_acc = _sparse_oracle(optimizer, tables, idx, wt, dly, lr)
    _compare_tables(plan, tables, new_table, ref_table)

    if optimizer == "rwsadagrad":
        new_acc = np.asarray(out[1]).reshape(-1)
        ref_acc = np.asarray(ref_acc)
        from dlrm_tpu.ops.embedding import stack_tables

        _, offs = stack_tables(tables)
        for t, n in enumerate(TABLES):
            got = new_acc[plan.padded_offsets[t] : plan.padded_offsets[t] + n]
            want = ref_acc[offs[t] : offs[t] + n]
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                       err_msg=f"acc table {t}")
    elif optimizer == "adagrad":
        new_acc = np.asarray(out[1])
        ref_acc = np.asarray(ref_acc)
        from dlrm_tpu.ops.embedding import stack_tables

        _, offs = stack_tables(tables)
        for t, n in enumerate(TABLES):
            got = new_acc[plan.padded_offsets[t] : plan.padded_offsets[t] + n]
            want = ref_acc[offs[t] : offs[t] + n]
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                       err_msg=f"acc table {t}")


def test_native_stream_work_matches_numpy():
    """The C++ builder (native/stream_work.cc) emits the same plan as the
    numpy reference: identical item/window arrays, identical per-run slot
    content up to intra-run order (which no kernel depends on)."""
    from dlrm_tpu.native import stream_native
    from dlrm_tpu.ops.stream_plan import build_stream_work

    if not stream_native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    for hot in (H, (2, 1, 2)):  # uniform and ragged per-table hot sizes
        plan = make_stream_plan(TABLES, D, B, hot, block_rows=BR)
        idx = np.stack(
            [rng.integers(0, n, (B, H)) for n in TABLES]
        ).astype(np.int32)
        wt = rng.uniform(0.5, 1.5, size=(len(TABLES), B, H)).astype(
            np.float32
        )
        wn = build_stream_work(plan, idx, wt, prefer_native=True)
        wp = build_stream_work(plan, idx, wt, prefer_native=False)
        _check_work_equal(wn, wp)


def test_flat_layout_build_matches_padded():
    """The flat row-major [B, sum(hot)] input (the materialized multi-hot
    ON-DISK layout, multi_hot_criteo.py:11-20) must build the same
    StreamWork as the padded [T, B, Hmax] layout — numpy AND native paths
    (VERDICT r3 missing #5: the from-disk input path feeds the builder
    directly, no padding expansion)."""
    from dlrm_tpu.native import stream_native
    from dlrm_tpu.ops.stream_plan import build_stream_work

    rng = np.random.default_rng(13)
    hots = (2, 1, 2)
    plan = make_stream_plan(TABLES, D, B, hots, block_rows=BR)
    idx = np.stack(
        [rng.integers(0, n, (B, H)) for n in TABLES]
    ).astype(np.int32)
    wt = rng.uniform(0.5, 1.5, size=(len(TABLES), B, H)).astype(np.float32)
    flat_idx = np.concatenate(
        [idx[t, :, :h] for t, h in enumerate(hots)], axis=1
    )
    flat_wt = np.concatenate(
        [wt[t, :, :h] for t, h in enumerate(hots)], axis=1
    )
    assert flat_idx.shape == (B, sum(hots))
    natives = [False] + ([True] if stream_native.available() else [])
    for nat in natives:
        wp = build_stream_work(plan, idx, wt, prefer_native=nat)
        wf = build_stream_work(plan, flat_idx, flat_wt, prefer_native=nat)
        _check_work_equal(wf, wp)
        # skip_wts flat variant too (the disk probe's hot path)
        lp = build_stream_work(plan, idx, None, prefer_native=nat,
                               skip_wts=True)
        lf = build_stream_work(plan, flat_idx, None, prefer_native=nat,
                               skip_wts=True)
        np.testing.assert_array_equal(lf.item_block, lp.item_block)
        np.testing.assert_array_equal(lf.item_u, lp.item_u)
        np.testing.assert_array_equal(lf.rows_u, lp.rows_u)
        np.testing.assert_array_equal(lf.vals_u, lp.vals_u)


def test_mixed_layout_build_routes_off_native():
    """flat idx + padded wt: the native builder derives ONE t_off/row_stride
    from idx and would read the [T, B, H] weight buffer at wrong addresses,
    so build_stream_work must take the per-array numpy path (and the native
    wrapper must reject mixed layouts outright)."""
    from dlrm_tpu.native import stream_native
    from dlrm_tpu.ops.stream_plan import build_stream_work

    rng = np.random.default_rng(17)
    hots = (2, 1, 2)
    plan = make_stream_plan(TABLES, D, B, hots, block_rows=BR)
    idx = np.stack(
        [rng.integers(0, n, (B, H)) for n in TABLES]
    ).astype(np.int32)
    wt = rng.uniform(0.5, 1.5, size=(len(TABLES), B, H)).astype(np.float32)
    flat_idx = np.concatenate(
        [idx[t, :, :h] for t, h in enumerate(hots)], axis=1
    )
    oracle = build_stream_work(plan, idx, wt, prefer_native=False)
    mixed = build_stream_work(plan, flat_idx, wt, prefer_native=True)
    _check_work_equal(mixed, oracle)
    if stream_native.available():
        with pytest.raises(ValueError, match="SAME layout"):
            stream_native.build_stream_work_native(plan, flat_idx, wt)


def test_flat_hostbatch_to_device_matches_padded():
    """HostBatch with a flat 2-D idx ships the same flat per-hit device
    arrays as the padded batch with flat_hots (and refuses to ship the
    padded layout it never materialized)."""
    import pytest as _pytest

    from dlrm_tpu.data.random_data import HostBatch

    rng = np.random.default_rng(14)
    hots = (2, 1, 2)
    idx = np.stack(
        [rng.integers(0, n, (B, H)) for n in TABLES]
    ).astype(np.int32)
    flat_idx = np.concatenate(
        [idx[t, :, :h] for t, h in enumerate(hots)], axis=1
    )
    dense = rng.random((B, 13)).astype(np.float32)
    labels = rng.integers(0, 2, (B, 1)).astype(np.float32)
    padded = HostBatch(dense=dense, idx=idx, wt=None, labels=labels)
    flat = HostBatch(dense=dense, idx=flat_idx, wt=None, labels=labels)
    bp = padded.to_device(flat_hots=hots)
    bf = flat.to_device(flat_hots=hots)
    np.testing.assert_array_equal(np.asarray(bp.idx), np.asarray(bf.idx))
    with _pytest.raises(ValueError, match="flat_hots"):
        flat.to_device()


def _check_work_equal(wn, wp):
    assert wn.num_real_items == wp.num_real_items
    np.testing.assert_array_equal(wn.item_block, wp.item_block)
    np.testing.assert_array_equal(wn.item_row0, wp.item_row0)
    np.testing.assert_array_equal(wn.item_u, wp.item_u)
    np.testing.assert_array_equal(wn.w2t, wp.w2t)

    def canon(w_):
        r = np.stack([
            w_.rows_u.reshape(-1).astype(np.float64),
            w_.vals_u.reshape(-1).astype(np.float64),
            w_.wts_u.reshape(-1).astype(np.float64),
        ])
        return r[:, np.lexsort(r[::-1])]

    np.testing.assert_allclose(canon(wn), canon(wp), rtol=0, atol=0)


def test_no_cross_table_chunk_bleed():
    """Regression (advisor r1): work items span 256 slots but runs pad to
    128, so a table segment filled exactly to its old bound let its last
    chunk read the NEXT table's first run — whose table-local rows can alias
    into the chunk's block range and silently double-apply the next table's
    gradients. The plan now reserves >= one CHUNK of sentinel tail per
    segment. Adversarial input: table 0 takes 8 hits in 8 distinct 128-row
    blocks (8 runs of exactly 128 -> old segment fill = old bound = 1024);
    table 1's hits sit at local rows 896..903, aliasing table 0's last
    block range [896, 1024)."""
    from dlrm_tpu.ops.stream_plan import CHUNK

    tables_n = (1024, 1024)
    b, h, br = 8, 1, 128
    plan = make_stream_plan(tables_n, D, b, h, block_rows=br)

    # geometry invariant: no real-block work chunk crosses its segment end
    seg_end = list(plan.u_base[1:]) + [plan.u_size]
    blk2t = np.zeros(plan.num_blocks, np.int32)
    for t in range(len(tables_n)):
        blk2t[plan.block_base[t] : plan.block_base[t]
              + plan.blocks_per_table[t]] = t

    idx = np.stack([
        (np.arange(b, dtype=np.int32) * br),
        (896 + np.arange(b, dtype=np.int32)),
    ])[:, :, None]  # [2, 8, 1]
    wt = np.ones((2, b, h), np.float32)
    for prefer_native in (False, True):
        from dlrm_tpu.native import stream_native

        if prefer_native and not stream_native.available():
            continue
        work = build_stream_work(plan, idx, wt, prefer_native=prefer_native)
        for i in range(work.num_real_items):
            blk = int(work.item_block[i])
            if blk == plan.pad_block or int(work.item_u[i]) >= plan.u_size:
                continue  # cover / empty-block items read all-sentinel slots
            t = int(blk2t[blk])
            assert int(work.item_u[i]) + CHUNK <= seg_end[t], (
                f"item {i} (table {t}) chunk crosses segment end"
            )

    work = build_stream_work(plan, idx, wt, prefer_native=False)
    rng = np.random.default_rng(3)
    tabs = [rng.normal(size=(n, D)).astype(np.float32) for n in tables_n]
    dly = rng.normal(size=(2, b, D)).astype(np.float32)
    stacked = stack_tables_padded(tabs, plan)
    g_u = window_grads(
        jnp.asarray(dly), jnp.asarray(work.vals_u), jnp.asarray(work.wts_u),
        jnp.asarray(work.w2t), interpret=True,
    )
    out = stream_update(
        "sgd", plan, jnp.asarray(stacked), None, g_u,
        jnp.asarray(work.rows_u), jnp.asarray(work.item_block),
        jnp.asarray(work.item_row0), jnp.asarray(work.item_u), 0.05,
        interpret=True,
    )
    ref_table, _ = _sparse_oracle("sgd", tabs, idx, wt, dly, 0.05)
    _compare_tables(plan, tabs, out[0], ref_table)


def test_skip_wts_unit_weight_build():
    """skip_wts builds (native + numpy) must produce identical rows/vals/
    items with wts_u=None, and the derived device weights (rows != -1)
    must equal the explicitly-built unit weights."""
    from dlrm_tpu.native import stream_native
    from dlrm_tpu.ops.stream_plan import SENTINEL_ROW

    rng = np.random.default_rng(13)
    plan = make_stream_plan(TABLES, D, B, (2, 1, 2), block_rows=BR)
    idx = np.stack(
        [rng.integers(0, n, (B, H)) for n in TABLES]
    ).astype(np.int32)
    full = build_stream_work(plan, idx, None, prefer_native=False)
    lean = build_stream_work(plan, idx, None, prefer_native=False,
                             skip_wts=True)
    assert lean.wts_u is None
    np.testing.assert_array_equal(full.rows_u, lean.rows_u)
    np.testing.assert_array_equal(full.vals_u, lean.vals_u)
    np.testing.assert_array_equal(full.item_u, lean.item_u)
    derived = (lean.rows_u != SENTINEL_ROW).astype(np.float32)
    np.testing.assert_array_equal(full.wts_u, derived)
    if stream_native.available():
        import dataclasses

        nat = build_stream_work(plan, idx, None, prefer_native=True,
                                skip_wts=True)
        assert nat.wts_u is None
        # derived weights differ per builder's intra-run order; compare
        # with each builder's OWN derivation
        nat_derived = (nat.rows_u != SENTINEL_ROW).astype(np.float32)
        _check_work_equal(
            dataclasses.replace(nat, wts_u=nat_derived),
            dataclasses.replace(lean, wts_u=derived),
        )
