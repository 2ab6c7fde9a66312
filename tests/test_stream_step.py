"""stream_step == fused_step numerically (CPU, kernels in interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.train.fused_step import make_fused_train_step
from dlrm_tpu.train.stream_step import (
    cast_emb,
    init_stream_opt_state,
    make_stream_train_step,
    pad_params,
    plan_for_model,
    unpad_params,
)

CFG = DLRMConfig(
    embedding_dim=128,
    table_sizes=(1500, 300, 2200),
    mlp_bot=(8, 16, 128),
    mlp_top=(64, 8, 1),
    interaction="dot",
    loss="bce",
    num_indices_per_lookup=4,
)
B = 32  # B*H = 128


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad", "adagrad"])
def test_touched_only_update_matches_full_revolve(optimizer):
    """VERDICT r3 next-round #2 (K2 block worklist): with hits concentrated
    in a few rows (power-law-like), the touched-only worklist must (a) be
    measurably shorter than the full one and (b) produce bit-identical
    params/accumulators to the full revolve — untouched blocks survive via
    the in-place aliasing, never streamed."""
    model = DLRMModel(CFG)
    params = model.init_params(jax.random.PRNGKey(3))
    rng = np.random.default_rng(7)
    plan = plan_for_model(model, B, block_rows=1024)
    hb = fixed_multihot_batch(
        rng, CFG.num_dense, CFG.table_sizes, B, CFG.num_indices_per_lookup
    )
    # concentrate every hit in rows < 80: only each table's first block is
    # touched (1500/300/2200 rows at block_rows=1024 -> 5 blocks, 3 touched)
    hb.idx %= 80
    full = hb.with_stream_work(plan)
    slim = hb.with_stream_work(plan, update_touched_only=True)
    assert slim.stream.num_real_items < full.stream.num_real_items
    touched = np.unique(
        slim.stream.item_block[: slim.stream.num_real_items]
    )
    assert len(touched) == 3, touched  # one block per table

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    outs = []
    for hb2 in (full, slim):
        sp = pad_params(copy(params), model, plan)
        sstate = init_stream_opt_state(optimizer, sp, plan)
        step = make_stream_train_step(
            model, optimizer, plan, fwd_impl="gather", grad_impl="gather",
            interpret=True,
        )
        outs.append(step(sp, sstate, hb2.to_device(), 0.05))
    (p_full, s_full, l_full, _), (p_slim, s_slim, l_slim, _) = outs
    np.testing.assert_array_equal(
        np.asarray(p_full["emb"]["stacked"]),
        np.asarray(p_slim["emb"]["stacked"]),
    )
    assert float(l_full) == float(l_slim)
    if optimizer != "sgd":
        np.testing.assert_array_equal(
            np.asarray(s_full["accum"]["emb"]["stacked"]),
            np.asarray(s_slim["accum"]["emb"]["stacked"]),
        )


def _setup(optimizer):
    model = DLRMModel(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    plan = plan_for_model(model, B, block_rows=1024)
    hb = fixed_multihot_batch(
        rng, CFG.num_dense, CFG.table_sizes, B, CFG.num_indices_per_lookup
    ).with_stream_work(plan)
    batch = hb.to_device()
    return model, params, plan, batch


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad", "adagrad"])
@pytest.mark.parametrize(
    "fwd_impl,grad_impl",
    [("gather", "onehot"), ("stream", "onehot"), ("gather", "gather")],
)
def test_stream_step_matches_fused_step(optimizer, fwd_impl, grad_impl):
    model, params, plan, batch = _setup(optimizer)

    # reference: the coalesce-based fused step on the plain layout
    # (deep-copy leaves: both steps donate their inputs)
    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    ref_step = make_fused_train_step(model, optimizer)
    ref_params, ref_state, ref_loss, _ = ref_step(
        copy(params), init_opt_state(optimizer, params), batch, 0.05
    )

    sp = pad_params(copy(params), model, plan)
    sstate = init_stream_opt_state(optimizer, sp, plan)
    step = make_stream_train_step(
        model, optimizer, plan, fwd_impl=fwd_impl, grad_impl=grad_impl,
        interpret=True,
    )
    new_params, new_state, loss, _ = step(sp, sstate, batch, 0.05)

    np.testing.assert_allclose(
        float(loss), float(ref_loss), rtol=1e-5, atol=1e-6
    )
    got = unpad_params(new_params, model, plan)
    np.testing.assert_allclose(
        np.asarray(got["emb"]["stacked"]),
        np.asarray(ref_params["emb"]["stacked"]),
        rtol=1e-4, atol=1e-5,
    )
    for k in new_params:
        if k == "emb":
            continue
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            new_params[k], ref_params[k],
        )


def test_stream_step_bf16_tables_tracks_fp32():
    """bf16 tables + bf16 one-hot matmuls stay within bf16 tolerance of the
    fp32 stream step after a few updates."""
    model, params, plan, batch = _setup("rwsadagrad")
    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)

    sp32 = pad_params(copy(params), model, plan)
    st32 = init_stream_opt_state("rwsadagrad", sp32, plan)
    step32 = make_stream_train_step(
        model, "rwsadagrad", plan, grad_impl="gather", interpret=True
    )

    sp16 = cast_emb(pad_params(copy(params), model, plan), jnp.bfloat16)
    st16 = init_stream_opt_state("rwsadagrad", sp16, plan)
    step16 = make_stream_train_step(
        model, "rwsadagrad", plan, grad_impl="gather",
        mm_dtype=jnp.bfloat16, stochastic_round=True, interpret=True,
    )

    # one step: the bf16 update must track fp32 within rounding noise
    # (multi-step trajectories diverge chaotically through the dense net,
    # so the multi-step check below only asserts training progresses)
    sp32, st32, loss32, _ = step32(sp32, st32, batch, 0.05)
    sp16, st16, loss16, _ = step16(sp16, st16, batch, 0.05)
    assert sp16["emb"]["stacked"].dtype == jnp.bfloat16
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=0.02)
    np.testing.assert_allclose(
        np.asarray(sp16["emb"]["stacked"], np.float32),
        np.asarray(sp32["emb"]["stacked"]),
        rtol=0.05, atol=0.02,
    )

    first = float(loss16)
    for _ in range(4):
        sp16, st16, loss16, _ = step16(sp16, st16, batch, 0.05)
    assert float(loss16) < first, (float(loss16), first)


def test_stream_step_ragged_hot_sizes():
    """Per-table hot sizes (the real v2 config shape): the stream plan sizes
    U per table and the grouped forward gathers only real hits — results
    must equal the fused step consuming the same zero-weight-padded batch."""
    from dlrm_tpu.ops.stream_plan import make_stream_plan

    hot = (4, 1, 3)
    hmax = max(hot)
    model = DLRMModel(CFG)  # CFG.num_indices_per_lookup=4 == hmax
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    b = 32
    idx = np.stack([
        rng.integers(0, n, (b, hmax)).astype(np.int32)
        for n in CFG.table_sizes
    ])
    wt = np.zeros((3, b, hmax), np.float32)
    for t, h in enumerate(hot):
        wt[t, :, :h] = 1.0
    from dlrm_tpu.data.random_data import HostBatch

    hb = HostBatch(
        dense=rng.random((b, CFG.num_dense), dtype=np.float32),
        idx=idx, wt=wt,
        labels=(rng.random((b, 1)) < 0.5).astype(np.float32),
    )

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    ref_step = make_fused_train_step(model, "rwsadagrad")
    ref_params, _, ref_loss, _ = ref_step(
        copy(params), init_opt_state("rwsadagrad", params),
        hb.to_device(), 0.05,
    )

    plan = make_stream_plan(
        CFG.table_sizes, CFG.embedding_dim, b, hot, block_rows=1024
    )
    hb2 = hb.with_stream_work(plan)
    sp = pad_params(copy(params), model, plan)
    sstate = init_stream_opt_state("rwsadagrad", sp, plan)
    step = make_stream_train_step(
        model, "rwsadagrad", plan, grad_impl="gather", interpret=True
    )
    new_params, _, loss, _ = step(sp, sstate, hb2.to_device(), 0.05)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)
    got = unpad_params(new_params, model, plan)
    np.testing.assert_allclose(
        np.asarray(got["emb"]["stacked"]),
        np.asarray(ref_params["emb"]["stacked"]),
        rtol=1e-4, atol=1e-5,
    )

    # the ragged plan really is tighter than the padded-uniform one (at a
    # batch where the per-table savings exceed the 1024-slot window rounding)
    big_r = make_stream_plan(
        CFG.table_sizes, CFG.embedding_dim, 2048, hot, block_rows=1024
    )
    big_p = make_stream_plan(
        CFG.table_sizes, CFG.embedding_dim, 2048, hmax, block_rows=1024
    )
    assert big_r.u_size < big_p.u_size


def test_unit_weights_batch_matches_full_wts():
    """A unit_weights stream batch (no host wts_u; device derives it) must
    train identically to the full-wts build."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dlrm_tpu.config import DLRMConfig
    from dlrm_tpu.data.random_data import fixed_multihot_batch
    from dlrm_tpu.models.dlrm import DLRMModel
    from dlrm_tpu.train.stream_step import (
        init_stream_opt_state,
        make_stream_train_step,
        pad_params,
        plan_for_model,
    )

    cfg = DLRMConfig(
        embedding_dim=128, table_sizes=(1280, 640), mlp_bot=(8, 16, 128),
        mlp_top=(16, 8, 1), interaction="dot", loss="bce",
        num_indices_per_lookup=4,
    )
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    plan = plan_for_model(model, 32, block_rows=1024)
    hb = fixed_multihot_batch(
        np.random.default_rng(3), cfg.num_dense, cfg.table_sizes, 32, 4
    )
    step = make_stream_train_step(
        model, "rwsadagrad", plan, fwd_impl="gather", grad_impl="gather",
        mm_dtype=jnp.float32, interpret=True,
    )
    outs = []
    for unit in (False, True):
        p = pad_params(jax.tree_util.tree_map(jnp.copy, params), model, plan)
        s = init_stream_opt_state("rwsadagrad", p, plan)
        b = hb.with_stream_work(plan, unit_weights=unit).to_device()
        if unit:
            assert b.stream.wts_u is None
        p, s, loss, _ = step(p, s, b, 0.05)
        outs.append((np.asarray(p["emb"]["stacked"]), float(loss)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]


def test_stream_step_flat_per_hit_layout():
    """to_device(flat_hots=...) ships idx/wt as ONE flat per-hit vector
    (dropping the padded [T, B, Hmax] H2D cost); the train step must
    produce bit-identical results to the padded layout, and eval must
    match too."""
    from dlrm_tpu.ops.stream_plan import make_stream_plan
    from dlrm_tpu.train.stream_step import make_stream_eval_step

    hot = (4, 1, 3)
    hmax = max(hot)
    model = DLRMModel(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    b = 32
    idx = np.stack([
        rng.integers(0, n, (b, hmax)).astype(np.int32)
        for n in CFG.table_sizes
    ])
    wt = np.zeros((3, b, hmax), np.float32)
    for t, h in enumerate(hot):
        wt[t, :, :h] = rng.random((b, h), dtype=np.float32)
    from dlrm_tpu.data.random_data import HostBatch

    hb = HostBatch(
        dense=rng.random((b, CFG.num_dense), dtype=np.float32),
        idx=idx, wt=wt,
        labels=(rng.random((b, 1)) < 0.5).astype(np.float32),
    )
    plan = make_stream_plan(
        CFG.table_sizes, CFG.embedding_dim, b, hot, block_rows=1024
    )
    hb = hb.with_stream_work(plan)
    flat_batch = hb.to_device(flat_hots=plan.hot)
    assert flat_batch.idx.ndim == 1
    assert flat_batch.idx.shape[0] == b * sum(hot)

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    sp = pad_params(copy(params), model, plan)
    sstate = init_stream_opt_state("rwsadagrad", sp, plan)
    step = make_stream_train_step(
        model, "rwsadagrad", plan, grad_impl="gather", interpret=True
    )
    p_pad, _, loss_pad, _ = step(
        copy(sp), copy(sstate), hb.to_device(), 0.05
    )
    p_flat, _, loss_flat, _ = step(copy(sp), copy(sstate), flat_batch, 0.05)
    np.testing.assert_array_equal(float(loss_pad), float(loss_flat))
    np.testing.assert_array_equal(
        np.asarray(p_pad["emb"]["stacked"]),
        np.asarray(p_flat["emb"]["stacked"]),
    )

    ev = make_stream_eval_step(model, plan)
    np.testing.assert_array_equal(
        np.asarray(ev(sp, hb.to_device())),
        np.asarray(ev(sp, flat_batch)),
    )


@pytest.mark.parametrize("mode", ["learned", "fixed"])
@pytest.mark.parametrize("optimizer", ["sgd", "adagrad", "rwsadagrad"])
def test_stream_step_weighted_pooling_matches_plain_step(mode, optimizer):
    """VERDICT r4 weak #4 / next-round #5: --weighted-pooling on the stream
    path. Oracle = the plain autodiff step (train/step.py), which supports
    v_w through apply_emb (dlrm_s_pytorch.py:286-294 semantics). learned:
    v_w must MOVE and match; fixed: v_w must stay exactly at init on both
    paths (frozen-buffer contract) while the table still trains."""
    import dataclasses

    from dlrm_tpu.train.step import make_train_step

    cfg = dataclasses.replace(CFG, weighted_pooling=mode)
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    assert "v_w" in params
    plan = plan_for_model(model, B, block_rows=1024)
    rng = np.random.default_rng(5)
    hb = fixed_multihot_batch(
        rng, cfg.num_dense, cfg.table_sizes, B, cfg.num_indices_per_lookup
    ).with_stream_work(plan)
    batch = hb.to_device()

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    ref_step = make_train_step(model, optimizer)
    rp, rs = copy(params), init_opt_state(optimizer, params)

    sp = pad_params(copy(params), model, plan)
    sstate = init_stream_opt_state(optimizer, sp, plan)
    step = make_stream_train_step(
        model, optimizer, plan, fwd_impl="gather", grad_impl="gather",
        interpret=True,
    )

    for it in range(2):
        rp, rs, ref_loss, _ = ref_step(rp, rs, batch, 0.05)
        sp, sstate, loss, _ = step(sp, sstate, batch, 0.05)
        np.testing.assert_allclose(
            float(loss), float(ref_loss), rtol=1e-5, atol=1e-6,
            err_msg=f"loss diverged at step {it}",
        )

    got = unpad_params(sp, model, plan)
    np.testing.assert_allclose(
        np.asarray(got["v_w"]), np.asarray(rp["v_w"]), rtol=1e-4, atol=1e-5
    )
    if mode == "fixed":
        np.testing.assert_array_equal(np.asarray(got["v_w"]), 1.0)
    else:
        assert float(np.abs(np.asarray(got["v_w"]) - 1.0).max()) > 0, (
            "learned v_w never moved"
        )
    np.testing.assert_allclose(
        np.asarray(got["emb"]["stacked"]),
        np.asarray(rp["emb"]["stacked"]),
        rtol=1e-4, atol=1e-5,
    )


def test_stream_step_weighted_pooling_flat_layout():
    """v_w parity between the padded and FLAT per-hit device layouts (the
    _padded_hit_ids flat addressing), train and eval."""
    import dataclasses

    cfg = dataclasses.replace(CFG, weighted_pooling="learned")
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(2))
    plan = plan_for_model(model, B, block_rows=1024)
    rng = np.random.default_rng(6)
    hb = fixed_multihot_batch(
        rng, cfg.num_dense, cfg.table_sizes, B, cfg.num_indices_per_lookup
    ).with_stream_work(plan)

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    sp = pad_params(copy(params), model, plan)
    # make v_w non-trivial so the weighting actually matters
    sp["v_w"] = sp["v_w"] * (
        1.0 + 0.1 * jnp.arange(plan.padded_rows, dtype=jnp.float32)
        / plan.padded_rows
    )
    sstate = init_stream_opt_state("rwsadagrad", sp, plan)
    step = make_stream_train_step(
        model, "rwsadagrad", plan, fwd_impl="gather", grad_impl="gather",
        interpret=True,
    )
    p_pad, _, loss_pad, _ = step(copy(sp), copy(sstate), hb.to_device(), 0.05)
    p_flat, _, loss_flat, _ = step(
        copy(sp), copy(sstate), hb.to_device(flat_hots=plan.hot), 0.05
    )
    np.testing.assert_allclose(float(loss_pad), float(loss_flat), rtol=1e-6)
    # the two layouts scatter d(loss)/d(v_w) in different hit orders:
    # float32 summation-order noise, not a layout bug
    np.testing.assert_allclose(
        np.asarray(p_pad["v_w"]), np.asarray(p_flat["v_w"]),
        rtol=1e-5, atol=1e-6,
    )

    from dlrm_tpu.train.stream_step import make_stream_eval_step

    ev = make_stream_eval_step(model, plan)
    np.testing.assert_allclose(
        np.asarray(ev(sp, hb.to_device())),
        np.asarray(ev(sp, hb.to_device(flat_hots=plan.hot))),
        rtol=1e-6,
    )
