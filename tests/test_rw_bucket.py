"""Owner-bucketed row-wise hits (parallel/rw_bucket.py): the host pre-routes
each striped-table hit to its owning shard so a shard gathers ~h/M hits per
bag instead of masking all h. Must be numerically identical to the masked
path (and therefore to single-device training) — every hit lands in exactly
one bucket or the spill, pads carry weight 0.
"""

import numpy as np
import pytest

import jax

from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.parallel.butterfly import ButterflyDLRM
from dlrm_tpu.parallel.mesh import make_mesh
from dlrm_tpu.parallel.rw_bucket import bucket_rw_hits, default_bucket_caps
from dlrm_tpu.train.step import make_eval_step, make_train_step

from test_butterfly import MIXED_CFG, _mixed_data, _stack_group


def test_bucket_builder_partitions_every_hit():
    """Each real hit appears exactly once (bucket of its owner or spill);
    local ids invert back to the global ids; pads have weight 0."""
    rng = np.random.default_rng(0)
    t_rw, b, h, m = 2, 32, 10, 4
    sizes = (1000, 990)
    sl = [250, 248]
    off = [0, 250]
    idx = np.stack(
        [rng.integers(0, n, (b, h)).astype(np.int32) for n in sizes]
    )
    wt = rng.random((t_rw, b, h)).astype(np.float32) + 0.1
    wt[0, :, h - 2 :] = 0.0  # ragged pads must be dropped, not bucketed
    caps = (3, 4)
    ib, wb, si, sw = bucket_rw_hits(idx, wt, caps, sl, off, m, spill=h)

    for t in range(t_rw):
        c0 = sum(caps[:t])
        for s in range(b):
            real = [
                (int(idx[t, s, j]), float(wt[t, s, j]))
                for j in range(h)
                if wt[t, s, j] != 0
            ]
            got = []
            for shard in range(m):
                for c in range(caps[t]):
                    w = float(wb[shard, s, c0 + c])
                    if w != 0:
                        gid = int(ib[shard, s, c0 + c]) - off[t] + shard * sl[t]
                        assert 0 <= int(ib[shard, s, c0 + c]) - off[t] < sl[t]
                        got.append((gid, w))
            for c in range(si.shape[-1]):
                if sw[t, s, c] != 0:
                    got.append((int(si[t, s, c]), float(sw[t, s, c])))
            assert sorted(got) == sorted(real), (t, s)


def test_bucket_builder_overflow_raises():
    idx = np.zeros((1, 4, 8), np.int32)  # every hit -> row 0 -> shard 0
    wt = np.ones((1, 4, 8), np.float32)
    with pytest.raises(ValueError, match="overflow"):
        bucket_rw_hits(idx, wt, (2,), [100], [0], 4, spill=2)


def test_default_caps_shapes():
    caps = default_bucket_caps((100, 27, 3), 8)
    assert caps[0] < 100 and caps[1] < 27 and caps[2] == 3
    assert all(c >= 1 for c in caps)


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad"])
def test_bucketed_butterfly_matches_single_device(optimizer):
    """Bucketed == single-device training (and hence == the masked path,
    which has its own single-device parity test). Spill is exercised: tiny
    caps force real hits through the spill columns."""
    model = DLRMModel(MIXED_CFG)
    params0 = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(3))
    )
    batches, tc = _mixed_data()

    step1 = make_train_step(model, optimizer)
    p1 = jax.tree_util.tree_map(jax.numpy.asarray, params0)
    s1 = init_opt_state(optimizer, p1)
    for hb in batches:
        p1, s1, loss1, _ = step1(p1, s1, hb.to_device(), 0.05)

    mesh = make_mesh(data=2, model=4)
    bf = ButterflyDLRM(
        model, mesh, strategy="mixed", rw_threshold=600,
        # cap 2 of hot 6 on 4 shards: mean 1.5/shard, so real spills occur
        rw_bucket_caps=(2, 2), rw_spill=6,
    )
    assert bf.num_rw == 2 and bf.rw_bucket
    p2 = bf.shard_params(params0)
    s2 = init_opt_state(optimizer, p2)
    step2 = bf.make_train_step(optimizer, tc.mini_batch_size, p2, s2)
    spilled = 0
    for hb in batches:
        b = bf.shard_batch(hb.to_device())
        assert b.idx_rwb is not None and b.idx_rw.shape[-1] == 6
        spilled += int(np.count_nonzero(np.asarray(b.wt_rw)))
        p2, s2, loss2, _ = step2(p2, s2, b, 0.05)
    assert spilled > 0, "fixture must exercise the spill path"

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    p2u = bf.unshard_params(p2)
    np.testing.assert_allclose(
        np.asarray(p1["emb"]["stacked"]),
        np.asarray(p2u["emb"]["stacked"]),
        atol=2e-5,
    )
    for name in ("bot", "top"):
        for l1, l2 in zip(p1[name], p2u[name]):
            np.testing.assert_allclose(
                np.asarray(l1["w"]), np.asarray(l2["w"]), atol=2e-5
            )


def test_bucketed_eval_matches_single_device():
    model = DLRMModel(MIXED_CFG)
    params = model.init_params(jax.random.PRNGKey(5))
    batches, _ = _mixed_data(n_batches=1)
    probs1 = np.asarray(make_eval_step(model)(params, batches[0].to_device()))

    mesh = make_mesh(data=2, model=4)
    bf = ButterflyDLRM(
        model, mesh, strategy="mixed", rw_bucket_caps=(3, 3), rw_spill=6
    )
    p2 = bf.shard_params(params)
    ev = bf.make_eval_step(p2)
    probs2 = np.asarray(ev(p2, bf.shard_batch(batches[0].to_device())))
    np.testing.assert_allclose(probs1, probs2, atol=1e-5)


def test_bucketed_grad_accum_matches_single_device():
    """Bucketing composed with sharded gradient accumulation."""
    from dlrm_tpu.train.fused_step import make_fused_grad_accum_train_step

    model = DLRMModel(MIXED_CFG)
    params0 = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(3))
    )
    batches, tc = _mixed_data(n_batches=4)
    accum = 2

    step1 = make_fused_grad_accum_train_step(model, "rwsadagrad", accum)
    p1 = jax.tree_util.tree_map(jax.numpy.asarray, params0)
    s1 = init_opt_state("rwsadagrad", p1)
    for i in range(0, len(batches), accum):
        g = _stack_group(batches[i : i + accum])
        p1, s1, loss1, _ = step1(p1, s1, g.to_device(), 0.05)

    mesh = make_mesh(data=2, model=4)
    bf = ButterflyDLRM(
        model, mesh, strategy="mixed", rw_threshold=600,
        rw_bucket_caps=(2, 2), rw_spill=6,
    )
    p2 = bf.shard_params(params0)
    s2 = init_opt_state("rwsadagrad", p2)
    step2 = bf.make_grad_accum_train_step(
        "rwsadagrad", tc.mini_batch_size, accum, p2, s2
    )
    for i in range(0, len(batches), accum):
        g = _stack_group(batches[i : i + accum])
        b = bf.shard_batch(g.to_device())
        assert b.idx_rwb is not None and b.idx_rwb.ndim == 4
        p2, s2, loss2, _ = step2(p2, s2, b, 0.05)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    p2u = bf.unshard_params(p2)
    np.testing.assert_allclose(
        np.asarray(p1["emb"]["stacked"]),
        np.asarray(p2u["emb"]["stacked"]),
        atol=2e-5,
    )


def test_bucket_caps_validation():
    model = DLRMModel(MIXED_CFG)
    mesh = make_mesh(data=2, model=4)
    with pytest.raises(ValueError, match="stripes no tables"):
        ButterflyDLRM(model, mesh, rw_bucket_caps=(2,))
    with pytest.raises(ValueError, match="rw_bucket_caps"):
        ButterflyDLRM(
            model, mesh, strategy="mixed", rw_threshold=600,
            rw_bucket_caps=(2,),
        )
