"""Fused-sparse train step == plain AD train step, exactly.

The fused path reproduces EXACT sparse optimizer semantics (duplicate indices
coalesced before the nonlinear Adagrad update), so both paths must produce
the same parameters to fp32 roundoff — including batches engineered to have
heavy duplicate hits on the same rows.
"""

import numpy as np
import pytest

import jax

from dlrm_tpu.config import DLRMConfig, TrainConfig
from dlrm_tpu.data.random_data import RandomDataset, fixed_multihot_batch
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.train.fused_step import make_fused_train_step, supports_fused
from dlrm_tpu.train.step import make_train_step

CFG = DLRMConfig(
    embedding_dim=8,
    table_sizes=(40, 7, 100),  # tiny table 7 -> guaranteed duplicate hits
    mlp_bot=(4, 8, 8),
    mlp_top=(8, 4, 1),
    loss="bce",
    num_indices_per_lookup=5,
)


def _params():
    model = DLRMModel(CFG)
    return model, jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(1))
    )


def _batches(n=4, mb=12):
    tc = TrainConfig(mini_batch_size=mb, num_batches=n, numpy_rand_seed=11)
    return list(RandomDataset(CFG, tc))


@pytest.mark.parametrize("optimizer", ["sgd", "adagrad", "rwsadagrad"])
def test_fused_matches_plain(optimizer):
    model, params0 = _params()
    assert supports_fused(model)
    batches = _batches()

    import jax.numpy as jnp

    p1 = jax.tree_util.tree_map(jnp.asarray, params0)
    s1 = init_opt_state(optimizer, p1)
    plain = make_train_step(model, optimizer)
    for hb in batches:
        p1, s1, l1, _ = plain(p1, s1, hb.to_device(), 0.05)

    p2 = jax.tree_util.tree_map(jnp.asarray, params0)
    s2 = init_opt_state(optimizer, p2)
    fused = make_fused_train_step(model, optimizer)
    for hb in batches:
        p2, s2, l2, _ = fused(p2, s2, hb.to_device(), 0.05)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_flatten_with_path(p1)[0],
        jax.tree_util.tree_flatten_with_path(p2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-6, err_msg=str(k1)
        )
    # optimizer accumulators too (exact coalescing semantics)
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_flatten_with_path(s1)[0],
        jax.tree_util.tree_flatten_with_path(s2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-6, err_msg=str(k1)
        )


def test_fused_heavy_duplicates():
    """All hits on a handful of rows: coalescing must sum before squaring."""
    model, params0 = _params()
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    import dataclasses

    hb = fixed_multihot_batch(rng, 4, CFG.table_sizes, 16, 5)
    # force every index into {0, 1} -> massive duplication
    hb = dataclasses.replace(hb, idx=(hb.idx % 2).astype(np.int32))

    p1 = jax.tree_util.tree_map(jnp.asarray, params0)
    s1 = init_opt_state("rwsadagrad", p1)
    p1, s1, _, _ = make_train_step(model, "rwsadagrad")(p1, s1, hb.to_device(), 0.1)

    p2 = jax.tree_util.tree_map(jnp.asarray, params0)
    s2 = init_opt_state("rwsadagrad", p2)
    p2, s2, _, _ = make_fused_train_step(model, "rwsadagrad")(
        p2, s2, hb.to_device(), 0.1
    )
    np.testing.assert_allclose(
        np.asarray(p1["emb"]["stacked"]),
        np.asarray(p2["emb"]["stacked"]),
        atol=3e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s1["accum"]["emb"]["stacked"]),
        np.asarray(s2["accum"]["emb"]["stacked"]),
        atol=3e-6,
    )


def test_grad_accum_wired_through_trainer():
    """--mlperf-grad-accum-iter actually accumulates: k micro-batches per
    optimizer step, loss equals the group mean, and the trainer consumes
    len(data)//k steps."""
    from dlrm_tpu.config import TrainConfig
    from dlrm_tpu.train.harness import Trainer

    cfg = CFG
    model = DLRMModel(cfg)
    tc = TrainConfig(
        mini_batch_size=8, data_size=8 * 6, nepochs=1, optimizer="sgd",
        learning_rate=0.05, grad_accum_iter=3, print_freq=1,
        numpy_rand_seed=123,
    )
    data = RandomDataset(model, tc) if False else None
    # six 8-sample batches -> two accumulation groups of three
    rng = np.random.default_rng(0)
    batches = [
        fixed_multihot_batch(rng, cfg.num_dense, cfg.table_sizes, 8, 5)
        for _ in range(6)
    ]

    class L:
        def __len__(self):
            return 6

        def __iter__(self):
            return iter(batches)

    tr = Trainer(model, tc, L())
    state = tr.train()
    assert state.total_iter == 2, state.total_iter


@pytest.mark.parametrize("optimizer", ["sgd", "rwsadagrad"])
def test_fused_grad_accum_matches_plain_accum(optimizer):
    """Grad accumulation composed with the fused sparse update must equal
    the plain-AD accumulation step (same mean-over-accum scaling, one
    optimizer advance per step)."""
    import jax.numpy as jnp

    from dlrm_tpu.data.batch import Batch
    from dlrm_tpu.train.fused_step import make_fused_grad_accum_train_step
    from dlrm_tpu.train.step import make_grad_accum_train_step

    cfg = CFG
    model = DLRMModel(cfg)
    params0 = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(4))
    )
    tc = TrainConfig(mini_batch_size=8, num_batches=4, numpy_rand_seed=9)
    hbs = list(RandomDataset(cfg, tc))
    stacked = Batch(
        dense=jnp.stack([jnp.asarray(h.dense) for h in hbs]),
        idx=jnp.stack([jnp.asarray(h.idx) for h in hbs]),
        wt=jnp.stack([jnp.asarray(h.wt) for h in hbs]),
        labels=jnp.stack([jnp.asarray(h.labels) for h in hbs]),
    )
    accum = len(hbs)

    s1 = init_opt_state(optimizer, params0)
    p1, s1b, l1, _ = make_grad_accum_train_step(model, optimizer, accum)(
        jax.tree_util.tree_map(jnp.asarray, params0), s1, stacked, 0.05
    )
    s2 = init_opt_state(optimizer, params0)
    p2, s2b, l2, _ = make_fused_grad_accum_train_step(
        model, optimizer, accum
    )(jax.tree_util.tree_map(jnp.asarray, params0), s2, stacked, 0.05)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p1)[0],
        jax.tree_util.tree_flatten_with_path(p2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, err_msg=str(k)
        )


def test_padded_last_batch_loss_masks_pad_rows():
    """The bin loader pads the final batch to the static batch size with
    label=-1 / weight-0 rows (criteo.py pad_last). Those rows must not
    contribute to the loss OR its gradients: training on the padded batch
    must equal training on the truncated real rows (plain AND fused paths,
    and the sharded butterfly)."""
    from dlrm_tpu.data.random_data import HostBatch

    model = DLRMModel(CFG)
    params0 = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(1))
    )
    rng = np.random.default_rng(3)
    b_real, b_pad = 5, 8
    dense = rng.normal(size=(b_pad, CFG.num_dense)).astype(np.float32)
    dense[b_real:] = 0.0
    idx = np.stack(
        [rng.integers(0, n, (b_pad, 5)) for n in CFG.table_sizes]
    ).astype(np.int32)
    idx[:, b_real:, :] = 0
    wt = np.ones((3, b_pad, 5), np.float32)
    wt[:, b_real:, :] = 0.0
    labels = (rng.random((b_pad, 1)) < 0.5).astype(np.float32)
    labels[b_real:] = -1.0  # pad marker

    padded = HostBatch(dense=dense, idx=idx, wt=wt, labels=labels)
    real = HostBatch(
        dense=dense[:b_real], idx=idx[:, :b_real], wt=wt[:, :b_real],
        labels=labels[:b_real],
    )

    for mk in (make_train_step, make_fused_train_step):
        outs = []
        for hb in (padded, real):
            p = jax.tree_util.tree_map(jax.numpy.asarray, params0)
            s = init_opt_state("rwsadagrad", p)
            p, s, loss, _ = mk(model, "rwsadagrad")(p, s, hb.to_device(), 0.1)
            outs.append((float(loss), np.asarray(p["emb"]["stacked"]),
                         np.asarray(p["top"][0]["w"])))
        assert outs[0][0] == outs[1][0], mk.__name__
        np.testing.assert_array_equal(outs[0][1], outs[1][1])
        np.testing.assert_allclose(outs[0][2], outs[1][2], atol=1e-7)

    # sharded butterfly: padded global batch == single-device padded run
    from dlrm_tpu.parallel.butterfly import ButterflyDLRM
    from dlrm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, model=4)
    bf = ButterflyDLRM(model, mesh)
    p2 = bf.shard_params(params0)
    s2 = init_opt_state("rwsadagrad", p2)
    step2 = bf.make_train_step("rwsadagrad", b_pad, p2, s2)
    _, _, loss2, _ = step2(p2, s2, bf.shard_batch(padded.to_device()), 0.1)

    p1 = jax.tree_util.tree_map(jax.numpy.asarray, params0)
    s1 = init_opt_state("rwsadagrad", p1)
    _, _, loss1, _ = make_train_step(model, "rwsadagrad")(
        p1, s1, padded.to_device(), 0.1
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-6)
