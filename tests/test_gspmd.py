"""GSPMD-partitioned training == single-device training; covers the variants
the explicit butterfly path doesn't (QR, MD, weighted pooling)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlrm_tpu.config import DLRMConfig, MDConfig, QRConfig, TrainConfig
from dlrm_tpu.data.random_data import RandomDataset
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.parallel.gspmd import GspmdDLRM
from dlrm_tpu.parallel.mesh import make_mesh
from dlrm_tpu.parallel.multihost import barrier, global_batch_from_replicated
from dlrm_tpu.train.step import make_train_step

BASE = dict(
    embedding_dim=4,
    table_sizes=(64, 300, 16),
    mlp_bot=(8, 4),
    mlp_top=(4, 1),
    loss="bce",
    num_indices_per_lookup=4,
)


@pytest.mark.parametrize(
    "variant",
    [
        {},
        {"qr": QRConfig(collisions=4, threshold=100)},
        {"md": MDConfig(temperature=0.3, threshold=100)},
        {"weighted_pooling": "learned"},
    ],
    ids=["plain", "qr", "md", "weighted"],
)
def test_gspmd_matches_single_device(variant):
    cfg = DLRMConfig(**BASE, **variant)
    model = DLRMModel(cfg)
    params0 = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(2))
    )
    tc = TrainConfig(mini_batch_size=16, num_batches=3, numpy_rand_seed=5)
    batches = list(RandomDataset(cfg, tc))

    step = make_train_step(model, "rwsadagrad")
    p1 = jax.tree_util.tree_map(jnp.asarray, params0)
    s1 = init_opt_state("rwsadagrad", p1)
    for hb in batches:
        p1, s1, l1, _ = step(p1, s1, hb.to_device(), 0.05)

    mesh = make_mesh(data=2, model=4)
    runner = GspmdDLRM(model, mesh)
    p2 = runner.shard_params(jax.tree_util.tree_map(jnp.asarray, params0))
    s2 = runner.shard_opt_state(init_opt_state("rwsadagrad", p2))
    step2 = runner.make_train_step("rwsadagrad")
    for hb in batches:
        b = runner.shard_batch(hb.to_device())
        p2, s2, l2, _ = step2(p2, s2, b, 0.05)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    # non-divisible row counts are tail-padded to shard (never silently
    # replicated); compare against the unpadded reference shapes
    from jax.sharding import PartitionSpec as P

    for (k, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p1)[0],
        jax.tree_util.tree_flatten_with_path(p2)[0],
    ):
        bv = np.asarray(jax.device_get(b))
        bv = bv[tuple(slice(0, s) for s in np.shape(a))]
        np.testing.assert_allclose(
            np.asarray(a), bv, atol=2e-5, err_msg=str(k)
        )
    from dlrm_tpu.parallel.gspmd import _is_row_shardable

    for path, leaf in jax.tree_util.tree_flatten_with_path(p2)[0]:
        if _is_row_shardable(path, leaf):
            assert leaf.sharding.spec == P("model"), (path, leaf.shape)
            assert leaf.shape[0] % 4 == 0


def test_multihost_helpers_single_process():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(data=2, model=4)
    cfg = DLRMConfig(**BASE)
    tc = TrainConfig(mini_batch_size=16, num_batches=1)
    hb = RandomDataset(cfg, tc)[0]
    specs = (
        P(("data", "model")),
        P(None, ("data", "model")),
        P(None, ("data", "model")),
        P(("data", "model")),
    )
    gb = global_batch_from_replicated(mesh, hb.to_device(), specs)
    assert gb.dense.shape == (16, 8)
    barrier("test")


def test_planner_all_strategies_roundtrip():
    """build_stacked -> extract_table roundtrips for every placement
    strategy (row_wise's intra-shard offset math was previously untested)."""
    import numpy as np

    from dlrm_tpu.parallel.planner import (
        build_stacked,
        extract_table,
        plan_tables,
    )

    rng = np.random.default_rng(0)
    sizes = (37, 100, 9, 260, 64)
    tables = [rng.standard_normal((n, 8)).astype(np.float32) for n in sizes]
    for strategy in ("round_robin", "table_wise", "row_wise"):
        placement = plan_tables(sizes, 4, strategy=strategy)
        stacked = build_stacked(placement, tables)
        for t, tab in enumerate(tables):
            got = extract_table(placement, stacked, t)
            np.testing.assert_allclose(got, tab, err_msg=f"{strategy} t={t}")
