"""Hybrid ICI x DCN mesh construction (SURVEY.md §5.8 "mesh axes over ICI
and DCN"; VERDICT r3 missing #4). Slices are emulated via slice_ids on the
8-virtual-device CPU mesh; the invariant under test: the MODEL axis (the
heavy a2a / psum_scatter traffic) never crosses a slice boundary."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from dlrm_tpu.parallel.mesh import make_mesh

SLICE_IDS = [0, 0, 0, 0, 1, 1, 1, 1]  # two emulated 4-device slices


def _slice_of(mesh):
    """Map each mesh position back to its emulated slice id."""
    dev_slice = {d: s for d, s in zip(jax.devices(), SLICE_IDS)}
    return np.vectorize(lambda d: dev_slice[d])(mesh.devices)


def test_hybrid_mesh_model_axis_within_slice():
    for data, model in ((4, 2), (2, 4), (8, 1)):
        mesh = make_mesh(data=data, model=model, slice_ids=SLICE_IDS)
        assert dict(mesh.shape) == {"data": data, "model": model}
        sl = _slice_of(mesh)
        # every mesh row (one model group) lives inside ONE slice
        assert (sl == sl[:, :1]).all(), sl


def test_hybrid_mesh_auto_model_prefers_full_slice():
    mesh = make_mesh(data=2, slice_ids=SLICE_IDS)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    sl = _slice_of(mesh)
    assert (sl == sl[:, :1]).all(), sl


def test_hybrid_mesh_rejects_cross_slice_model_axis():
    with pytest.raises(ValueError, match="within one 4-device slice"):
        make_mesh(data=1, model=8, slice_ids=SLICE_IDS)
    with pytest.raises(ValueError, match="within one 4-device slice"):
        make_mesh(data=1, model=3, slice_ids=SLICE_IDS)


def test_hybrid_mesh_rejects_unequal_slices():
    with pytest.raises(ValueError, match="homogeneous slices"):
        make_mesh(data=4, model=2, slice_ids=[0, 0, 0, 0, 0, 1, 1, 1])


def test_hybrid_mesh_auto_model_non_power_of_two_divisor():
    """per=6 slices, data=6: the only legal in-slice model axis is 2 — a
    divisor a halving-only search (6 -> 3 -> 1) never visits (review r4).
    Needs 12 virtual devices, so it runs in a fresh interpreter."""
    code = (
        "from dlrm_tpu.parallel.mesh import make_mesh\n"
        "mesh = make_mesh(data=6, slice_ids=[0]*6 + [1]*6)\n"
        "assert dict(mesh.shape) == {'data': 6, 'model': 2}, mesh.shape\n"
        "print('OK')\n"
    )
    env = dict(
        os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=12",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr


def test_single_slice_unchanged():
    """CPU devices carry no slice_index: the flat layout is preserved."""
    mesh = make_mesh(data=2, model=4)
    assert np.array_equal(
        mesh.devices, np.asarray(jax.devices()).reshape(2, 4)
    )


def test_hybrid_mesh_trains_butterfly():
    """A butterfly train step over the hybrid mesh (model axis in-slice)
    produces the same loss as over the flat mesh — placement is a pure
    topology choice, numerics are mesh-layout invariant."""
    from dlrm_tpu.config import DLRMConfig
    from dlrm_tpu.data.random_data import fixed_multihot_batch
    from dlrm_tpu.models.dlrm import DLRMModel
    from dlrm_tpu.optim.optimizers import init_opt_state
    from dlrm_tpu.parallel.butterfly import ButterflyDLRM

    cfg = DLRMConfig(
        embedding_dim=8,
        table_sizes=(40, 24, 16, 60),
        mlp_bot=(13, 16, 8),
        mlp_top=(16, 8, 1),
        interaction="dot",
        loss="bce",
        num_indices_per_lookup=4,
    )
    model = DLRMModel(cfg)
    params0 = model.init_params(jax.random.PRNGKey(0))
    hb = fixed_multihot_batch(
        np.random.default_rng(0), cfg.num_dense, cfg.table_sizes, 16, 4
    )
    losses = []
    for slice_ids in (None, SLICE_IDS):
        mesh = make_mesh(data=4, model=2, slice_ids=slice_ids)
        bf = ButterflyDLRM(model, mesh)
        params = bf.shard_params(
            jax.tree_util.tree_map(np.asarray, params0)
        )
        opt_state = init_opt_state("rwsadagrad", params)
        step = bf.make_train_step("rwsadagrad", 16, params, opt_state)
        _, _, loss, _ = step(
            params, opt_state, bf.shard_batch(hb.to_device()), 0.05
        )
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
