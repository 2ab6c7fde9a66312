"""Checkpoint round-trip + resume fast-forward (dlrm_s_pytorch.py:1398-1456)."""

import numpy as np
import pytest

import jax

from dlrm_tpu.config import DLRMConfig, TrainConfig
from dlrm_tpu.data.random_data import RandomDataset
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.train import checkpoint as ckpt
from dlrm_tpu.train.harness import Trainer
from dlrm_tpu.train.step import make_train_step

CFG = DLRMConfig(
    embedding_dim=4, table_sizes=(50, 20), mlp_bot=(8, 4), mlp_top=(4, 1),
    loss="bce",
)


def test_roundtrip(tmp_path):
    model = DLRMModel(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = init_opt_state("rwsadagrad", params)
    ckpt.save_checkpoint(str(tmp_path / "ck"), params, opt_state, {"epoch": 2})
    p2, o2, meta = ckpt.load_checkpoint(str(tmp_path / "ck"), params, opt_state)
    assert meta["epoch"] == 2
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(o2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_rejected(tmp_path):
    model = DLRMModel(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(tmp_path / "ck"), params)
    other = DLRMModel(CFG.replace(embedding_dim=8, mlp_bot=(8, 8)))
    bad = other.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shape"):
        ckpt.load_checkpoint(str(tmp_path / "ck"), bad)


def test_trainer_save_on_best_and_resume(tmp_path):
    import dataclasses

    tc = TrainConfig(
        mini_batch_size=8,
        num_batches=6,
        optimizer="sgd",
        learning_rate=0.05,
        test_freq=3,
        save_model=str(tmp_path / "best"),
        round_targets=True,
    )
    model = DLRMModel(CFG)
    train_data = RandomDataset(CFG, tc)
    test_data = RandomDataset(CFG, tc, pad_last_batch=True)
    trainer = Trainer(model, tc, train_data, test_data)
    state = trainer.train()
    assert (tmp_path / "best" / "arrays.npz").exists()

    # resume: epoch recorded as finished -> no further training occurs
    tc2 = dataclasses.replace(tc, load_model=str(tmp_path / "best"))
    trainer2 = Trainer(model, tc2, train_data, test_data)
    st2 = trainer2.init_state()
    assert st2.best_acc > 0.0
