"""Golden parity test against the reference README smoke run.

The reference README (README.md:141-148) documents that
`python dlrm_s_pytorch.py --mini-batch-size=2 --data-size=6` prints losses
0.451893 / 0.402002 / 0.275460 over 3 iterations. Both frameworks initialize
weights and generate data from the same numpy global-RNG sequence
(dlrm_s_pytorch.py:221-225, 280-284; dlrm_data_pytorch.py:899-960), so matching
these losses end-to-end validates: init distributions and ordering, the padded
multi-hot embedding lookup + sum pooling, the dot interaction with triangle
extraction, MLP activation placement, MSE loss, and the SGD update (including
the scatter-add table gradient path).
"""

import numpy as np
import pytest

from dlrm_tpu.config import DLRMConfig, TrainConfig
from dlrm_tpu.data.random_data import RandomDataset
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.optim.optimizers import init_opt_state
from dlrm_tpu.train.step import make_train_step

# Golden losses obtained by running the reference itself on this machine:
#   python /root/reference/dlrm_s_pytorch.py --mini-batch-size=2 --data-size=6
#   -> loss 0.025266 / 0.180494 / 0.083240
# (The README.md:141-148 values 0.451893/0.402002/0.275460 are stale — the
# reference's data generator changed after they were recorded; the live
# reference no longer reproduces them either.)
GOLDEN_LOSSES = [0.025266, 0.180494, 0.083240]


def run_smoke(optimizer="sgd", lr=0.01, loss="mse"):
    model_cfg = DLRMConfig(
        embedding_dim=2,
        table_sizes=(4, 3, 2),
        mlp_bot=(4, 3, 2),
        mlp_top=(4, 2, 1),
        interaction="dot",
        loss=loss,
        num_indices_per_lookup=10,
    )
    train_cfg = TrainConfig(
        mini_batch_size=2, data_size=6, learning_rate=lr, optimizer=optimizer
    )
    model = DLRMModel(model_cfg)
    # reference order: seed, then model init consumes np.random, then the
    # dataset resets the seed on first access (dlrm_data_pytorch.py:635-638)
    np.random.seed(train_cfg.numpy_rand_seed)
    params = model.init_params_numpy()
    data = RandomDataset(model_cfg, train_cfg)
    step = make_train_step(model, optimizer)
    opt_state = init_opt_state(optimizer, params)
    losses = []
    for host_batch in data:
        batch = host_batch.to_device()
        params, opt_state, loss_v, _ = step(params, opt_state, batch, lr)
        losses.append(float(loss_v))
    return losses


def test_readme_smoke_golden_losses():
    losses = run_smoke()
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, atol=5e-6)


def test_smoke_deterministic_across_runs():
    assert run_smoke() == run_smoke()
