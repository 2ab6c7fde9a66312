"""Quantized (int8/int4) embedding inference (dlrm_s_pytorch.py:430-481)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlrm_tpu.config import DLRMConfig, TrainConfig
from dlrm_tpu.data.random_data import RandomDataset
from dlrm_tpu.models.dlrm import DLRMModel
from dlrm_tpu.ops import quantized as Q


@pytest.mark.parametrize("bits", [8, 4])
def test_quantize_roundtrip(bits):
    rng = np.random.default_rng(0)
    table = rng.normal(0, 0.1, size=(50, 16)).astype(np.float32)
    qt = Q.quantize_table(table, bits)
    deq = Q.dequantize_table(qt, bits)
    # max error bounded by half a quantization step per row
    step = (table.max(axis=1) - table.min(axis=1)) / ((1 << bits) - 1)
    assert np.all(np.abs(deq - table) <= step[:, None] * 0.5 + 1e-7)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_bag_matches_dequantized_dense(bits):
    rng = np.random.default_rng(1)
    table = rng.normal(0, 0.1, size=(40, 8)).astype(np.float32)
    qt = jax.tree_util.tree_map(jnp.asarray, Q.quantize_table(table, bits))
    idx = jnp.asarray(rng.integers(0, 40, size=(6, 5)).astype(np.int32))
    wt = jnp.asarray((rng.random((6, 5)) < 0.8).astype(np.float32))
    got = np.asarray(Q.quantized_embedding_bag(qt, idx, wt, bits=bits))
    deq = Q.dequantize_table(Q.quantize_table(table, bits), bits)
    want = np.einsum("bhd,bh->bd", deq[np.asarray(idx)], np.asarray(wt))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("bits", [8, 4])
def test_model_quantized_inference_close_to_fp32(bits):
    cfg = DLRMConfig(
        embedding_dim=8,
        table_sizes=(100, 30, 60),
        mlp_bot=(4, 8, 8),
        mlp_top=(8, 4, 1),
        loss="bce",
        num_indices_per_lookup=4,
    )
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    tc = TrainConfig(mini_batch_size=8, num_batches=1)
    batch = RandomDataset(cfg, tc)[0].to_device()
    p_fp32 = np.asarray(model.apply(params, batch))
    qparams = model.quantize_embeddings(params, bits)
    p_q = np.asarray(jax.jit(model.apply)(qparams, batch))
    tol = 0.02 if bits == 8 else 0.12
    np.testing.assert_allclose(p_q, p_fp32, atol=tol)
    assert "stacked" not in qparams["emb"]  # fp32 table dropped
