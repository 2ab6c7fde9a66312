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


def test_quantized_mlp_inference_close():
    """Dynamic int8/bf16 MLP quantization (dlrm_s_pytorch.py:1473-1480
    analog): quantized inference stays close to fp32 on random inputs."""
    import jax

    from dlrm_tpu.ops.mlp import apply_mlp, init_mlp
    from dlrm_tpu.ops.quantized import apply_mlp_quantized, quantize_mlp

    layers = init_mlp(jax.random.PRNGKey(0), (16, 64, 32, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 16), jnp.float32)
    ref = np.asarray(apply_mlp(layers, x, sigmoid_layer=2))
    got8 = np.asarray(
        apply_mlp_quantized(quantize_mlp(layers, 8), x, sigmoid_layer=2)
    )
    got16 = np.asarray(
        apply_mlp_quantized(quantize_mlp(layers, 16), x, sigmoid_layer=2)
    )
    assert np.abs(got8 - ref).max() < 0.05, np.abs(got8 - ref).max()
    assert np.abs(got16 - ref).max() < 0.05, np.abs(got16 - ref).max()


def test_quantized_mlp_through_model():
    import jax

    from dlrm_tpu.config import DLRMConfig
    from dlrm_tpu.data.random_data import fixed_multihot_batch
    from dlrm_tpu.models.dlrm import DLRMModel

    cfg = DLRMConfig(
        embedding_dim=16, table_sizes=(50, 80), mlp_bot=(4, 8, 16),
        mlp_top=(8, 4, 1), interaction="dot", loss="bce",
        num_indices_per_lookup=2,
    )
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = fixed_multihot_batch(
        np.random.default_rng(0), 4, cfg.table_sizes, 8, 2
    ).to_device()
    ref = np.asarray(model.apply(params, batch))
    qp = model.quantize_mlps(params, 8)
    got = np.asarray(model.apply(qp, batch))
    assert np.abs(got - ref).max() < 0.05, np.abs(got - ref).max()


@pytest.mark.parametrize("bits", [8, 4])
def test_group16_lookup_matches_rowwise(bits):
    """The zero-tile-waste group-16 layout must produce identical lookups
    to the row-addressable prepacked layout."""
    from dlrm_tpu.ops import quantized as Q

    rng = np.random.default_rng(0)
    n, d = 100, 16
    table = rng.normal(size=(n, d)).astype(np.float32)
    qt = Q.quantize_table(table, bits)
    # group16 needs 16*row_bytes % 128 == 0: row_bytes = d(+8)=24 (int8) /
    # d/2+8=16 (int4) -> 16*24=384, 16*16=256 both fine
    lines = Q.pack_group16(qt["packed"])
    idx = rng.integers(0, n, (7, 5)).astype(np.int32)
    wt = rng.uniform(0.5, 1.5, (7, 5)).astype(np.float32)
    import jax.numpy as jnp

    want = Q.quantized_embedding_bag(
        jax.tree_util.tree_map(jnp.asarray, qt), jnp.asarray(idx),
        jnp.asarray(wt), bits=bits,
    )
    got = Q.quantized_embedding_bag_group16(
        jnp.asarray(lines), jnp.asarray(idx), jnp.asarray(wt), d, bits
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_model_group16_inference_matches_rowwise():
    """model.quantize_embeddings(group16=True) must produce the same
    inference probabilities as the row-addressable quantized layout."""
    from dlrm_tpu.config import DLRMConfig, TrainConfig
    from dlrm_tpu.data.random_data import RandomDataset
    from dlrm_tpu.models.dlrm import DLRMModel

    cfg = DLRMConfig(
        embedding_dim=16, table_sizes=(60, 30, 40), mlp_bot=(4, 8, 16),
        mlp_top=(8, 4, 1), loss="bce", num_indices_per_lookup=4,
    )
    model = DLRMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    hb = RandomDataset(cfg, TrainConfig(mini_batch_size=16, num_batches=1))[0]
    b = hb.to_device()
    p_row = model.quantize_embeddings(params, 4)
    p_g16 = model.quantize_embeddings(params, 4, group16=True)
    assert "packed_g16" in p_g16["emb"]["quantized"]
    np.testing.assert_allclose(
        np.asarray(model.apply(p_g16, b)), np.asarray(model.apply(p_row, b)),
        rtol=1e-6, atol=1e-6,
    )
