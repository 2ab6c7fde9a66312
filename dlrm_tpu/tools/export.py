"""Serialized model export for serving.

The reference exports ONNX graphs (--save-onnx, dlrm_s_pytorch.py:1824-1904).
The TPU-native equivalent is StableHLO via jax.export: the jitted forward pass
is lowered, serialized, and can be reloaded (jax.export.deserialize) or fed to
any StableHLO-consuming runtime (XLA, IREE, TF). We export the inference
forward with a fixed batch shape (and optionally the quantized-table variant).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax

from dlrm_tpu.data.batch import Batch
from dlrm_tpu.models.dlrm import DLRMModel


def export_forward(
    model: DLRMModel,
    params,
    batch_size: int,
    path: str,
    wt: bool = True,
) -> str:
    """Serialize the inference forward to <path> (StableHLO bytes).

    wt=True exports (params, dense, idx, wt) -> probs; wt=False exports
    (params, dense, idx) -> probs (all bags full, unweighted pooling).
    Static shapes; reload with load_forward()."""
    from jax import export as jexport

    cfg = model.cfg
    t, h = cfg.num_tables, cfg.num_indices_per_lookup

    dense_s = jax.ShapeDtypeStruct((batch_size, cfg.num_dense), np.float32)
    idx_s = jax.ShapeDtypeStruct((t, batch_size, h), np.int32)
    if wt:

        def fwd(p, dense, idx, wt_arr):
            return model.apply(
                p, Batch(dense=dense, idx=idx, wt=wt_arr, labels=None)
            )

        wt_s = jax.ShapeDtypeStruct((t, batch_size, h), np.float32)
        exported = jexport.export(jax.jit(fwd))(
            params, dense_s, idx_s, wt_s
        )
    else:

        def fwd(p, dense, idx):
            return model.apply(
                p, Batch(dense=dense, idx=idx, wt=None, labels=None)
            )

        exported = jexport.export(jax.jit(fwd))(params, dense_s, idx_s)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_forward(path: str):
    """Deserialize an exported forward; returns a callable
    (params, dense, idx, wt) -> probs."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return exported.call


def stablehlo_text(model: DLRMModel, params, batch_size: int) -> str:
    """Human-readable StableHLO of the forward (debug/plot-compute-graph
    analog of --plot-compute-graph)."""
    cfg = model.cfg
    t, h = cfg.num_tables, cfg.num_indices_per_lookup

    def fwd(p, dense, idx, wt_arr):
        return model.apply(p, Batch(dense=dense, idx=idx, wt=wt_arr, labels=None))

    dense_s = jax.ShapeDtypeStruct((batch_size, cfg.num_dense), np.float32)
    idx_s = jax.ShapeDtypeStruct((t, batch_size, h), np.int32)
    wt_s = jax.ShapeDtypeStruct((t, batch_size, h), np.float32)
    return jax.jit(fwd).lower(params, dense_s, idx_s, wt_s).as_text()
