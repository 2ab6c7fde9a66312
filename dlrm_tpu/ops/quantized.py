"""Row-wise quantized embedding lookups for inference (int8 / int4).

Capability parity with the reference's post-training quantized inference path
(quantize_embedding, dlrm_s_pytorch.py:465-481; lookup :430-450 via ATen
ops.quantized.embedding_bag_{4bit,byte}_{prepack,rowwise_offsets}): each row is
affine-quantized with its own (scale, bias); lookups gather the quantized rows,
dequantize, and sum-pool.

TPU-native layout decisions:
  * int8 rows stored as an [n, d] int8 array (the natural (32,128)-tileable
    dtype); int4 packed two-per-byte into [n, d/2] uint8 and unpacked with
    vector bit ops in-kernel — XLA fuses unpack+dequant+pool into the gather.
  * scale/bias kept as separate fp32 [n] vectors rather than interleaved at
    the end of each row (ATen's prepack layout) — interleaving would break the
    dense-tile layout that the MXU/VPU want.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_table(table: np.ndarray, bits: int) -> Dict[str, np.ndarray]:
    """Row-wise affine quantization: q = round((x - min) / scale), scale =
    (max - min) / (2^bits - 1). Matches ATen's rowwise prepack semantics."""
    if bits not in (4, 8):
        raise ValueError("bits must be 4 or 8")
    table = np.asarray(table, dtype=np.float32)
    n, d = table.shape
    lo = table.min(axis=1)
    hi = table.max(axis=1)
    qmax = (1 << bits) - 1
    scale = (hi - lo) / qmax
    scale = np.where(scale == 0.0, 1.0, scale).astype(np.float32)
    q = np.clip(
        np.round((table - lo[:, None]) / scale[:, None]), 0, qmax
    ).astype(np.uint8)
    if bits == 4:
        if d % 2:
            raise ValueError("int4 packing requires an even embedding dim")
        q = (q[:, 0::2] | (q[:, 1::2] << 4)).astype(np.uint8)  # [n, d/2]
    # bits are not stored: they are inferred from the packed width
    # (int4 rows are d/2 bytes wide), keeping the pytree free of static leaves
    return {"qvals": q, "scale": scale, "bias": lo.astype(np.float32)}


def infer_bits(qtable: Dict, dim: int) -> int:
    return 8 if qtable["qvals"].shape[-1] == dim else 4


def _unpack_int4(q: jax.Array) -> jax.Array:
    lo = (q & 0xF).astype(jnp.uint8)
    hi = (q >> 4).astype(jnp.uint8)
    # interleave back to original column order
    n = q.shape[:-1]
    d2 = q.shape[-1]
    out = jnp.stack([lo, hi], axis=-1).reshape(*n, d2 * 2)
    return out


def quantized_embedding_bag(
    qtable: Dict,
    idx: jax.Array,  # [B, H] (or [T, B, H] when stacked/flattened upstream)
    wt: Optional[jax.Array] = None,
    bits: int = 8,
) -> jax.Array:
    """Gather + dequantize + weighted sum-pool. Pooling is distributive over
    the affine dequant, but we dequantize per row (not per pooled bag) to
    match the reference kernels' numerics exactly."""
    q = jnp.take(qtable["qvals"], idx, axis=0)  # [..., H, d(/2)]
    if bits == 4:
        q = _unpack_int4(q)
    scale = jnp.take(qtable["scale"], idx, axis=0)[..., None]  # [..., H, 1]
    bias = jnp.take(qtable["bias"], idx, axis=0)[..., None]
    rows = q.astype(jnp.float32) * scale + bias
    if wt is None:
        return jnp.sum(rows, axis=-2)
    return jnp.einsum("...hd,...h->...d", rows, wt.astype(rows.dtype))


def dequantize_table(qtable: Dict, bits: int) -> np.ndarray:
    q = np.asarray(qtable["qvals"])
    if bits == 4:
        lo = q & 0xF
        hi = q >> 4
        q = np.stack([lo, hi], axis=-1).reshape(q.shape[0], -1)
    return (
        q.astype(np.float32) * np.asarray(qtable["scale"])[:, None]
        + np.asarray(qtable["bias"])[:, None]
    )


# ---------------------------------------------------------------- MLPs
def quantize_mlp(layers, bits: int = 8):
    """Post-training quantization of an MLP's weights for inference — the
    counterpart of the reference's dynamic quantization of Linear modules
    (torch.quantization.quantize_dynamic to qint8/float16,
    dlrm_s_pytorch.py:1473-1480).

    bits=8: symmetric per-output-channel int8 (the MXU multiplies int8
    natively, accumulating int32); bits=16: bfloat16 weights (the TPU
    analog of the reference's float16 mode)."""
    out = []
    for layer in layers:
        w = np.asarray(layer["w"], np.float32)
        b = np.asarray(layer["b"], np.float32)
        if bits == 16:
            out.append({
                "qw": jnp.asarray(w, jnp.bfloat16),
                "b": jnp.asarray(b),
                "mode": "bf16",
            })
        elif bits == 8:
            scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0  # [out]
            q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
            out.append({
                "qw": jnp.asarray(q),
                "w_scale": jnp.asarray(scale, jnp.float32),
                "b": jnp.asarray(b),
                "mode": "int8",
            })
        else:
            raise ValueError(f"quantize_mlp bits must be 8 or 16, got {bits}")
    return out


def quantized_linear(layer, x: jax.Array) -> jax.Array:
    """One quantize_mlp() layer, no activation. int8 mode dynamically
    quantizes the activations per batch (symmetric per-tensor, like torch's
    dynamic qint8 Linear) and runs the matmul in int8 on the MXU."""
    if layer["mode"] == "bf16":
        return jnp.dot(
            x.astype(jnp.bfloat16), layer["qw"],
            preferred_element_type=jnp.float32,
        ) + layer["b"]
    x = x.astype(jnp.float32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, layer["qw"],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * layer["w_scale"]) + layer["b"]


def apply_mlp_quantized(layers, x: jax.Array, sigmoid_layer: int = -1):
    """Inference forward through a quantize_mlp() tower."""
    for i, layer in enumerate(layers):
        y = quantized_linear(layer, x)
        x = jax.nn.sigmoid(y) if i == sigmoid_layer else jax.nn.relu(y)
    return x
