"""Row-wise quantized embedding lookups for inference (int8 / int4).

Capability parity with the reference's post-training quantized inference path
(quantize_embedding, dlrm_s_pytorch.py:465-481; lookup :430-450 via ATen
ops.quantized.embedding_bag_{4bit,byte}_{prepack,rowwise_offsets}): each row is
affine-quantized with its own (scale, bias); lookups gather the quantized rows,
dequantize, and sum-pool.

TPU-native layout decisions:
  * int8 rows stored as uint8 bytes; int4 packed two-per-byte and unpacked
    with vector bit ops in-kernel — XLA fuses unpack+dequant+pool into the
    gather.
  * scale/bias are INLINED as 8 trailing bytes per row (two fp32,
    bitcast), exactly ATen's rowwise prepack layout. Measured rationale:
    TPU row gathers are issue-rate bound (~12-18ns per gather regardless
    of row width), so separate scale/bias vectors cost two EXTRA full
    gathers per hit — the 3-gather layout ran 47ms per 8192-batch vs
    ~21ms for one fused-row gather (bench_scripts/infer_bench.py).
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
    # prepack: [data bytes | fp32 scale | fp32 bias] per row — one gather
    # fetches everything. bits are inferred from the packed width (int8
    # rows are d+8 bytes, int4 rows d/2+8), keeping the pytree free of
    # static leaves.
    sb = np.empty((n, 8), np.uint8)
    sb[:, :4] = scale.view(np.uint8).reshape(n, 4)
    sb[:, 4:] = lo.astype(np.float32).view(np.uint8).reshape(n, 4)
    return {"packed": np.concatenate([q, sb], axis=1)}


def infer_bits(qtable: Dict, dim: int) -> int:
    if "packed_g16" in qtable:
        return 8 if qtable["packed_g16"].shape[-1] // 16 == dim + 8 else 4
    return 8 if qtable["packed"].shape[-1] == dim + 8 else 4


def _unpack_int4(q: jax.Array) -> jax.Array:
    lo = (q & 0xF).astype(jnp.uint8)
    hi = (q >> 4).astype(jnp.uint8)
    # interleave back to original column order
    n = q.shape[:-1]
    d2 = q.shape[-1]
    out = jnp.stack([lo, hi], axis=-1).reshape(*n, d2 * 2)
    return out


def _dequant_pool(row: jax.Array, wt: Optional[jax.Array], bits: int):
    """Shared epilogue over gathered prepacked rows [..., H, bytes]:
    slice off the 8 trailing scale/bias bytes, dequantize per row (not
    per pooled bag, matching the reference kernels' numerics), pool."""
    q = row[..., :-8]
    if bits == 4:
        q = _unpack_int4(q)
    sb = jax.lax.bitcast_convert_type(
        row[..., -8:].reshape(*row.shape[:-1], 2, 4), jnp.float32
    )  # [..., H, 2]
    rows = q.astype(jnp.float32) * sb[..., 0:1] + sb[..., 1:2]
    if wt is None:
        return jnp.sum(rows, axis=-2)
    return jnp.einsum("...hd,...h->...d", rows, wt.astype(rows.dtype))


def quantized_embedding_bag(
    qtable: Dict,
    idx: jax.Array,  # [B, H] (or [T, B, H] when stacked/flattened upstream)
    wt: Optional[jax.Array] = None,
    bits: int = 8,
) -> jax.Array:
    """ONE gather per hit fetches [data | scale | bias] (prepacked row),
    then dequantize + weighted sum-pool in the fused epilogue."""
    row = jnp.take(qtable["packed"], idx, axis=0)  # [..., H, bytes]
    return _dequant_pool(row, wt, bits)


def dequantize_table(qtable: Dict, bits: int) -> np.ndarray:
    packed = np.asarray(qtable["packed"])
    q = packed[:, :-8]
    scale = np.ascontiguousarray(packed[:, -8:-4]).view(np.float32)[:, 0]
    bias = np.ascontiguousarray(packed[:, -4:]).view(np.float32)[:, 0]
    if bits == 4:
        lo = q & 0xF
        hi = q >> 4
        q = np.stack([lo, hi], axis=-1).reshape(q.shape[0], -1)
    return q.astype(np.float32) * scale[:, None] + bias[:, None]


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
            })
        elif bits == 8:
            scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0  # [out]
            q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
            out.append({
                "qw": jnp.asarray(q),
                "w_scale": jnp.asarray(scale, jnp.float32),
                "b": jnp.asarray(b),
            })
        else:
            raise ValueError(f"quantize_mlp bits must be 8 or 16, got {bits}")
    return out


def quantized_linear(layer, x: jax.Array) -> jax.Array:
    """One quantize_mlp() layer, no activation. int8 mode dynamically
    quantizes the activations per batch (symmetric per-tensor, like torch's
    dynamic qint8 Linear) and runs the matmul in int8 on the MXU. The mode
    is inferred structurally (int8 layers carry "w_scale") so the pytree
    holds only arrays and stays jittable."""
    if "w_scale" not in layer:
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


# ------------------------------------------------- group-16 packed layout
# The (32,128) u8 tile pads any row-addressable [n, row_bytes] array to 128
# bytes per row, inflating int4's 72-byte prepacked rows 1.78x. Packing 16
# rows per 1152-byte line (72*16 = 9*128) eliminates the tile waste — the
# layout that fits the UNCAPPED 204M-row flagship's int4 state (13.7 GiB)
# on a single 16 GiB chip. Lookup stays ONE lane-aligned whole-line
# gather per hit + a vectorized 16-way select (an unaligned 2-D-start
# sliced gather lowers ~100x slower — see take_group16).


def pack_group16(packed: np.ndarray) -> np.ndarray:
    """[n, row_bytes] prepacked rows -> [ceil(n/16), 16*row_bytes] lines."""
    n, rb = packed.shape
    if (16 * rb) % 128 != 0:
        raise ValueError(f"16*{rb} must be a multiple of 128")
    pad = (-n) % 16
    if pad:
        packed = np.concatenate(
            [packed, np.zeros((pad, rb), np.uint8)], axis=0
        )
    return np.ascontiguousarray(packed).reshape(-1, 16 * rb)


def take_group16(lines: jax.Array, idx: jax.Array, row_bytes: int):
    """Gather prepacked rows from the group-16 layout. One LANE-ALIGNED
    whole-line gather per hit (a 2-D-start gather with an unaligned
    72-byte slice lowers ~100x slower on TPU — measured 1.7us/hit), then
    a vectorized 16-way select extracts the hit's row bytes.
    Returns [..., row_bytes] u8."""
    shape = idx.shape
    flat = idx.reshape(-1)
    line = jnp.take(lines, flat // 16, axis=0)  # [N, 16*row_bytes]
    case = (flat % 16).astype(jnp.int32)  # [N]
    out = jnp.zeros((flat.shape[0], row_bytes), jnp.uint8)
    for k in range(16):
        sl = line[:, k * row_bytes : (k + 1) * row_bytes]
        out = jnp.where((case == k)[:, None], sl, out)
    return out.reshape(*shape, row_bytes)


def quantized_embedding_bag_group16(
    lines: jax.Array,  # [n_groups, 16*row_bytes] u8
    idx: jax.Array,
    wt: Optional[jax.Array],
    dim: int,
    bits: int,
) -> jax.Array:
    row_bytes = (dim if bits == 8 else dim // 2) + 8
    row = take_group16(lines, idx, row_bytes)
    return _dequant_pool(row, wt, bits)
