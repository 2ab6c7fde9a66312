"""Feature-interaction ops.

dot: pairwise dot products of the (dense ++ pooled-embedding) feature vectors with
lower-triangle extraction, concatenated after the dense vector — semantics of
dlrm_s_pytorch.py:483-515 (bmm + custom li/lj gather, flattening order preserved).

cat: plain concatenation (dlrm_s_pytorch.py:505-507).

dcn: DCN-v2 low-rank cross network applied to the concatenated features
(torchrec DLRM_DCN variant, torchrec_dlrm/dlrm_main.py:598-617).

The bmm is expressed as an einsum so XLA maps it onto the MXU as a batched
matmul; the triangle gather uses static indices (one flat gather, fully fusable).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _tril_flat_indices(num_features: int, itself: bool) -> np.ndarray:
    """Static flattened [f*F+g] indices in the reference's iteration order
    (dlrm_s_pytorch.py:499-501): li=[i for i in range(F) for j in range(i+off)]."""
    offset = 1 if itself else 0
    f = num_features
    li = [i for i in range(f) for _ in range(i + offset)]
    lj = [j for i in range(f) for j in range(i + offset)]
    return np.asarray(li, dtype=np.int32) * f + np.asarray(lj, dtype=np.int32)


def dot_interaction(
    x: jax.Array,  # [B, d] bottom-MLP output
    ly: jax.Array,  # [B, T, d] pooled embeddings
    itself: bool = False,
) -> jax.Array:  # [B, d + num_pairs]
    batch, d = x.shape
    feats = jnp.concatenate([x[:, None, :], ly], axis=1)  # [B, F, d]
    num_f = feats.shape[1]
    z = jnp.einsum(
        "bfd,bgd->bfg", feats, feats, preferred_element_type=jnp.float32
    )  # [B, F, F] batched T·Tᵀ
    flat = _tril_flat_indices(num_f, itself)
    # cast the pairwise dots back to the compute dtype: fp32 accumulation on
    # the MXU, but downstream layers keep running in the caller's dtype
    z_flat = jnp.take(z.reshape(batch, num_f * num_f), flat, axis=1)
    return jnp.concatenate([x, z_flat.astype(x.dtype)], axis=1)


def cat_interaction(x: jax.Array, ly: jax.Array) -> jax.Array:
    batch = x.shape[0]
    return jnp.concatenate([x, ly.reshape(batch, -1)], axis=1)


def low_rank_cross_net(
    params: List[dict],  # per layer: {"v": [r, n], "w": [n, r], "b": [n]}
    x0: jax.Array,  # [B, n] concatenated features
) -> jax.Array:
    """DCN-v2 low-rank cross layers: x_{l+1} = x0 * (W_l @ (V_l @ x_l) + b_l) + x_l."""
    xl = x0
    for layer in params:
        low = jnp.einsum(
            "bn,rn->br", xl, layer["v"].astype(xl.dtype),
            preferred_element_type=jnp.float32,
        ).astype(xl.dtype)
        up = jnp.einsum(
            "br,nr->bn", low, layer["w"].astype(xl.dtype),
            preferred_element_type=jnp.float32,
        ).astype(xl.dtype)
        xl = x0 * (up + layer["b"].astype(xl.dtype)) + xl
    return xl


def projection_interaction(
    x: jax.Array,  # [B, d]
    ly: jax.Array,  # [B, T, d]
    w1: jax.Array,  # [F*d, p1*d] branch-1 projection
    w2: jax.Array,  # [F*d, p2*d] branch-2 projection
) -> jax.Array:
    """Projected pairwise interaction (torchrec DLRM_Projection analog,
    torchrec_dlrm/dlrm_main.py:618-635): both branches linearly project the
    concatenated features into p_i vectors of width d; their pairwise dot
    products (p1 x p2) are concatenated after the dense vector."""
    batch, d = x.shape
    feats = jnp.concatenate([x[:, None, :], ly], axis=1).reshape(batch, -1)  # [B, F*d]
    b1 = jnp.einsum(
        "bf,fk->bk", feats, w1.astype(feats.dtype),
        preferred_element_type=jnp.float32,
    ).astype(feats.dtype)
    b2 = jnp.einsum(
        "bf,fk->bk", feats, w2.astype(feats.dtype),
        preferred_element_type=jnp.float32,
    ).astype(feats.dtype)
    p1 = b1.reshape(batch, -1, d)  # [B, p1, d]
    p2 = b2.reshape(batch, -1, d)  # [B, p2, d]
    z = jnp.einsum("bpd,bqd->bpq", p1, p2, preferred_element_type=jnp.float32)
    return jnp.concatenate([x, z.reshape(batch, -1).astype(x.dtype)], axis=1)
