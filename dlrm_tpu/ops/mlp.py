"""MLP tower ops.

The reference builds nn.Linear stacks with ReLU after every layer except one
optional Sigmoid layer (create_mlp, dlrm_s_pytorch.py:208-246). Weights are stored
[n_in, n_out] here (torch stores the transpose) so forward is a plain x @ w — the
natural MXU layout.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def init_mlp_numpy(ln: Sequence[int]) -> List[dict]:
    """Reference-parity init: consumes np.random in the exact order of
    create_mlp (dlrm_s_pytorch.py:221-225): per layer, W ~ N(0, sqrt(2/(m+n)))
    of shape (m, n) then b ~ N(0, sqrt(1/m)) of shape (m,)."""
    layers = []
    for i in range(len(ln) - 1):
        n, m = int(ln[i]), int(ln[i + 1])
        w = np.random.normal(0.0, np.sqrt(2.0 / (m + n)), size=(m, n)).astype(
            np.float32
        )
        b = np.random.normal(0.0, np.sqrt(1.0 / m), size=m).astype(np.float32)
        layers.append({"w": jnp.asarray(w.T), "b": jnp.asarray(b)})
    return layers


def init_mlp(rng: jax.Array, ln: Sequence[int]) -> List[dict]:
    """Same distributions via the JAX PRNG (order-independent, splittable)."""
    layers = []
    for i in range(len(ln) - 1):
        n, m = int(ln[i]), int(ln[i + 1])
        rng, kw, kb = jax.random.split(rng, 3)
        w = jax.random.normal(kw, (n, m), jnp.float32) * np.sqrt(2.0 / (m + n))
        b = jax.random.normal(kb, (m,), jnp.float32) * np.sqrt(1.0 / m)
        layers.append({"w": w, "b": b})
    return layers


def apply_mlp(
    layers: List[dict], x: jax.Array, sigmoid_layer: int = -1
) -> jax.Array:
    """x @ w + b per layer; ReLU everywhere except Sigmoid at `sigmoid_layer`.

    Activations stay in the caller's compute dtype: matmuls accumulate in
    fp32 on the MXU (preferred_element_type) but the result is cast back, so
    a bfloat16 tower runs bfloat16 end to end instead of silently promoting
    every layer after the first to fp32."""
    dtype = x.dtype
    for i, layer in enumerate(layers):
        x = (
            jnp.dot(x, layer["w"].astype(dtype), preferred_element_type=jnp.float32)
            + layer["b"]
        ).astype(dtype)
        x = jax.nn.sigmoid(x) if i == sigmoid_layer else jax.nn.relu(x)
    return x
