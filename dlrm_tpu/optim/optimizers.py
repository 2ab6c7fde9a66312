"""Optimizers: SGD, Adagrad, and row-wise sparse Adagrad (RWSAdagrad).

Semantics match the reference exactly:
  * sgd      — p -= lr * g (torch.optim.SGD, dlrm_s_pytorch.py:1342-1346)
  * adagrad  — sum += g^2; p -= lr * g / (sqrt(sum) + eps), eps=1e-10
               (torch.optim.Adagrad defaults)
  * rwsadagrad — embedding tables keep ONE accumulator scalar per row,
               updated with mean(g_row^2); p_row -= lr * g_row / (sqrt(acc) + eps)
               (optim/rwsadagrad.py:117-148). Non-table params fall back to
               element-wise Adagrad (:145-148).

In JAX, table gradients arrive as dense arrays whose untouched rows are exactly
zero (the VJP of gather is scatter-add), so the row-wise accumulator update
momentum += mean(g_row^2) adds 0 for untouched rows — numerically identical to
the reference's sparse-row update. The fused Pallas backward (ops/embedding_pallas)
later replaces the dense materialization without changing this math.

lr is a traced scalar argument so the host-side LR policy drives it without
recompilation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

ADAGRAD_EPS = 1e-10

OptState = Dict[str, Any]


def path_keys(path):
    """Dict keys / sequence indices along a jax tree path (the shared
    helper behind table-vs-dense routing here and the sharding specs in
    parallel/butterfly.py and parallel/gspmd.py)."""
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(p.key)
        elif hasattr(p, "idx"):
            keys.append(p.idx)
    return keys


def _is_table_path(path) -> bool:
    """Embedding-table leaves (2-D arrays under params['emb']) get the
    row-wise treatment under rwsadagrad."""
    keys = path_keys(path)
    if not keys or keys[0] != "emb":
        return False
    # MD projections are dense nn.Linear-style params in the reference
    # (PrEmbeddingBag.proj) -> element-wise Adagrad, not row-wise.
    return keys[-1] != "proj"


def init_opt_state(name: str, params) -> OptState:
    if name == "sgd":
        return {"step": jnp.zeros((), jnp.int32)}
    if name == "adagrad":
        accum = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return {"step": jnp.zeros((), jnp.int32), "accum": accum}
    if name == "rwsadagrad":

        def make_acc(path, p):
            if _is_table_path(path) and p.ndim == 2:
                return jnp.zeros((p.shape[0],), jnp.float32)  # one scalar per row
            return jnp.zeros_like(p, jnp.float32)

        accum = jax.tree_util.tree_map_with_path(make_acc, params)
        return {"step": jnp.zeros((), jnp.int32), "accum": accum}
    raise ValueError(f"optimizer {name!r} not supported")


def apply_updates(
    name: str,
    params,
    grads,
    state: OptState,
    lr: jax.Array,
    eps: float = ADAGRAD_EPS,
) -> Tuple[Any, OptState]:
    step = state["step"] + 1
    if name == "sgd":
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_params, {"step": step}

    if name == "adagrad":
        new_accum = jax.tree_util.tree_map(
            lambda a, g: a + jnp.square(g.astype(jnp.float32)), state["accum"], grads
        )
        new_params = jax.tree_util.tree_map(
            lambda p, g, a: p - lr * g / (jnp.sqrt(a) + eps),
            params,
            grads,
            new_accum,
        )
        return new_params, {"step": step, "accum": new_accum}

    if name == "rwsadagrad":

        def upd(path, p, g, a):
            g32 = g.astype(jnp.float32)
            if _is_table_path(path) and p.ndim == 2:
                a_new = a + jnp.mean(jnp.square(g32), axis=1)  # [rows]
                p_new = p - lr * g32 / (jnp.sqrt(a_new) + eps)[:, None]
            else:
                a_new = a + jnp.square(g32)
                p_new = p - lr * g32 / (jnp.sqrt(a_new) + eps)
            return p_new, a_new

        flat = jax.tree_util.tree_map_with_path(upd, params, grads, state["accum"])
        new_params = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_accum = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        return new_params, {"step": step, "accum": new_accum}

    raise ValueError(f"optimizer {name!r} not supported")
