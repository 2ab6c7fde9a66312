"""Checkpoint save/load: params + optimizer state + loop position + metrics.

Capability parity with the reference's torch.save/load checkpointing
(dlrm_s_pytorch.py:1398-1456 load with fast-forward, :1702-1715 save-on-best;
contents per inference():860-872): a directory holding one .npz of all arrays
(pytree flattened to path-keyed entries) plus meta.json for scalars. Sharded
arrays are gathered to host before writing (single-controller view), so a
checkpoint written by the butterfly path loads on a single chip and vice versa
via ButterflyDLRM.shard_params/unshard_params.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(jax.device_get(leaf))
    return flat


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in paths_leaves:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if key not in flat:
            raise KeyError(f"checkpoint missing array {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint array {key!r} has shape {arr.shape}, "
                f"expected {np.shape(leaf)}"
            )
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_checkpoint(
    path: str,
    params,
    opt_state=None,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    os.makedirs(path, exist_ok=True)
    arrays = {f"params/{k}": v for k, v in _flatten_with_paths(params).items()}
    if opt_state is not None:
        arrays.update(
            {f"opt/{k}": v for k, v in _flatten_with_paths(opt_state).items()}
        )
    tmp = os.path.join(path, ".arrays.npz.tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, os.path.join(path, "arrays.npz"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f, indent=1)


def load_checkpoint(
    path: str,
    params_template,
    opt_state_template=None,
) -> Tuple[Any, Any, Dict[str, Any]]:
    with np.load(os.path.join(path, "arrays.npz")) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten_like(
        params_template,
        {k[len("params/"):]: v for k, v in flat.items() if k.startswith("params/")},
    )
    opt_state = None
    if opt_state_template is not None:
        opt_flat = {
            k[len("opt/"):]: v for k, v in flat.items() if k.startswith("opt/")
        }
        if opt_flat:
            opt_state = _unflatten_like(opt_state_template, opt_flat)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, opt_state, meta
