"""Checkpoint save/load: params + optimizer state + loop position + metrics.

Capability parity with the reference's torch.save/load checkpointing
(dlrm_s_pytorch.py:1398-1456 load with fast-forward, :1702-1715 save-on-best;
contents per inference():860-872), extended for the sharded path the way
SURVEY.md §5.4 calls for (orbax-style sharded checkpoints):

  * replicated leaves -> one path-keyed `arrays.npz` + `meta.json`;
  * model-axis-sharded leaves (the stacked tables, v_w, their optimizer
    accumulators) are written as PER-SHARD files `shard_{m:05d}.npz`, each
    holding that model shard's axis-0 block — the full 104 GiB stacked
    table is NEVER materialized on one host. A `sharding.json` manifest
    records which keys are sharded and into how many blocks.

Writer election: exactly one device replica (replica_id == 0) writes each
block, so multi-process meshes don't double-write (each process saves only
its addressable shards to a shared filesystem).

Loading is symmetric: a sharded TEMPLATE leaf (jax.Array with a NamedSharding
over "model") is assembled with jax.make_array_from_callback — each process
reads only the blocks it addresses; an unsharded template concatenates the
blocks (compat: a sharded checkpoint still loads on a single chip, and an
old single-file checkpoint still loads everywhere).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

SAVE_ID_KEY = "__save_id__"


def _flatten_with_paths(tree, to_numpy: bool = True) -> Dict[str, Any]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(jax.device_get(leaf)) if to_numpy else leaf
    return flat


def _model_shard_info(leaf):
    """(num_shards, block_len, axis) if leaf is sharded over a "model" mesh
    axis on some dim (dim 0 for row-laid tables, dim 1 for column-wise
    tables' feature split), else None."""
    from jax.sharding import NamedSharding

    sh = getattr(leaf, "sharding", None)
    if not isinstance(sh, NamedSharding):
        return None
    spec = sh.spec
    axis = next((i for i, s in enumerate(spec) if s == "model"), None)
    if axis is None:
        return None
    msize = int(sh.mesh.shape["model"])
    if msize <= 1 or leaf.shape[axis] % msize != 0:
        return None
    return msize, leaf.shape[axis] // msize, axis


def _unflatten_like(template, flat: Dict[str, Any]):
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in paths_leaves:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if key not in flat:
            raise KeyError(f"checkpoint missing array {key!r}")
        arr = flat[key]
        if tuple(np.shape(arr)) != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint array {key!r} has shape {np.shape(arr)}, "
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
    leaves = {
        f"params/{k}": v
        for k, v in _flatten_with_paths(params, to_numpy=False).items()
    }
    if opt_state is not None:
        leaves.update(
            {
                f"opt/{k}": v
                for k, v in _flatten_with_paths(
                    opt_state, to_numpy=False
                ).items()
            }
        )
    replicated: Dict[str, np.ndarray] = {}
    per_shard: Dict[int, Dict[str, np.ndarray]] = {}
    manifest: Dict[str, int] = {}
    for key, leaf in leaves.items():
        info = _model_shard_info(leaf)
        if info is None:
            replicated[key] = np.asarray(jax.device_get(leaf))
            continue
        msize, block, axis = info
        # manifest value: [num_shards, axis] (legacy checkpoints stored a
        # bare int meaning axis 0)
        manifest[key] = [msize, axis]
        for sh in leaf.addressable_shards:
            if sh.replica_id != 0:
                continue  # one writer per block across data replicas/hosts
            ia = sh.index[axis]
            start = 0 if ia.start is None else int(ia.start)
            rank = start // block
            per_shard.setdefault(rank, {})[key] = np.asarray(sh.data)

    # ---- crash consistency: a checkpoint directory is rewritten in place on
    # every save-on-best, and its files (arrays.npz + per-shard npz) replace
    # independently — so a crash mid-save could otherwise leave a silently
    # loadable mix of two optimizer steps. Every file is stamped with one
    # save id; meta.json (carrying the id) is written LAST, after a global
    # barrier, and load_checkpoint verifies every file it reads against it.
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        seed = np.frombuffer(uuid.uuid4().bytes[:8], np.int64)
        seed = multihost_utils.broadcast_one_to_all(seed)
        save_id = f"{int(seed[0]) & (2**63 - 1):016x}"
    else:
        save_id = uuid.uuid4().hex
    stamp = np.frombuffer(save_id.encode(), np.uint8)

    def _atomic_json(name: str, obj) -> None:
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1)
        os.replace(tmp, os.path.join(path, name))

    def _atomic_npz(name: str, arrays: Dict[str, np.ndarray]) -> None:
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "wb") as f:
            np.savez(f, **{SAVE_ID_KEY: stamp}, **arrays)
        os.replace(tmp, os.path.join(path, name))

    # replicated files get a single writer too (process 0) — on a shared
    # filesystem every process writing the same tmp path races os.replace
    if jax.process_index() == 0:
        _atomic_npz("arrays.npz", replicated)
        if manifest:
            _atomic_json("sharding.json", manifest)
        else:
            # an UNsharded save into a directory that previously held a
            # sharded one must retire the stale manifest — load probes every
            # manifest entry's shard file and would reject the (complete,
            # valid) checkpoint on the old files' save ids
            try:
                os.remove(os.path.join(path, "sharding.json"))
            except FileNotFoundError:
                pass
    for rank, arrays in per_shard.items():
        _atomic_npz(f"shard_{rank:05d}.npz", arrays)
    if jax.process_count() > 1:
        from dlrm_tpu.parallel.multihost import barrier

        barrier("ckpt_save")  # every writer's files durable before commit
    if jax.process_index() == 0:
        _atomic_json("meta.json", {**(meta or {}), "save_id": save_id})
    if jax.process_count() > 1:
        from dlrm_tpu.parallel.multihost import barrier

        # commit barrier: no rank may RETURN before meta.json exists —
        # otherwise a rank!=0 caller could load (or signal a consumer)
        # while the directory still carries the previous save's meta,
        # making load_checkpoint raise a spurious inconsistency error
        barrier("ckpt_commit")


def _check_save_id(z, fname: str, expect_id: Optional[str]) -> None:
    if expect_id is None:
        return  # pre-save-id checkpoint format
    got = (
        bytes(np.asarray(z[SAVE_ID_KEY])).decode()
        if SAVE_ID_KEY in z.files
        else None
    )
    if got != expect_id:
        raise ValueError(
            f"checkpoint is inconsistent: {fname} carries save id {got!r} "
            f"but meta.json committed {expect_id!r} — the directory mixes "
            "files from different saves (interrupted save?); restore from "
            "a complete checkpoint"
        )


def _load_flat(
    path: str, expect_id: Optional[str] = None
) -> Tuple[Dict[str, Any], Dict[str, int]]:
    with np.load(os.path.join(path, "arrays.npz")) as z:
        _check_save_id(z, "arrays.npz", expect_id)
        flat: Dict[str, Any] = {
            k: z[k] for k in z.files if k != SAVE_ID_KEY
        }
    manifest: Dict[str, int] = {}
    mpath = os.path.join(path, "sharding.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    return flat, manifest


class _ShardedEntry:
    """Lazy per-block view of one sharded checkpoint array."""

    def __init__(self, path: str, key: str, num_shards: int,
                 expect_id: Optional[str] = None, axis: int = 0):
        self.path = path
        self.key = key
        self.num_shards = num_shards
        self.expect_id = expect_id
        self.axis = axis
        self._blocks: Dict[int, np.ndarray] = {}
        # probe block 0 for geometry
        b0 = self.block(0)
        self.block_rows = b0.shape[axis]
        shape = list(b0.shape)
        shape[axis] *= num_shards
        self.shape = tuple(shape)
        self.dtype = b0.dtype

    def block(self, rank: int) -> np.ndarray:
        if rank not in self._blocks:
            fname = os.path.join(self.path, f"shard_{rank:05d}.npz")
            with np.load(fname) as z:
                _check_save_id(z, os.path.basename(fname), self.expect_id)
                self._blocks[rank] = z[self.key]
        return self._blocks[rank]

    def concat(self) -> np.ndarray:
        return np.concatenate(
            [self.block(r) for r in range(self.num_shards)], axis=self.axis
        )


def load_checkpoint(
    path: str,
    params_template,
    opt_state_template=None,
) -> Tuple[Any, Any, Dict[str, Any]]:
    """Templates may be host arrays (leaves load as numpy; sharded entries
    concatenate) or sharded jax.Arrays (sharded entries assemble in place
    via make_array_from_callback — no host-full copy)."""
    meta_path = os.path.join(path, "meta.json")
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    expect_id = meta.pop("save_id", None)  # internal; not part of caller meta
    flat, manifest = _load_flat(path, expect_id)
    entries = {}
    for key, m in manifest.items():
        # legacy manifests store a bare int (axis-0 row sharding)
        msize, axis = (int(m), 0) if isinstance(m, int) else (
            int(m[0]), int(m[1])
        )
        entries[key] = _ShardedEntry(path, key, msize, expect_id, axis=axis)

    def _resolve(template):
        tflat = _flatten_with_paths(template, to_numpy=False)
        out: Dict[str, Any] = {}
        for key, leaf in tflat.items():
            if key in flat:
                out[key] = flat[key]
            elif key in entries:
                ent = entries[key]
                info = _model_shard_info(leaf)
                if (
                    info is not None
                    and info[0] == ent.num_shards
                    and info[2] == ent.axis
                ):
                    block, axis = info[1], info[2]
                    out[key] = jax.make_array_from_callback(
                        ent.shape,
                        leaf.sharding,
                        lambda idx, ent=ent, block=block, axis=axis:
                        ent.block(
                            (
                                0
                                if idx[axis].start is None
                                else int(idx[axis].start)
                            )
                            // block
                        ),
                    )
                else:
                    out[key] = ent.concat()
        return out

    presolved = {
        k[len("params/"):]: v
        for k, v in _resolve(
            {"params": params_template}
        ).items()
        if k.startswith("params/")
    }
    params = _unflatten_like(params_template, presolved)
    opt_state = None
    if opt_state_template is not None:
        oresolved = {
            k[len("opt/"):]: v
            for k, v in _resolve({"opt": opt_state_template}).items()
            if k.startswith("opt/")
        }
        if oresolved:
            opt_state = _unflatten_like(opt_state_template, oresolved)
    return params, opt_state, meta
