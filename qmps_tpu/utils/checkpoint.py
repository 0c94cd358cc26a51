"""Checkpoint / resume.

The reference checkpoints by np.save-ing parameter trajectories mid-run
(qmps/new_time_evolve.py:294, scars.py:166-168) with no way to resume an
optimization.  Here a checkpoint is a complete restart state: pytree of
params, optimizer state, PRNG key and loop counters, saved atomically as an
npz with a JSON-encoded treedef.
"""
from __future__ import annotations

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, tree) -> None:
    """Atomically save a pytree of arrays/scalars."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(
        json.dumps(_treedef_to_spec(tree)).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_checkpoint(path: str, like=None):
    """Load a checkpoint; if ``like`` (a template pytree) is given, restore
    its exact structure, else return the nested spec structure."""
    with np.load(path, allow_pickle=False) as z:
        spec = json.loads(bytes(z["__treedef__"]).decode())
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(_count_leaves(spec))]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return _rebuild(spec, iter(leaves))


def _treedef_to_spec(tree):
    if isinstance(tree, dict):
        # jax.tree_util flattens dicts in SORTED key order — the spec must
        # match or leaves land under the wrong keys on reload
        return {
            "__dict__": {k: _treedef_to_spec(tree[k]) for k in sorted(tree)}
        }
    if isinstance(tree, (list, tuple)):
        return {"__list__": [_treedef_to_spec(v) for v in tree]}
    return "leaf"


def _count_leaves(spec):
    if spec == "leaf":
        return 1
    if "__dict__" in spec:
        return sum(_count_leaves(v) for v in spec["__dict__"].values())
    return sum(_count_leaves(v) for v in spec["__list__"])


def _rebuild(spec, it):
    if spec == "leaf":
        return next(it)
    if "__dict__" in spec:
        return {k: _rebuild(v, it) for k, v in spec["__dict__"].items()}
    return [_rebuild(v, it) for v in spec["__list__"]]
