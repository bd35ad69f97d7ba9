"""Checkpoint IO via orbax (SURVEY.md §5.4).

Parity with reference `ngp_pl/utils.py:4-38`:
  * full checkpoint = whole TrainState pytree (params + optimizer + density
    grid + occupancy + step) -> resume-capable
  * `slim_ckpt` drops everything except model params (and poses-refinement
    params when optimize_ext), giving a small deployable artifact
  * `load_ckpt` supports partial/prefix-filtered loads
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_ckpt(path: str, state: Dict[str, Any]):
    """Save a full train state to `path` (a directory)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, _to_numpy_tree(state), force=True)
    else:  # flat npz fallback
        flat, treedef = jax.tree_util.tree_flatten(state)
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "state.npz"),
                 **{f"leaf{i}": np.asarray(x) for i, x in enumerate(flat)})
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))


def load_ckpt(path: str, target: Optional[Dict[str, Any]] = None):
    """Load a checkpoint saved by save_ckpt.  With `target`, restores into
    the given pytree structure (required for the npz fallback)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX and not os.path.exists(os.path.join(path, "state.npz")):
        ckptr = ocp.PyTreeCheckpointer()
        if target is not None:
            return ckptr.restore(path, item=_to_numpy_tree(target))
        return ckptr.restore(path)
    data = np.load(os.path.join(path, "state.npz"))
    if target is None:
        raise ValueError("npz checkpoint needs a target pytree")
    flat, treedef = jax.tree_util.tree_flatten(target)
    leaves = [data[f"leaf{i}"] for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def slim_state(state: Dict[str, Any], save_poses: bool = False):
    """Params-only export (reference slim_ckpt, utils.py:28-38) + the
    occupancy state needed for rendering."""
    params = dict(state["params"])
    if not save_poses:
        params.pop("dR", None)
        params.pop("dT", None)
    return dict(params=params, occ=state["occ"], step=state["step"])


def save_slim_ckpt(path: str, state: Dict[str, Any],
                   save_poses: bool = False):
    save_ckpt(path, slim_state(state, save_poses))


def save_pytree(path: str, tree) -> None:
    """Generic nested-dict pytree -> .npz (keys are '/'-joined paths).
    Used by the depth (LeReS) stack for torch-free checkpoints."""
    import numpy as np
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(tree, ())
    np.savez(path, **flat)


def load_pytree(path: str):
    """Inverse of save_pytree."""
    import numpy as np
    data = np.load(path, allow_pickle=False)
    tree: Dict[str, Any] = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def _flatten_paths(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):  # match jax tree_flatten's dict-key order
            out.update(_flatten_paths(tree[k], prefix + (str(k),)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_paths(v, prefix + (str(i),)))
    else:
        out["/".join(prefix)] = tree
    return out


def load_ckpt_filtered(path: str, target: Dict[str, Any],
                       include_prefixes=("params",),
                       exclude_prefixes=()) -> Dict[str, Any]:
    """Prefix-filtered partial load (reference `extract_model_state_dict` /
    `load_ckpt`, `ngp_pl/utils.py:4-25`): restore only the leaves whose
    '/'-joined path starts with one of `include_prefixes` (and none of
    `exclude_prefixes`); all other leaves keep the `target` values.

    Tolerates checkpoints with a different tree (e.g. a slim ckpt loaded
    into a full TrainState): leaves absent from the checkpoint keep the
    target values, extra checkpoint leaves are ignored.
    """
    loaded = load_ckpt(path, target=None) if _HAVE_ORBAX else None
    if loaded is None:
        # npz fallback cannot restore without a matching structure; try the
        # full target first, else fail over to target as-is
        try:
            loaded = load_ckpt(path, target=target)
        except Exception:
            return target
    src = _flatten_paths(loaded)
    dst = _flatten_paths(target)

    def want(key: str) -> bool:
        return (any(key.startswith(p) for p in include_prefixes)
                and not any(key.startswith(p) for p in exclude_prefixes))

    merged = {}
    for key, tv in dst.items():
        if key in src and want(key):
            sv = np.asarray(src[key])
            if tv is not None and hasattr(tv, "shape") \
                    and tuple(sv.shape) != tuple(np.shape(tv)):
                merged[key] = tv           # shape mismatch: keep target
            else:
                merged[key] = sv
        else:
            merged[key] = tv
    # rebuild with the target's treedef
    flat, treedef = jax.tree_util.tree_flatten(target)
    keys = list(_flatten_paths(target).keys())
    return jax.tree_util.tree_unflatten(treedef,
                                        [merged[k] for k in keys])
