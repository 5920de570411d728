"""Checkpoint I/O: param/opt-state pytrees as .npz with path-flattened keys.

Replaces the reference's ``torch.save(state_dict)`` per epoch (reference
``training.py:35-39``). A single portable .npz keeps the hermetic-test story
simple; the tree structure is re-imposed from a template pytree on load, so
key mismatches fail loudly instead of silently (the reference swallows both
save and load errors).

PyTorch ``model_state.pth`` files are handled separately by
``tpu_slu.models.torch_import``.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

_SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def save_pytree(path: str, tree) -> None:
    flat = _flatten(tree)
    tmp = path + ".tmp"
    np.savez(tmp, **flat)
    # np.savez appends .npz to names without it
    produced = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(produced, path)


def load_pytree(path: str, template):
    """Load arrays from ``path`` into the structure of ``template``."""
    with np.load(path) as data:
        flat = dict(data)

    def rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}{k}{_SEP}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [rebuild(v, f"{prefix}{i}{_SEP}") for i, v in enumerate(node)]
            return type(node)(vals)
        key = prefix.rstrip(_SEP)
        if key not in flat:
            raise KeyError(f"checkpoint {path} missing key {key!r}")
        arr = flat[key]
        leaf_shape = jnp.shape(node)
        if tuple(arr.shape) != tuple(leaf_shape):
            raise ValueError(
                f"checkpoint {path} key {key!r}: shape {arr.shape} != expected {leaf_shape}"
            )
        return jnp.asarray(arr)

    return rebuild(template)


# ---------------------------------------------------------------------------
# Orbax backend (optional): multi-host-safe, async-capable checkpointing for
# pod-scale runs. Selected with config `checkpoint_backend=orbax`; the .npz
# backend remains the default (single file, no deps, hermetic tests).
# ---------------------------------------------------------------------------


def save_pytree_orbax(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.tree.map(np.asarray, tree), force=True)
    ckptr.wait_until_finished()


def load_pytree_orbax(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path), jax.tree.map(np.asarray, template)
    )
    return jax.tree.map(jnp.asarray, restored)


def save(path: str, tree, backend: str = "npz") -> None:
    if backend == "orbax":
        save_pytree_orbax(path, tree)
    else:
        save_pytree(path, tree)


def load(path: str, template, backend: str = "npz"):
    if backend == "orbax":
        return load_pytree_orbax(path, template)
    return load_pytree(path, template)


def tree_equal(a, b) -> bool:
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    if treedef_a != treedef_b:
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(leaves_a, leaves_b))
