"""Orbax checkpointing with the reference's save/restore contract.

Counterpart of reference save_checkpoint / restart / warm-start
(model/train.py:74-114,591-646):

* names: ``checkpoint_last`` every eval, ``checkpoint_best`` on val-NLL
  improvement, ``checkpoint_{step}`` with save-all,
* payload: model params, all optimizer states, train_step, best_val_loss,
  and the vocab (stored as metadata.json next to the arrays),
* warm start (``TRAIN.load_from_previous``): generator params only,
  non-strict — the TPU equivalent of trimming the ``generator.`` prefix
  (train.py:591-609, generate.py:135-140),
* only process 0 writes; all processes synchronize around the write
  (sync_workers barrier, train.py:65-71).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..parallel.mesh import sync_global_devices


_CKPTR = None


def _ckptr():
    # Singleton: per-call StandardCheckpointer instances race their async
    # write machinery against GC ("cannot schedule new futures after
    # shutdown" when a collected instance tears down shared executors).
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(work_dir: str, name: str, payload: dict,
                    metadata: dict | None = None) -> str:
    """Save a pytree checkpoint (process 0 only, barrier-synced)."""
    path = os.path.abspath(os.path.join(work_dir, name))
    if jax.process_index() == 0:
        ckptr = _ckptr()
        ckptr.save(path, payload, force=True)
        # StandardCheckpointer saves asynchronously: block before touching
        # the directory (metadata) or returning (interpreter shutdown races).
        ckptr.wait_until_finished()
        if metadata is not None:
            with open(os.path.join(path, "metadata.json"), "w") as f:
                json.dump(metadata, f)
    sync_global_devices(f"save_checkpoint:{name}")
    return path


def _leaf_sharding(x) -> jax.sharding.Sharding:
    """Target sharding for a restored leaf: the template's own placement
    when it is a placed jax.Array, else single-device on this process.

    Checkpoints must be topology-independent (the reference's torch
    checkpoints are): a run trained on an 8-device mesh must restore for
    single-chip generation and vice versa, so restore NEVER relies on the
    sharding metadata orbax recorded at save time."""
    s = getattr(x, "sharding", None)
    if isinstance(s, jax.sharding.Sharding):
        return s
    return jax.sharding.SingleDeviceSharding(jax.devices()[0])


def load_checkpoint(path: str, template: Any | None = None) -> dict:
    path = os.path.abspath(path)
    if template is None:
        # Build the abstract tree from the checkpoint's own array
        # metadata (shapes/dtypes only — the saved device mesh is
        # deliberately ignored, see _leaf_sharding).
        meta = _ckptr().metadata(path).item_metadata
        sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                           sharding=sh), meta.tree)
        return _ckptr().restore(path, abstract)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                       sharding=_leaf_sharding(x)),
        template)
    return _ckptr().restore(path, abstract)


def load_metadata(path: str) -> dict:
    meta_path = os.path.join(os.path.abspath(path), "metadata.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def checkpoint_exists(work_dir: str, name: str) -> bool:
    return os.path.isdir(os.path.join(work_dir, name))


def load_generator_params(path: str, template_params: Any) -> Any:
    """Warm start: restore only the generator (XL) parameter subtree from a
    full checkpoint, keeping everything else fresh (reference
    TRAIN.load_from_previous semantics, train.py:591-609)."""
    full = load_checkpoint(path)
    gen = full["params"] if "params" in full else full
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
        template_params)
    flat_new, treedef = jax.tree_util.tree_flatten_with_path(abstract)
    flat_loaded = dict(jax.tree_util.tree_flatten_with_path(gen)[0])
    out = []
    for key, leaf in flat_new:
        if key in flat_loaded and tuple(np.shape(flat_loaded[key])) == tuple(
                leaf.shape):
            out.append(np.asarray(flat_loaded[key]).astype(leaf.dtype))
        else:  # non-strict: keep the fresh init for missing/mismatched keys
            out.append(None)
    restored = jax.tree_util.tree_unflatten(treedef, out)
    return jax.tree.map(
        lambda new, old: old if new is None else new,
        restored, template_params,
        is_leaf=lambda x: x is None)
