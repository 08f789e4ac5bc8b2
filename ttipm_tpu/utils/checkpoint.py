"""Checkpoint/resume for TT-IPM runs.

The reference keeps only in-memory warm starts (``mals_delta0``, eigvector
seeds; src/tt_ipm.py:590,667) and has no on-disk recovery — SURVEY.md §5
flags real checkpointing as a gap for the TPU rebuild.  TT iterates are
plain lists of arrays, so a checkpoint is one ``.npz`` with the cores of
X/Y/Z/T plus a JSON blob of the scalar solver state.

Usage:
    save_ipm_checkpoint(path, X, Y, Z, T, iteration=k, status=status)
    state = load_ipm_checkpoint(path)   # dict with trains + scalars

``tt_ipm(..., checkpoint_path=..., checkpoint_every=N)`` writes one every
N iterations; ``resume_from=path`` restarts from the stored iterates.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ttipm_tpu import config

__all__ = ["save_ipm_checkpoint", "load_ipm_checkpoint"]

_TRAIN_KEYS = ("X", "Y", "Z", "T")


def _pack_train(arrays: Dict[str, np.ndarray], name: str, train) -> None:
    if train is None:
        return
    for i, core in enumerate(train):
        arrays[f"{name}_{i}"] = np.asarray(core)


def _unpack_train(data, name: str) -> Optional[List[jnp.ndarray]]:
    cores = []
    i = 0
    while f"{name}_{i}" in data:
        cores.append(jnp.asarray(data[f"{name}_{i}"], dtype=config.dtype()))
        i += 1
    return cores or None


def save_ipm_checkpoint(path: str, X, Y, Z, T=None, iteration: int = 0,
                        scalars: Optional[dict] = None) -> None:
    """Atomically write the iterates + scalar state to ``path`` (.npz)."""
    arrays: Dict[str, np.ndarray] = {}
    for name, train in zip(_TRAIN_KEYS, (X, Y, Z, T)):
        _pack_train(arrays, name, train)
    meta = {"iteration": int(iteration), "scalars": scalars or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_ipm_checkpoint(path: str) -> dict:
    """Load a checkpoint: {'X','Y','Z','T','iteration','scalars'}."""
    with np.load(path) as data:
        out = {name: _unpack_train(data, name) for name in _TRAIN_KEYS}
        meta = json.loads(bytes(data["__meta__"]).decode())
    out["iteration"] = meta["iteration"]
    out["scalars"] = meta["scalars"]
    return out
