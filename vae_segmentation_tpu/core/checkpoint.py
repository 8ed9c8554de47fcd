"""Checkpointing with the reference's on-disk layout and selective-component
load semantics — plus REAL resume (the reference parses --resume but never
implements it, main_source.py:51 / SURVEY.md section 5.3).

Layout (mirrors main_source.py:826-843):
    3dmodel/<prefix>/model_epoch<N>.ckpt   every save_epoch
    3dmodel/<prefix>/best_model.ckpt       on val improvement

A checkpoint is a single msgpack file of
    {'epoch', 'model_state_dict', 'optimizer_state_dict'}
via flax.serialization — the functional analog of torch.save's dict contract,
single-file and host-independent. Selective loads (main_target.py:355-394):
    --load_prefix        -> Seg subtree only
    --load_prefix_vae    -> Vae subtree only
    --load_prefix_encoder-> Dis subtree only
    --load_prefix_joint  -> whole tree
are plain subtree assignments because composite params are keyed
{'Seg': ..., 'Vae': ...} (models/joint.py).

Torch checkpoints from the reference are loadable through
models/torch_compat.py conversion.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

CKPT_VERSION = 1


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, epoch: int, params: Any,
                    opt_state: Any = None, extra: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "version": CKPT_VERSION,
        "epoch": epoch,
        "model_state_dict": serialization.to_state_dict(_to_host(params)),
        "optimizer_state_dict": (
            serialization.to_state_dict(_to_host(opt_state))
            if opt_state is not None else {}),
        "extra": extra or {},
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic publish


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_params(template: Any, ckpt: Dict) -> Any:
    """state_dict -> pytree with the template's structure."""
    return serialization.from_state_dict(template, ckpt["model_state_dict"])


def restore_opt_state(template: Any, ckpt: Dict) -> Any:
    return serialization.from_state_dict(template, ckpt["optimizer_state_dict"])


def load_component(params: Any, ckpt: Dict, component: Optional[str]) -> Any:
    """Selective component load. component=None loads the whole tree
    (--load_prefix_joint); otherwise the checkpoint holds a bare submodel
    (e.g. a Seg-only or VAE-only training run) assigned into params[component].
    """
    if component is None:
        return restore_params(params, ckpt)
    sub = serialization.from_state_dict(params[component],
                                        ckpt["model_state_dict"])
    out = dict(params)
    out[component] = sub
    return out


def checkpoint_path(save_root: str, prefix: str,
                    name: str = "best_model.ckpt") -> str:
    """os.path.join('3dmodel', prefix, name) (main_source.py:301)."""
    return os.path.join(save_root, prefix, name)


def latest_checkpoint(save_root: str, prefix: str) -> Optional[str]:
    """Newest model_epoch<N>.ckpt for --resume auto-restore."""
    pattern = os.path.join(save_root, prefix, "model_epoch*.ckpt")
    candidates = []
    for p in glob.glob(pattern):
        m = re.search(r"model_epoch(\d+)\.ckpt$", p)
        if m:
            candidates.append((int(m.group(1)), p))
    if not candidates:
        return None
    return max(candidates)[1]
