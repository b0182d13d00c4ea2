"""Checkpointing: model params + config + bit-packed alpha mask + loop state.

Equivalent of TensorBase.save/load
(/root/reference/models/tensorBase.py:275-290): the checkpoint carries the
model hyper-parameters ('kwargs'), the parameter arrays, and the binary
alpha-mask volume packed with np.packbits.  Extends the reference by also
persisting the progressive-loop state (view index, optimizer step) so a
run can resume mid-scene (the reference only saves at the very end,
SURVEY §5).

Format: a single .npz (portable, no torch pickle); orbax-backed async
checkpointing is available via ``save_orbax``/``load_orbax`` for large
multi-host runs.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..models.tensorf import TensoRFConfig
from ..utils.atomic_io import atomic_savez


def _flatten(tree, prefix=""):
    """Flatten a params pytree to {path: array}. Dict keys and sequence
    indices both become '/'-separated path segments; all-digit dict keys are
    therefore reserved for sequences (never used in param trees)."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    root = {}
    for key, val in flat.items():
        node = root
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(val)
    return _lists_from_dicts(root)


def _lists_from_dicts(node):
    if isinstance(node, dict):
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return tuple(
                _lists_from_dicts(node[str(i)]) for i in range(len(keys))
            )
        return {k: _lists_from_dicts(v) for k, v in node.items()}
    return node


def save_checkpoint(
    path: str,
    cfg: TensoRFConfig,
    params,
    aabb,
    alpha_mask=None,
    loop_state: Optional[dict] = None,
):
    """Save a checkpoint.

    alpha_mask: optional {'volume': (D,H,W) float 0/1, 'aabb': (2,3)};
    stored bit-packed (tensorBase.py:278-282).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blobs = _flatten({"params": params})
    blobs["aabb"] = np.asarray(aabb)
    blobs["__kwargs__"] = np.frombuffer(
        json.dumps(cfg.to_dict()).encode(), dtype=np.uint8
    )
    if alpha_mask is not None:
        vol = np.asarray(alpha_mask["volume"]).astype(bool)
        blobs["alphaMask.shape"] = np.asarray(vol.shape)
        blobs["alphaMask.mask"] = np.packbits(vol.reshape(-1))
        blobs["alphaMask.aabb"] = np.asarray(alpha_mask["aabb"])
        blobs["alphaMask.pool"] = np.asarray(int(alpha_mask.get("pool", 3)))
    if loop_state is not None:
        blobs["__loop_state__"] = np.frombuffer(
            json.dumps(loop_state).encode(), dtype=np.uint8
        )
    atomic_savez(path, **blobs)


def load_checkpoint(path: str):
    """Load a checkpoint → (cfg, params, aabb, alpha_mask|None, loop_state|None)."""
    data = dict(np.load(path, allow_pickle=False))
    cfg = TensoRFConfig.from_dict(
        json.loads(bytes(data.pop("__kwargs__").tobytes()).decode())
    )
    aabb = jnp.asarray(data.pop("aabb"))
    alpha_mask = None
    if "alphaMask.mask" in data:
        shape = tuple(int(s) for s in data.pop("alphaMask.shape"))
        n = int(np.prod(shape))
        bits = np.unpackbits(data.pop("alphaMask.mask"))[:n].reshape(shape)
        alpha_mask = {
            "volume": jnp.asarray(bits, jnp.float32),
            "aabb": jnp.asarray(data.pop("alphaMask.aabb")),
            "pool": int(data.pop("alphaMask.pool", 3)),
        }
    loop_state = None
    if "__loop_state__" in data:
        loop_state = json.loads(bytes(data.pop("__loop_state__").tobytes()).decode())
    params_flat = {
        k[len("params/"):]: v for k, v in data.items() if k.startswith("params/")
    }
    params = _unflatten(params_flat)
    return cfg, params, aabb, alpha_mask, loop_state


# -- orbax backend (async, multi-host) ----------------------------------------


def save_orbax(
    path: str,
    cfg: TensoRFConfig,
    params,
    aabb,
    extras=None,
    loop_state: Optional[dict] = None,
):
    """Orbax (OCDBT) checkpoint for multi-host runs: every process writes
    its shards of a jax.sharding-annotated params tree; cfg + loop state go
    to JSON sidecars inside the directory."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params, "aabb": jnp.asarray(aabb)}
    if extras:
        payload["extras"] = extras
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(os.path.abspath(path), "cfg.json"), "w") as f:
        json.dump(cfg.to_dict(), f)
    if loop_state is not None:
        with open(os.path.join(os.path.abspath(path),
                               "loop_state.json"), "w") as f:
            json.dump(loop_state, f)


def load_orbax(path: str, like_params=None, like_aabb=None):
    """Restore an orbax checkpoint → (cfg, params, aabb, loop_state|None).

    ``like_params``/``like_aabb`` (abstract arrays or concrete values with
    the target shardings) direct a sharded restore; without them arrays
    come back unsharded on the default device."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    with open(os.path.join(os.path.abspath(path), "cfg.json")) as f:
        cfg = TensoRFConfig.from_dict(json.load(f))
    if like_params is not None:
        restored = ckptr.restore(
            os.path.abspath(path),
            {"params": like_params, "aabb": jnp.asarray(like_aabb)},
        )
    else:
        restored = ckptr.restore(os.path.abspath(path))
    loop_state = None
    ls_path = os.path.join(os.path.abspath(path), "loop_state.json")
    if os.path.exists(ls_path):
        with open(ls_path) as f:
            loop_state = json.load(f)
    return cfg, restored["params"], restored["aabb"], loop_state
