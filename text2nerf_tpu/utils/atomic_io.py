"""Crash-safe archive writes.

Resumable state (scene snapshots, mid-run checkpoints) is rewritten in
place every few epochs; a kill mid-write (SIGKILL from ``timeout``, a
tunnel flap, preemption) must never leave a truncated file behind or the
resume path dies permanently on ``BadZipFile``.  The reference has no
resume at all (SURVEY §5: checkpoint only at the very end,
text2nerf_main.py:627); this module backs the rebuild's stronger
contract: the file at ``path`` is always either the previous complete
archive or the new complete archive.
"""

from __future__ import annotations

import os

import numpy as np


def atomic_savez(path: str, **arrays) -> None:
    """``np.savez`` with write-to-temp + ``os.replace`` atomicity.

    Matches np.savez's name behavior (appends ``.npz`` when missing) so it
    is a drop-in replacement at existing call sites.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # FIXED temp name (writers to one path are serialized in this design):
    # a SIGKILL mid-write skips the finally-cleanup, and a pid-suffixed
    # name would leave one checkpoint-sized orphan per killed attempt —
    # with a fixed name the next write replaces it, bounding waste to one
    tmp = path + ".tmp"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
