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
    # pid-suffixed temp: concurrent writers (a killed attempt overlapping
    # a restarted one) never interleave into one file, so the final
    # os.replace always installs an internally-consistent archive.
    # SIGKILL mid-write skips the finally-cleanup and strands the temp —
    # sweep siblings whose writer pid is gone so orphans never accumulate
    tmp = f"{path}.tmp.{os.getpid()}"
    _sweep_dead_tmp(path)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _sweep_dead_tmp(path: str) -> None:
    """Remove ``path.tmp.<pid>`` leftovers whose writer process is dead."""
    import glob

    for stale in glob.glob(path + ".tmp.*"):
        try:
            pid = int(stale.rsplit(".", 1)[-1])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # raises if no such process
        except ProcessLookupError:
            try:
                os.remove(stale)
            except OSError:
                pass
        except PermissionError:
            pass  # alive under another uid — leave it
