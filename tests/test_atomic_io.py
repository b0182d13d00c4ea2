"""Crash-safe archive writes (utils/atomic_io).

A kill mid-write of resumable state (scene snapshot, resume checkpoint)
must leave the previous complete file in place, never a truncated one —
the failure observed in production: ``timeout`` SIGKILLed a run during
``np.savez(scene_snapshot.npz)`` and every subsequent resume died on
``zipfile.BadZipFile``.
"""

import os
import zipfile
from unittest import mock

import numpy as np
import pytest

from text2nerf_tpu.utils.atomic_io import atomic_savez


def test_atomic_savez_roundtrip(tmp_path):
    path = str(tmp_path / "state.npz")
    atomic_savez(path, a=np.arange(5), b=np.ones((2, 3), np.float32))
    d = np.load(path)
    assert list(d["a"]) == [0, 1, 2, 3, 4]
    assert d["b"].shape == (2, 3)
    # np.savez suffix behavior preserved
    atomic_savez(str(tmp_path / "nosuffix"), x=np.zeros(1))
    assert os.path.exists(tmp_path / "nosuffix.npz")


def test_interrupted_write_preserves_previous_archive(tmp_path):
    path = str(tmp_path / "state.npz")
    atomic_savez(path, v=np.asarray([1.0]))

    # simulate a kill mid-write: savez raises after partially writing
    real_savez = np.savez

    def dying_savez(f, **arrays):
        f.write(b"PK\x03\x04truncated")
        raise KeyboardInterrupt

    with mock.patch.object(np, "savez", dying_savez):
        with pytest.raises(KeyboardInterrupt):
            atomic_savez(path, v=np.asarray([2.0]))

    # previous archive intact, no temp litter
    assert float(np.load(path)["v"][0]) == 1.0
    assert [p for p in os.listdir(tmp_path) if ".tmp." in p] == []
    np.savez  # noqa: B018 — real_savez unused guard
    assert np.savez is real_savez


def test_checkpoint_and_snapshot_writes_are_atomic(tmp_path):
    """The resume-critical call sites route through atomic_savez."""
    import inspect

    from text2nerf_tpu.data import scene_state as ss
    from text2nerf_tpu.engine import checkpoints as ckpt

    assert "atomic_savez" in inspect.getsource(ckpt.save_checkpoint)
    assert "atomic_savez" in inspect.getsource(ss.save_scene_snapshot)


def test_atomic_savez_sweeps_dead_writer_orphans(tmp_path):
    """SIGKILL mid-write skips the finally-cleanup and strands
    path.tmp.<pid>; the next write sweeps orphans whose writer pid is
    dead (review r3) while temps of LIVE writers are left alone (two
    concurrent processes must never interleave into one temp file)."""
    path = str(tmp_path / "state.npz")
    dead = path + ".tmp.999999999"  # pid far above pid_max: never alive
    with open(dead, "wb") as f:
        f.write(b"truncated garbage")
    live = path + f".tmp.{os.getpid()}x"  # non-int suffix: ignored
    with open(live, "wb") as f:
        f.write(b"not ours to judge")
    atomic_savez(path, a=np.arange(3))
    assert not os.path.exists(dead)            # dead-writer orphan swept
    assert os.path.exists(live)                # unparseable name untouched
    assert list(np.load(path)["a"]) == [0, 1, 2]
    # our own temp was cleaned by the finally
    assert not os.path.exists(path + f".tmp.{os.getpid()}")
