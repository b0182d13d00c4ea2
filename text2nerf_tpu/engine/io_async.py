"""Asynchronous artifact writing.

The expansion step writes a dozen PNG artifacts per view (DIBR tree,
text2nerf_main.py:80-87,141-178) and the reference blocks the pipeline on
every encode+disk write.  On the single-core TPU host the PNG encodes sit
on the critical path between device phases (VERDICT r2 item 5) — this
writer moves them to a background thread so the main thread can keep
dispatching device work; pending writes drain while the NeRF-fit epochs
run.

``flush(root)`` must be called before anything READS the artifacts back
or a run returns to its caller (trainer.reconstruction flushes its own
logfolder before returning).  Worker exceptions are re-raised on the
next flush — a failed artifact write must not be silent.  Errors are
attributed to the WRITE PATH: concurrently-running scenes
(parallel/scene_farm.run_farm_parallel) share the writer thread, and a
scoped ``flush(root=logfolder)`` only waits for and raises that scene's
writes, never a sibling's.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np


class AsyncArtifactWriter:
    def __init__(self):
        self._q: "queue.Queue" = queue.Queue()
        self._errors: List[Tuple[str, BaseException]] = []
        self._pending: Dict[str, int] = {}  # path -> enqueued-not-done count
        self._lock = threading.Lock()
        self._done = threading.Condition(self._lock)
        self._thread: Optional[threading.Thread] = None

    def _ensure_thread(self):
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._loop, daemon=True
                )
                self._thread.start()

    def _loop(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                path, arr = item
                try:
                    _write_image_sync(path, arr)
                except BaseException as e:  # noqa: BLE001 — raised on flush
                    with self._lock:
                        self._errors.append((path, e))
                with self._done:
                    self._pending[path] -= 1
                    if self._pending[path] <= 0:
                        del self._pending[path]
                    self._done.notify_all()
            finally:
                self._q.task_done()

    def write(self, path: str, arr):
        """Enqueue an image write; the array is copied now so callers may
        mutate their buffer afterwards."""
        self._ensure_thread()
        with self._lock:
            self._pending[path] = self._pending.get(path, 0) + 1
        self._q.put((path, np.array(arr, copy=True)))

    def flush(self, root: Optional[str] = None):
        """Block until every enqueued write under ``root`` (all writes when
        None) hit disk; drain ALL matching worker errors and re-raise the
        first (siblings' errors must stay queued for THEIR flush — farm
        scenes share this writer)."""
        rootp = None if root is None else os.path.abspath(root)

        def under(p: str) -> bool:
            if rootp is None:
                return True
            ap = os.path.abspath(p)
            # path-separator-aware: '.../exp_0.3' must not claim
            # '.../exp_0.35's writes (bare prefix matching did)
            return ap == rootp or ap.startswith(rootp + os.sep)

        with self._done:
            while any(under(p) for p in self._pending):
                self._done.wait(timeout=60.0)
            mine = [(p, e) for (p, e) in self._errors if under(p)]
            if mine:
                self._errors[:] = [
                    (p, e) for (p, e) in self._errors if not under(p)
                ]
                if len(mine) > 1:
                    import logging

                    for p, e in mine[1:]:
                        logging.getLogger(__name__).error(
                            "async write also failed: %s: %r", p, e
                        )
                raise mine[0][1]


def _write_image_sync(path: str, a: np.ndarray):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    if a.dtype in (np.float32, np.float64):
        if a.max() <= 1.5:
            a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
        else:
            a = np.clip(a, 0, 65535).astype(np.uint16)
    imageio.imwrite(path, a)


_writer = AsyncArtifactWriter()


def write_async(path: str, arr):
    """Module-level convenience over one shared writer."""
    _writer.write(path, arr)


def flush(root: Optional[str] = None):
    _writer.flush(root)
