"""Asynchronous artifact writing.

The expansion step writes a dozen PNG artifacts per view (DIBR tree,
text2nerf_main.py:80-87,141-178) and the reference blocks the pipeline on
every encode+disk write.  On the single-core TPU host the PNG encodes sit
on the critical path between device phases (VERDICT r2 item 5) — this
writer moves them to a background thread so the main thread can keep
dispatching device work; pending writes drain while the NeRF-fit epochs
run.

``flush()`` must be called before anything READS the artifacts back or a
run returns to its caller (trainer.reconstruction flushes before
returning).  Worker exceptions are re-raised on the next flush — a failed
artifact write must not be silent.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import List, Optional

import numpy as np


class AsyncArtifactWriter:
    def __init__(self):
        self._q: "queue.Queue" = queue.Queue()
        self._errors: List[BaseException] = []
        self._lock = threading.Lock()
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
                _write_image_sync(path, arr)
            except BaseException as e:  # noqa: BLE001 — re-raised on flush
                self._errors.append(e)
            finally:
                self._q.task_done()

    def write(self, path: str, arr):
        """Enqueue an image write; the array is copied now so callers may
        mutate their buffer afterwards."""
        self._ensure_thread()
        self._q.put((path, np.array(arr, copy=True)))

    def flush(self):
        """Block until every enqueued write hit disk; re-raise the first
        worker error if any occurred."""
        if self._thread is not None:
            self._q.join()
        if self._errors:
            err, self._errors = self._errors[0], []
            raise err


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


def flush():
    _writer.flush()
