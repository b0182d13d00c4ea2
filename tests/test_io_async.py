"""Async artifact writer: completion on flush, dtype conversions, error
propagation (engine/io_async)."""

import os

import numpy as np
import pytest

from text2nerf_tpu.engine.io_async import AsyncArtifactWriter


def test_writes_complete_on_flush(tmp_path):
    w = AsyncArtifactWriter()
    rgb = np.random.default_rng(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    depth = np.full((16, 16), 24000.0, np.float32)
    w.write(str(tmp_path / "a" / "rgb.png"), rgb)
    w.write(str(tmp_path / "a" / "depth.png"), depth)
    w.flush()
    import imageio.v2 as imageio

    got = imageio.imread(str(tmp_path / "a" / "rgb.png"))
    assert got.dtype == np.uint8 and got.shape == (16, 16, 3)
    np.testing.assert_array_equal(
        got, (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    )
    d = imageio.imread(str(tmp_path / "a" / "depth.png"))
    assert d.dtype == np.uint16 and int(d[0, 0]) == 24000


def test_buffer_copied_at_enqueue(tmp_path):
    w = AsyncArtifactWriter()
    arr = np.zeros((8, 8, 3), np.float32)
    w.write(str(tmp_path / "x.png"), arr)
    arr[:] = 1.0  # caller mutates after enqueue — must not affect output
    w.flush()
    import imageio.v2 as imageio

    assert imageio.imread(str(tmp_path / "x.png")).max() == 0


def test_errors_surface_on_flush(tmp_path):
    w = AsyncArtifactWriter()
    # unwritable target: path is under an existing FILE
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    w.write(str(blocker / "sub" / "y.png"), np.zeros((4, 4, 3), np.float32))
    with pytest.raises(Exception):
        w.flush()
    # writer recovers after the error
    w.write(str(tmp_path / "ok.png"), np.zeros((4, 4, 3), np.float32))
    w.flush()
    assert os.path.isfile(tmp_path / "ok.png")


def test_scoped_flush_isolates_scenes(tmp_path):
    """flush(root) attributes errors to the failing scene only: a shared
    writer serving concurrent farm scenes (run_farm_parallel) must not
    abort scene B's flush with scene A's failed write."""
    w = AsyncArtifactWriter()
    img = np.zeros((4, 4, 3), np.float32)
    scene_a = tmp_path / "scene_a"
    scene_b = tmp_path / "scene_b"
    blocker = scene_a / "blocker"
    os.makedirs(scene_a, exist_ok=True)
    blocker.write_text("x")  # makes the nested write fail
    w.write(str(blocker / "sub" / "bad.png"), img)
    w.write(str(scene_b / "good.png"), img)
    # scene B's scoped flush succeeds and its artifact is on disk
    w.flush(str(scene_b))
    assert os.path.isfile(scene_b / "good.png")
    # scene A's scoped flush raises ITS error
    with pytest.raises(Exception):
        w.flush(str(scene_a))
    # and a global flush afterwards is clean (error already consumed)
    w.flush()


def test_scoped_flush_is_separator_aware(tmp_path):
    """'.../exp_0.3' must not claim '.../exp_0.35's writes (review r3:
    bare prefix matching stole sibling scenes' pending writes + errors)."""
    w = AsyncArtifactWriter()
    img = np.zeros((4, 4, 3), np.float32)
    a = tmp_path / "exp_0.3"
    b = tmp_path / "exp_0.35"
    blocker = b / "blocker"
    os.makedirs(b, exist_ok=True)
    blocker.write_text("x")
    w.write(str(blocker / "sub" / "bad.png"), img)  # B's write fails
    w.write(str(a / "good.png"), img)
    # A's flush must NOT raise B's error (prefix 'exp_0.3' matches both)
    w.flush(str(a))
    assert os.path.isfile(a / "good.png")
    with pytest.raises(Exception):
        w.flush(str(b))


def test_flush_drains_all_errors_under_root(tmp_path):
    """A scene with several failed writes raises once and leaves NOTHING
    queued for unrelated later flushes (review r3)."""
    w = AsyncArtifactWriter()
    img = np.zeros((4, 4, 3), np.float32)
    scene = tmp_path / "scene"
    os.makedirs(scene, exist_ok=True)
    blocker = scene / "blocker"
    blocker.write_text("x")
    w.write(str(blocker / "s1" / "bad1.png"), img)
    w.write(str(blocker / "s2" / "bad2.png"), img)
    with pytest.raises(Exception):
        w.flush(str(scene))
    # all of the scene's errors were drained by its own flush
    w.flush()
