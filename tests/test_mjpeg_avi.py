"""Pure-Python MJPEG-AVI writer: structural validity + frame round-trip."""

import struct

import numpy as np

from text2nerf_tpu.utils.mjpeg_avi import read_mjpeg_avi, write_mjpeg_avi


def _frames(n=5, h=32, w=48):
    # smooth gradient + per-frame stripe: JPEG-friendly content (random
    # noise is JPEG's worst case and would need a useless tolerance)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [255 * yy / h, 255 * xx / w, 64 + 0 * xx], -1
    ).astype(np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[:, : (i + 1) * 8] = (20 * i, 128, 255 - 30 * i)
        out.append(f)
    return out


def test_avi_roundtrip(tmp_path):
    frames = _frames()
    path = str(tmp_path / "v.avi")
    assert write_mjpeg_avi(path, frames, fps=30, quality=9) == path
    got = read_mjpeg_avi(path)
    assert len(got) == len(frames)
    for g, f in zip(got, frames):
        assert g.shape == f.shape
        # JPEG at quality 90 on flat-color regions: tight-ish tolerance
        assert np.abs(g.astype(np.int16) - f.astype(np.int16)).mean() < 12


def test_avi_header_fields(tmp_path):
    frames = _frames(n=3, h=16, w=24)
    path = str(tmp_path / "v.avi")
    write_mjpeg_avi(path, frames, fps=12)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    # RIFF size covers the whole file
    assert struct.unpack("<I", data[4:8])[0] + 8 == len(data)
    a = data.find(b"avih") + 8
    (usec, _, _, flags, total, _, streams, _, w, h) = struct.unpack(
        "<10I", data[a : a + 40]
    )
    assert usec == int(1e6 / 12) and total == 3 and streams == 1
    assert (w, h) == (24, 16) and flags & 0x10  # AVIF_HASINDEX
    assert b"MJPG" in data and b"idx1" in data
    # index has one entry per frame
    i = data.find(b"idx1")
    isize = struct.unpack("<I", data[i + 4 : i + 8])[0]
    assert isize == 3 * 16


def test_write_video_falls_back_to_avi(tmp_path, monkeypatch):
    """With no ffmpeg plugin, write_video lands on the AVI (not the GIF)."""
    import imageio.v2 as imageio

    from text2nerf_tpu.engine import renderer as R

    def no_mp4(path, *a, **kw):
        raise RuntimeError("no ffmpeg")

    monkeypatch.setattr(imageio, "mimwrite", no_mp4)
    out = R.write_video(str(tmp_path / "video.mp4"), _frames(3))
    assert out.endswith(".avi")
    assert len(read_mjpeg_avi(out)) == 3
