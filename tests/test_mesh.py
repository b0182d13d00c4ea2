"""Isosurface extraction + PLY tests: sphere geometry, watertightness."""

import numpy as np

from text2nerf_tpu.utils import mesh


def _sphere_volume(n=24, r=0.35):
    lin = np.linspace(0, 1, n)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    d = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    return 1.0 - d / r  # >0 inside the sphere


def test_sphere_surface_radius():
    n = 24
    vol = _sphere_volume(n)
    verts, faces = mesh.marching_tetrahedra(vol, level=0.0, spacing=(1, 1, 1))
    assert len(verts) > 100 and len(faces) > 100
    center = (n - 1) / 2.0
    radii = np.linalg.norm(verts - center, axis=-1)
    expect = 0.35 * (n - 1)
    # all surface vertices within a voxel of the true radius
    assert np.abs(radii - expect).max() < 1.2, (radii.min(), radii.max())


def test_sphere_mesh_watertight():
    vol = _sphere_volume(16)
    verts, faces = mesh.marching_tetrahedra(vol, level=0.0)
    edges = {}
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).all()  # closed manifold: every edge in 2 faces


def test_empty_and_full_volumes():
    v, f = mesh.marching_tetrahedra(np.zeros((8, 8, 8)), level=0.5)
    assert len(v) == 0 and len(f) == 0
    v, f = mesh.marching_tetrahedra(np.ones((8, 8, 8)), level=0.5)
    assert len(f) == 0


def test_ply_roundtrip(tmp_path):
    vol = _sphere_volume(12)
    verts, faces = mesh.marching_tetrahedra(vol, level=0.0)
    p = str(tmp_path / "m.ply")
    mesh.write_ply(p, verts, faces)
    v2, f2 = mesh.read_ply(p)
    np.testing.assert_allclose(v2, verts.astype(np.float32), atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
