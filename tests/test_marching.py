"""Marching-tetrahedra mesh extraction tests.

Case-table derivation (tet corners a,b,c,d; bit i set = corner inside):
1 inside -> one triangle on the 3 edges from that corner; 3 inside -> one
triangle on the 3 edges from the single outside corner; 2 inside -> the
cut is a quad over the 4 inside-outside edges, split into 2 triangles in
cyclic order. Verified geometrically here: closed analytic surfaces must
produce a watertight-ish soup whose vertices all lie near the true
iso-surface, with consistent total area.
"""

import numpy as np

import jax
import jax.numpy as jnp

from monoport_tpu.recon import dense_eval, grid_points
from monoport_tpu.recon.marching import extract_mesh, marching_tets


def sphere_query(points):
    d = jnp.linalg.norm(points, axis=-1)
    return jax.nn.sigmoid((0.6 - d) * 20.0)[..., None]


def _sphere_vol(r=33):
    return dense_eval(sphere_query, r, chunk=8192)


def test_marching_tets_vertices_on_isosurface():
    vol = _sphere_vol(33)
    tris, valid = marching_tets(vol, 0.5, max_cells=8192)
    tris = np.asarray(tris)[np.asarray(valid)]
    assert len(tris) > 500
    # every emitted vertex lies near |p| = 0.6
    radii = np.linalg.norm(tris.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(radii, 0.6, atol=0.05)


def test_marching_tets_area_matches_sphere():
    vol = _sphere_vol(49)
    tris, valid = marching_tets(vol, 0.5, max_cells=32768)
    tris = np.asarray(tris)[np.asarray(valid)]
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    want = 4 * np.pi * 0.6 ** 2
    assert abs(area - want) / want < 0.05, (area, want)


def test_extract_mesh_welds_and_is_closed():
    vol = _sphere_vol(33)
    verts, faces = extract_mesh(vol, 0.5, max_cells=8192)
    assert len(verts) > 200 and len(faces) > 400
    # watertight: every edge shared by exactly two triangles
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99, counts.mean()


def test_budget_overflow_degrades_gracefully():
    vol = _sphere_vol(33)
    tris, valid = marching_tets(vol, 0.5, max_cells=128)
    assert int(np.asarray(valid).sum()) > 0  # partial surface, no crash


def test_save_colored_mesh(tmp_path):
    from monoport_tpu.utils import save_obj_mesh_with_color, \
        load_obj_mesh_with_color
    vol = _sphere_vol(17)
    verts, faces = extract_mesh(vol, 0.5, max_cells=4096)
    colors = np.clip(verts * 0.5 + 0.5, 0, 1)
    path = str(tmp_path / "mesh.obj")
    save_obj_mesh_with_color(path, verts, faces, colors)
    v, c, f = load_obj_mesh_with_color(path)
    assert len(v) == len(verts) and len(f) == len(faces)
