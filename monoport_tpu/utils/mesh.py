"""Mesh I/O and geometry utilities (L0).

Reference contract: monoport/lib/mesh_util.py — OBJ load/save including
per-vertex color, quad triangulation, per-vertex normal accumulation.
A C++ fast path for large OBJ parsing lives in csrc/objloader.cpp
(tinyobjloader equivalent, SURVEY §2.3) and is used when built; this
module is the always-available numpy implementation with identical
semantics.
"""

from __future__ import annotations

import numpy as np


def _triangulate(idx: list[int]) -> list[tuple[int, int, int]]:
    """Fan-triangulate a polygon index list (quads per mesh_util.py:120)."""
    out = [(idx[0], idx[1], idx[2])]
    if len(idx) == 4:
        out.append((idx[0], idx[2], idx[3]))
    return out


def load_obj_mesh(path: str, with_normal: bool = False,
                  with_texture: bool = False):
    """Parse an OBJ file -> (verts [V,3], faces [F,3], ...extras).

    Mirrors monoport/lib/mesh_util.py:89-198 (v/vn/vt/f incl. quads,
    1-based and negative indices).
    """
    verts, norms, uvs = [], [], []
    faces, face_norms, face_uvs = [], [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif tag == "vn":
                norms.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif tag == "f":
                comps = [p.split("/") for p in parts[1:]]
                vi = [int(c[0]) for c in comps]
                faces.extend(_triangulate(vi))
                if with_texture and all(len(c) > 1 and c[1] for c in comps):
                    face_uvs.extend(_triangulate([int(c[1]) for c in comps]))
                if with_normal and all(len(c) > 2 and c[2] for c in comps):
                    face_norms.extend(
                        _triangulate([int(c[2]) for c in comps]))

    def _fix(idx_arr: np.ndarray, count: int) -> np.ndarray:
        return np.where(idx_arr > 0, idx_arr - 1, idx_arr + count)

    v = np.asarray(verts, np.float32)
    f_arr = _fix(np.asarray(faces, np.int64), len(verts))
    out = [v, f_arr]
    if with_texture:
        out += [np.asarray(uvs, np.float32),
                _fix(np.asarray(face_uvs, np.int64), len(uvs))]
    if with_normal:
        if norms:
            out += [np.asarray(norms, np.float32),
                    _fix(np.asarray(face_norms, np.int64), len(norms))]
        else:
            n = compute_normal(v, f_arr)
            out += [n, f_arr]
    return tuple(out)


def load_obj_mesh_with_color(path: str):
    """OBJ with per-vertex color: 'v x y z r g b' (mesh_util.py:46-86)."""
    verts, colors, faces = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
                colors.append([float(x) for x in parts[4:7]]
                              if len(parts) >= 7 else [1.0, 1.0, 1.0])
            elif parts[0] == "f":
                vi = [int(p.split("/")[0]) for p in parts[1:]]
                faces.extend(_triangulate(vi))
    v = np.asarray(verts, np.float32)
    f_arr = np.asarray(faces, np.int64)
    f_arr = np.where(f_arr > 0, f_arr - 1, f_arr + len(verts))
    return v, np.asarray(colors, np.float32), f_arr


def compute_normal(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals (mesh_util.py:201-220)."""
    norm = np.zeros_like(vertices)
    tris = vertices[faces]
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    for i in range(3):
        np.add.at(norm, faces[:, i], n)
    length = np.linalg.norm(norm, axis=1, keepdims=True)
    return norm / np.maximum(length, 1e-12)


def save_obj_mesh(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in np.asarray(faces) + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


def save_obj_mesh_with_color(path: str, verts: np.ndarray,
                             faces: np.ndarray, colors: np.ndarray) -> None:
    """Per-vertex colored OBJ (mesh_util.py:233-241)."""
    with open(path, "w") as f:
        for v, c in zip(verts, colors):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f} "
                    f"{c[0]:.6f} {c[1]:.6f} {c[2]:.6f}\n")
        for face in np.asarray(faces) + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")
