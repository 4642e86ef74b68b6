"""Background scene: textured floor + auto-orbiting virtual camera.

Reference contract: RTL/scene.py — MonoPortScene loads a textured floor
prop, orbits the virtual camera (yaw 20deg, pitch += 3deg/frame), or loads
a WebXR-driven extrinsic from webxr/modelview.json; render() draws the
floor background.

Assets are generated procedurally (a checkerboard floor quad) instead of
shipping binary props; any OBJ+texture can be supplied via ``load_floor``.
"""

from __future__ import annotations

import json
import math

import numpy as np

from ..render.camera import BaseCamera, make_rotate
from ..render.rasterizer import AlbedoRender
from ..utils.mesh import load_obj_mesh


def checkerboard_texture(size: int = 256, tiles: int = 8,
                         c0=(0.35, 0.4, 0.45), c1=(0.65, 0.7, 0.72)):
    ij = np.arange(size) // (size // tiles)
    board = (ij[:, None] + ij[None, :]) % 2
    tex = np.where(board[..., None] == 0, np.asarray(c0), np.asarray(c1))
    return tex.astype(np.float32)


def floor_quad(floor_size: float = 3.0, center=(0.0, -0.9, 0.0)):
    """Two-triangle floor in the xz-plane -> (vert_data [6,3], uv_data [6,2])."""
    s = floor_size / 2
    cx, cy, cz = center
    corners = np.array([
        [cx - s, cy, cz - s], [cx + s, cy, cz - s],
        [cx + s, cy, cz + s], [cx - s, cy, cz + s]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = [0, 1, 2, 0, 2, 3]
    return corners[idx], uv[idx]


def load_floor(mesh_path: str, texture_path: str, floor_size: float = 3.0,
               floor_center=(0.0, -0.9, 0.0)):
    """Load a floor prop OBJ + texture (RTL/scene.py:20-43 semantics:
    axes swapped y<->z, cm -> scene units, recentered)."""
    verts, faces, _, _, textures, face_textures = load_obj_mesh(
        mesh_path, with_normal=True, with_texture=True)
    verts = verts[:, [0, 2, 1]]
    verts = verts / 150.0 * floor_size
    verts = verts - verts.mean(axis=0) + np.asarray(floor_center, np.float32)
    vert_data = verts[faces.reshape(-1)]
    uv_data = textures[face_textures.reshape(-1)]
    try:
        import cv2
        tex = cv2.imread(texture_path)[..., ::-1]
    except Exception:  # pragma: no cover
        from PIL import Image
        tex = np.asarray(Image.open(texture_path).convert("RGB"))
    return vert_data, uv_data, tex


def load_intrinsic(near: float = 0.0, far: float = 10.0,
                   scale: float = 2.0) -> np.ndarray:
    """Orthographic scene intrinsic (RTL/scene.py:45-50)."""
    cam = BaseCamera()
    cam.near = near
    cam.far = far
    cam.set_parameters(scale, scale)
    return cam.get_projection_mat()


class MonoPortScene:
    """RTL/scene.py:96-159 equivalent on the JAX rasterizer."""

    def __init__(self, size=(256, 256), floor_assets: tuple | None = None,
                 webxr_path: str | None = None):
        self.size = size
        if floor_assets is not None:
            self.vert_data, self.uv_data, self.texture_image = load_floor(
                *floor_assets)
        else:
            self.vert_data, self.uv_data = floor_quad()
            self.texture_image = checkerboard_texture()
        self.intrinsic = load_intrinsic()
        self.webxr_path = webxr_path

        self.renderer = AlbedoRender(width=size[0], height=size[1],
                                     multi_sample_rate=1)
        self.renderer.set_attrib(0, self.vert_data)
        self.renderer.set_attrib(1, self.uv_data)
        self.renderer.set_texture("TargetTexture", self.texture_image)

        self.extrinsic = np.array([
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, -2.0],
            [0.0, 0.0, 0.0, 1.0]], np.float32)
        self.step = 0

    def shift_floor(self):
        """Cycle the floor look (hotkey 'g'; RTL/scene.py:117-121 —
        the reference reloads a random prop, here the procedural texture
        is re-colored)."""
        import numpy as _np
        rng = _np.random.RandomState(self.step)
        c0 = rng.uniform(0.2, 0.6, 3)
        c1 = rng.uniform(0.5, 0.9, 3)
        self.texture_image = checkerboard_texture(c0=tuple(c0), c1=tuple(c1))
        self.renderer.set_texture("TargetTexture", self.texture_image)

    def update_camera(self, load: bool = False):
        """Auto-orbit (yaw 20, pitch += 3/frame) or WebXR extrinsic
        (RTL/scene.py:122-145)."""
        if not load:
            yaw, pitch = 20, self.step
            self.extrinsic[:3, :3] = (
                make_rotate(math.radians(yaw), 0, 0)
                @ make_rotate(0, math.radians(pitch), 0))
            self.step += 3
            return self.extrinsic, self.intrinsic
        with open(self.webxr_path) as f:
            ext = np.array(json.load(f)["data"]).reshape(4, 4).T
        return ext, self.intrinsic

    def render(self, extrinsic, intrinsic) -> np.ndarray:
        self.renderer.draw({"ModelMat": extrinsic, "PerspMat": intrinsic})
        return self.renderer.get_color()
