"""Render layer tests: rasterizer geometry/z-buffer, texture sampling,
SH shading + rotation, cameras, scene."""

import numpy as np

import jax.numpy as jnp

from monoport_tpu.render import (AlbedoRender, BaseCamera, CameraPose,
                                 NormalRender, PerspectiveCamera,
                                 evaluate_sh_basis, make_rotate, rasterize,
                                 sh_rotation_matrix)
from monoport_tpu.render.rasterizer import sample_texture
from monoport_tpu.pipeline.scene import MonoPortScene


def _tri(verts2d, z=0.0):
    t = np.zeros((1, 3, 4), np.float32)
    t[0, :, :2] = verts2d
    t[0, :, 2] = z
    t[0, :, 3] = 1.0
    return jnp.asarray(t)


def test_rasterize_coverage_and_depth():
    # full-viewport right triangle at z=0.2, small closer tri at z=-0.5
    big = _tri([[-1, -1], [3, -1], [-1, 3]], z=0.2)
    small = _tri([[-0.5, -0.5], [0.5, -0.5], [0, 0.5]], z=-0.5)
    tris = jnp.concatenate([big, small])
    attrs = jnp.asarray(
        np.stack([np.full((3, 1), 1.0), np.full((3, 1), 2.0)]))
    img, depth, mask = rasterize(tris, attrs, 64, 64)
    img = np.asarray(img)
    assert bool(np.asarray(mask).all())
    # center pixel covered by the closer small triangle
    assert img[32, 32, 0] == 2.0
    # corner covered only by the big one
    assert img[0, 0, 0] == 1.0
    d = np.asarray(depth)
    assert abs(d[32, 32] - (-0.5)) < 1e-5
    assert abs(d[0, 0] - 0.2) < 1e-5


def test_rasterize_interpolates_linearly():
    tri = _tri([[-1, -1], [1, -1], [-1, 1]])
    attrs = jnp.asarray(np.array([[[0.0], [1.0], [0.0]]], np.float32))
    img, _, mask = rasterize(tri, attrs, 33, 33)
    # attribute varies linearly in x from 0 (left) to 1 (right)
    row = np.asarray(img)[16, :, 0]
    xs = np.linspace(0, 1, 33)
    valid = np.asarray(mask)[16]
    np.testing.assert_allclose(row[valid], xs[valid], atol=0.04)


def test_sample_texture_wrap():
    tex = jnp.asarray(np.stack([np.eye(2)] * 3, -1).astype(np.float32))
    uv = jnp.asarray([[0.26, 0.26], [1.26, 0.26]])
    out = np.asarray(sample_texture(tex, uv))
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)  # REPEAT wrap


def test_albedo_render_end_to_end():
    scene = MonoPortScene(size=(64, 64))
    ext, intr = scene.update_camera()
    ext = ext.copy()  # update_camera mutates its extrinsic in place
    img = scene.render(ext, intr)
    assert img.shape == (64, 64, 3)
    assert img.max() > 0.1  # the floor is visible
    # orbit advances
    ext2, _ = scene.update_camera()
    assert not np.allclose(ext, ext2)


def test_normal_render():
    r = NormalRender(width=32, height=32)
    verts = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    r.set_attrib(0, verts)
    r.set_attrib(1, normals)
    r.draw({"ModelMat": np.eye(4), "PerspMat": np.eye(4)})
    img = r.get_color()
    # +z normal -> rgb (0.5, 0.5, 1.0)
    np.testing.assert_allclose(img[20, 16], [0.5, 0.5, 1.0], atol=1e-5)


def test_sh_rotation_exact():
    rot = make_rotate(0.3, 0.8, -0.2)
    rsh = sh_rotation_matrix(rot)
    dirs = np.random.RandomState(0).randn(50, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    want = evaluate_sh_basis(dirs @ rot.T)
    got = evaluate_sh_basis(dirs) @ rsh.T
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cameras_match_reference(ref):
    import sys
    sys.path.insert(0, "/root/reference")
    from monoport.lib.render.BaseCamera import BaseCamera as RefBase
    from monoport.lib.render.PespectiveCamera import (
        PersPectiveCamera as RefPersp)
    from monoport.lib.render.CameraPose import CameraPose as RefPose

    b = BaseCamera(); rb = RefBase()
    for cam in (b, rb):
        cam.near, cam.far = 0.0, 10.0
        cam.set_parameters(2.0, 2.0)
    np.testing.assert_allclose(b.get_projection_mat(),
                               rb.get_projection_mat())

    p = PerspectiveCamera(); rp = RefPersp()
    p.set_by_field_of_view(0.9); rp.set_by_field_of_view(0.9)
    np.testing.assert_allclose(p.get_projection_mat(),
                               rp.get_projection_mat())

    pose = CameraPose(center=(1, 2, 3), front=(0, 0.2, 1), up=(0, 1, 0))
    rpose = RefPose()
    rpose.center = np.array([1.0, 2, 3])
    rpose.front = np.array([0.0, 0.2, 1])
    rpose.up = np.array([0.0, 1, 0])
    rpose.sanity_check()
    np.testing.assert_allclose(pose.get_model_view_mat(),
                               rpose.get_model_view_mat(), atol=1e-12)


def test_prt_render_modes():
    from monoport_tpu.render import PrtRender
    r = PrtRender(width=32, height=32)
    verts = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    uvs = np.array([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]], np.float32)
    prt = np.tile(np.array([[1.0] + [0.0] * 8], np.float32), (3, 1))
    r.set_attrib(0, verts)
    r.set_attrib(1, uvs)
    r.set_attrib(2, prt)
    r.set_texture("AlbedoMap", np.ones((8, 8, 3), np.float32))
    sh = np.zeros((9, 3), np.float32)
    sh[0] = 1.0
    uniforms = {"ModelMat": np.eye(4), "PerspMat": np.eye(4),
                "SHCoeffs": sh}
    r.draw(uniforms)
    img = r.get_color()
    assert img[16, 16].max() > 0.5
    r.draw(uniforms, uv_space=True)       # texture-space unwrap mode
    img_uv = r.get_color()
    # the UV triangle interior is lit, corners outside it are empty
    assert img_uv[16, 16].max() > 0.5
    assert img_uv[0, 0].max() == 0.0


def test_committed_floor_prop():
    """The committed floor prop (monoport_tpu/data/floor, the analog of
    the reference's RTL/floor OBJ+JPG sets) loads by default and renders
    through the Albedo path with its wood texture."""
    import numpy as np
    from monoport_tpu.pipeline.scene import MonoPortScene

    scene = MonoPortScene(size=(64, 64))
    assert scene.vert_data.shape[0] >= 36   # plank grid, not the quad
    assert scene.texture_image.dtype == np.uint8  # loaded from jpg
    ext, intr = scene.update_camera()
    img = np.asarray(scene.render(ext, intr))
    floor = img.sum(-1) > 0.01
    assert floor.sum() > 500
    mean = img[floor].mean(0)
    assert mean[0] > mean[1] > mean[2]      # warm wood tones
    scene.shift_floor()
    img2 = np.asarray(scene.render(ext, intr))
    assert np.abs(img2 - img).max() > 0.01  # hotkey 'g' changes the look


def test_floor_prop_variety():
    """All five committed prop sets (scripts/make_floor_prop.py; the
    reference ships five OBJ+JPG sets, RTL/scene.py:20-43) load and render
    distinct floors, and shift_floor cycles through every one."""
    import numpy as np
    from monoport_tpu.pipeline.scene import MonoPortScene

    scene = MonoPortScene(size=(64, 64))
    assert len(scene.prop_sets) >= 5, scene.prop_sets
    ext, intr = scene.update_camera()
    looks = []
    for _ in scene.prop_sets:
        scene.shift_floor()
        img = np.asarray(scene.render(ext, intr))
        assert (img.sum(-1) > 0.01).sum() > 400   # a floor is visible
        looks.append(img)
    for i in range(len(looks)):
        for j in range(i + 1, len(looks)):
            assert np.abs(looks[i] - looks[j]).max() > 0.05, (i, j)
