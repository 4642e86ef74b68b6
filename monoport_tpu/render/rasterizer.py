"""JAX triangle rasterizer + render-pass variants.

TPU-native replacement for the reference's OpenGL layer
(monoport/lib/render/gl/: Render.py offscreen FBO pipeline, AlbedoRender,
NormalRender, ShRender, PrtRender and the GLSL in gl/shaders/). Instead of
a GL context + shaders, rasterization is a jitted XLA program: triangles
are processed in fixed-size chunks with a running z-buffer (lax.fori over
a [chunks, C, H, W] barycentric evaluation), attributes are interpolated
with perspective correction, and the "fragment shaders" are jnp functions
(texture lookup = bilinear grid sample; SH shading in render/sh.py).

API shape mirrors the reference renderers (set_attrib / set_texture /
draw(uniforms) / get_color, Render.py:77-157) so the scene code ports
one-to-one.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def _viewport(ndc_xy: jax.Array, width: int, height: int) -> jax.Array:
    """NDC [-1,1] -> pixel coords; y flipped (image row 0 = top)."""
    x = (ndc_xy[..., 0] + 1.0) * 0.5 * (width - 1)
    y = (1.0 - ndc_xy[..., 1]) * 0.5 * (height - 1)
    return jnp.stack([x, y], axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk"))
def rasterize(tris_clip: jax.Array, attrs: jax.Array, height: int,
              width: int, chunk: int = 64):
    """Rasterize clip-space triangles with attribute interpolation.

    Args:
      tris_clip: [F, 3, 4] clip-space positions (after MVP).
      attrs:     [F, 3, A] per-corner attributes.
      height/width: output size.
      chunk: triangles per z-buffer merge step.

    Returns:
      (attr_img [H, W, A], depth [H, W] (inf = empty), mask [H, W] bool)
    """
    f = tris_clip.shape[0]
    a_dim = attrs.shape[-1]
    pad = (-f) % chunk
    big = jnp.inf
    tris_clip = jnp.pad(tris_clip, ((0, pad), (0, 0), (0, 0)),
                        constant_values=0)
    # degenerate padding tris: w=0 guarded below via area/valid masks
    attrs = jnp.pad(attrs, ((0, pad), (0, 0), (0, 0)))
    n_chunks = tris_clip.shape[0] // chunk

    w = tris_clip[..., 3:4]
    valid_tri = (jnp.abs(w[..., 0]) > 1e-8).all(axis=-1)       # [F]
    safe_w = jnp.where(jnp.abs(w) > 1e-8, w, 1.0)
    ndc = tris_clip[..., :3] / safe_w
    pix = _viewport(ndc, width, height)                        # [F, 3, 2]
    inv_w = 1.0 / safe_w[..., 0]                               # [F, 3]

    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]

    tris_c = pix.reshape(n_chunks, chunk, 3, 2)
    z_c = ndc[..., 2].reshape(n_chunks, chunk, 3)
    invw_c = inv_w.reshape(n_chunks, chunk, 3)
    attr_c = attrs.reshape(n_chunks, chunk, 3, a_dim)
    valid_c = valid_tri.reshape(n_chunks, chunk)

    def edge(ax, ay, bx, by, px, py):
        return (px - ax) * (by - ay) - (py - ay) * (bx - ax)

    def body(i, state):
        depth, attr_img = state
        t = tris_c[i]                    # [C, 3, 2]
        tz = z_c[i]                      # [C, 3]
        tw = invw_c[i]                   # [C, 3]
        ta = attr_c[i]                   # [C, 3, A]
        tv = valid_c[i]                  # [C]

        ax, ay = t[:, 0, 0, None, None], t[:, 0, 1, None, None]
        bx, by = t[:, 1, 0, None, None], t[:, 1, 1, None, None]
        cx, cy = t[:, 2, 0, None, None], t[:, 2, 1, None, None]
        # signed areas -> barycentrics (no backface culling, like the
        # reference which never enables GL_CULL_FACE)
        area = edge(ax, ay, bx, by, cx, cy)                    # [C, 1, 1]
        w0 = edge(bx, by, cx, cy, xs, ys)
        w1 = edge(cx, cy, ax, ay, xs, ys)
        w2 = edge(ax, ay, bx, by, xs, ys)
        denom = jnp.where(jnp.abs(area) > 1e-10, area, 1.0)
        b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
        inside = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0)
                  & (jnp.abs(area) > 1e-10)
                  & tv[:, None, None])                          # [C, H, W]

        zpix = (b0 * tz[:, 0, None, None] + b1 * tz[:, 1, None, None]
                + b2 * tz[:, 2, None, None])
        zpix = jnp.where(inside, zpix, big)

        # nearest triangle within the chunk per pixel
        best = jnp.argmin(zpix, axis=0)                         # [H, W]
        bz = jnp.take_along_axis(zpix, best[None], axis=0)[0]   # [H, W]

        take = lambda arr: jnp.take_along_axis(
            arr, best[None], axis=0)[0]
        bb0, bb1, bb2 = take(b0), take(b1), take(b2)
        tw_best = tw[best]                                      # [H, W, 3]
        ta_best = ta[best]                                      # [H, W, 3, A]
        # perspective-correct interpolation
        pw = (bb0 * tw_best[..., 0] + bb1 * tw_best[..., 1]
              + bb2 * tw_best[..., 2])
        num = (bb0[..., None] * ta_best[..., 0, :] * tw_best[..., 0:1]
               + bb1[..., None] * ta_best[..., 1, :] * tw_best[..., 1:2]
               + bb2[..., None] * ta_best[..., 2, :] * tw_best[..., 2:3])
        battr = num / jnp.where(jnp.abs(pw) > 1e-12, pw, 1.0)[..., None]

        closer = bz < depth
        depth = jnp.where(closer, bz, depth)
        attr_img = jnp.where(closer[..., None], battr, attr_img)
        return depth, attr_img

    depth0 = jnp.full((height, width), big, jnp.float32)
    attr0 = jnp.zeros((height, width, a_dim), jnp.float32)
    depth, attr_img = jax.lax.fori_loop(0, n_chunks, body, (depth0, attr0))
    return attr_img, depth, jnp.isfinite(depth)


def sample_texture(texture: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear texture lookup with REPEAT wrap: [th, tw, 3], [..., 2]."""
    th, tw, _ = texture.shape
    u = jnp.mod(uv[..., 0], 1.0) * (tw - 1)
    v = (1.0 - jnp.mod(uv[..., 1], 1.0)) * (th - 1)  # GL uv origin: bottom
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx, fy = u - x0, v - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, tw - 1)
    y1 = jnp.clip(y0 + 1, 0, th - 1)
    t00 = texture[y0, x0]
    t01 = texture[y0, x1]
    t10 = texture[y1, x0]
    t11 = texture[y1, x1]
    top = t00 * (1 - fx[..., None]) + t01 * fx[..., None]
    bot = t10 * (1 - fx[..., None]) + t11 * fx[..., None]
    return top * (1 - fy[..., None]) + bot * fy[..., None]


class _BaseRender:
    """Common draw plumbing (Render.py:77-157 API shape)."""

    def __init__(self, width: int = 256, height: int = 256,
                 multi_sample_rate: int = 1):
        self.width = width
        self.height = height
        self.ss = max(1, int(multi_sample_rate))  # supersampling factor
        self.attribs: dict[int, np.ndarray] = {}
        self.textures: dict[str, jax.Array] = {}
        self._color: Optional[np.ndarray] = None

    def set_attrib(self, idx: int, data: np.ndarray) -> None:
        self.attribs[idx] = np.asarray(data, np.float32)

    def set_texture(self, name: str, image: np.ndarray) -> None:
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        self.textures[name] = jnp.asarray(img)

    def _mvp(self, uniforms: dict) -> np.ndarray:
        model = np.asarray(uniforms["ModelMat"], np.float32)
        persp = np.asarray(uniforms["PerspMat"], np.float32)
        return persp @ model

    def _transform(self, verts_flat: np.ndarray, mvp) -> jax.Array:
        v = jnp.asarray(verts_flat.reshape(-1, 3, 3))
        ones = jnp.ones((*v.shape[:2], 1), v.dtype)
        hom = jnp.concatenate([v, ones], axis=-1)
        return jnp.einsum("ij,fvj->fvi", jnp.asarray(mvp), hom)

    def get_color(self) -> np.ndarray:
        assert self._color is not None, "call draw() first"
        return self._color


class AlbedoRender(_BaseRender):
    """Textured render (gl/AlbedoRender.py + albedo shaders): attrib 0 =
    flattened tri vertices [F*3, 3], attrib 1 = uvs [F*3, 2], texture
    'TargetTexture'."""

    def draw(self, uniforms: dict) -> None:
        tris = self._transform(self.attribs[0], self._mvp(uniforms))
        uvs = jnp.asarray(self.attribs[1].reshape(-1, 3, 2))
        h, w = self.height * self.ss, self.width * self.ss
        attr_img, _, mask = rasterize(tris, uvs, h, w)
        color = sample_texture(self.textures["TargetTexture"], attr_img)
        color = jnp.where(mask[..., None], color, 0.0)
        if self.ss > 1:
            color = color.reshape(self.height, self.ss, self.width,
                                  self.ss, 3).mean(axis=(1, 3))
        self._color = np.asarray(color)


class NormalRender(_BaseRender):
    """Camera-space normal render (gl/NormalRender.py): attrib 1 = normals."""

    def draw(self, uniforms: dict) -> None:
        model = np.asarray(uniforms["ModelMat"], np.float32)
        tris = self._transform(self.attribs[0], self._mvp(uniforms))
        normals = self.attribs[1].reshape(-1, 3, 3) @ model[:3, :3].T
        h, w = self.height * self.ss, self.width * self.ss
        attr_img, _, mask = rasterize(tris, jnp.asarray(normals), h, w)
        n = attr_img / jnp.maximum(
            jnp.linalg.norm(attr_img, axis=-1, keepdims=True), 1e-8)
        color = jnp.where(mask[..., None], n * 0.5 + 0.5, 0.0)
        if self.ss > 1:
            color = color.reshape(self.height, self.ss, self.width,
                                  self.ss, 3).mean(axis=(1, 3))
        self._color = np.asarray(color)


class ShRender(_BaseRender):
    """SH-lit albedo render (gl/ShRender.py + sh.fs): attrib 1 = normals,
    attrib 2 = uvs, uniform SHCoeffs [9, 3]."""

    def draw(self, uniforms: dict) -> None:
        from .sh import shade_sh

        tris = self._transform(self.attribs[0], self._mvp(uniforms))
        normals = self.attribs[1].reshape(-1, 3, 3)
        uvs = self.attribs[2].reshape(-1, 3, 2)
        attrs = jnp.asarray(np.concatenate([normals, uvs], axis=-1))
        h, w = self.height * self.ss, self.width * self.ss
        attr_img, _, mask = rasterize(tris, attrs, h, w)
        n = attr_img[..., :3]
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
        albedo = sample_texture(self.textures["AlbedoMap"], attr_img[..., 3:5])
        shading = shade_sh(n, jnp.asarray(uniforms["SHCoeffs"]))
        color = jnp.where(mask[..., None], albedo * shading, 0.0)
        if self.ss > 1:
            color = color.reshape(self.height, self.ss, self.width,
                                  self.ss, 3).mean(axis=(1, 3))
        self._color = np.asarray(color)


class PrtRender(_BaseRender):
    """Precomputed radiance transfer render (gl/PrtRender.py + prt.vs/fs):
    attrib 1 = uvs, attrib 2 = per-vertex PRT coeffs [F*3, 9]; the GLSL
    per-vertex band rotation (prt.vs:45-131) becomes an exact 9x9 SH
    rotation matrix applied to the environment coefficients.

    ``draw(..., uv_space=True)`` rasterizes in UV coordinates instead
    (the prt_uv.vs:155-160 texture-space mode: triangles placed at their
    UV positions, shading baked into the unwrap)."""

    def draw(self, uniforms: dict, uv_space: bool = False) -> None:
        from .sh import sh_rotation_matrix

        model = np.asarray(uniforms["ModelMat"], np.float32)
        if uv_space:
            uv = self.attribs[1].reshape(-1, 3, 2)
            pos = np.zeros((*uv.shape[:2], 4), np.float32)
            pos[..., :2] = uv * 2.0 - 1.0
            pos[..., 3] = 1.0
            tris = jnp.asarray(pos)
        else:
            tris = self._transform(self.attribs[0], self._mvp(uniforms))
        uvs = self.attribs[1].reshape(-1, 3, 2)
        prt = self.attribs[2].reshape(-1, 3, 9)
        attrs = jnp.asarray(np.concatenate([uvs, prt], axis=-1))
        h, w = self.height * self.ss, self.width * self.ss
        attr_img, _, mask = rasterize(tris, attrs, h, w)
        env = np.asarray(uniforms["SHCoeffs"], np.float32)      # [9, 3]
        env_rot = sh_rotation_matrix(model[:3, :3]) @ env
        shading = attr_img[..., 2:11] @ jnp.asarray(env_rot)
        albedo = sample_texture(self.textures["AlbedoMap"], attr_img[..., :2])
        color = jnp.where(mask[..., None], albedo * shading, 0.0)
        if self.ss > 1:
            color = color.reshape(self.height, self.ss, self.width,
                                  self.ss, 3).mean(axis=(1, 3))
        self._color = np.asarray(color)
