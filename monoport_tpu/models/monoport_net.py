"""MonoPortNet — the generic pixel-aligned implicit-function network.

Reference contract: monoport/lib/modeling/MonoPortNet.py:11-160. Differences
by design (TPU-native conventions):
  * images are NHWC [B, H, W, C]; features [B, h, w, C];
  * points are point-major [B, N, 3]; predictions [B, N, Res];
  * train/eval stage selection is an explicit ``train`` argument instead of
    module state (MonoPortNet.py:63-64);
  * factory dispatch goes through explicit registries instead of
    ``globals()`` (MonoPortNet.py:23-28).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.projection import PROJECTIONS
from ..ops.resize import interpolate_2d
from ..ops.sampling import index
from .backbones import BACKBONES
from .heads import HEADS
from .normalizers import PIFuNomalizer, DepthNormalizer

FeatStages = Sequence[Sequence[jax.Array]]

NORMALIZERS = {"PIFuNomalizer": PIFuNomalizer}


class MonoPortNet(nn.Module):
    opt_net: Any  # CfgNode with backbone/head/normalizer/projection/loss

    def setup(self):
        from ..config import CN
        # flax may have coerced the config dict into a FrozenDict field
        opt = CN(self.opt_net)
        assert opt.projection in ("orthogonal", "perspective")
        self.image_filter = BACKBONES[opt.backbone.IMF](
            opt.backbone, name="image_filter")
        self.surface_classifier = HEADS[opt.head.IMF](
            opt.head, name="surface_classifier")
        self.normalizer: DepthNormalizer = NORMALIZERS[opt.normalizer.IMF](
            opt.normalizer)
        self.projection = PROJECTIONS[opt.projection]

    # -- feature extraction (MonoPortNet.py:31-46) --------------------------
    def filter(self, images: jax.Array,
               feat_prior: Optional[jax.Array] = None) -> FeatStages:
        feats_stages = self.image_filter(images)
        if feat_prior is not None:  # netC: concat geometry prior features
            # F.interpolate default mode is nearest (MonoPortNet.py:42);
            # the reference hardcodes (128, 128) — the feature size at its
            # fixed 512^2 input — generalized here to the actual map size
            h, w = feats_stages[0][0].shape[1:3]
            feat_prior = interpolate_2d(feat_prior, (h, w), "nearest")
            feats_stages = [
                [jnp.concatenate([feat_prior, f], axis=-1) for f in feats]
                for feats in feats_stages]
        return feats_stages

    # -- point query (MonoPortNet.py:48-91) ---------------------------------
    def query(self, feats_stages: FeatStages, points: jax.Array,
              calibs: Optional[jax.Array] = None,
              transforms: Optional[jax.Array] = None,
              train: bool = False, head_fn=None) -> list[jax.Array]:
        """Query predictions at [B, N, 3] world points -> list of [B, N, Res].

        ``head_fn`` optionally replaces the flax surface classifier with an
        equivalent callable (the Pallas fused-MLP kernel on the hot path).
        """
        if not train:
            feats_stages = feats_stages[-1:]
        xyz = points if calibs is None else self.projection(
            points, calibs, transforms)
        xy = xyz[..., :2]
        z = xyz[..., 2:3]
        in_img = ((xy[..., 0] >= -1.0) & (xy[..., 0] <= 1.0)
                  & (xy[..., 1] >= -1.0) & (xy[..., 1] <= 1.0))
        z_feat = self.normalizer(z)
        preds = []
        for feats in feats_stages:
            # features set the compute dtype (bf16 fast path): the z
            # channel follows so the head GEMMs stay uniform
            z_cast = z_feat.astype(feats[0].dtype)
            point_local_feat = jnp.concatenate(
                [index(f, xy) for f in feats] + [z_cast], axis=-1)
            if head_fn is not None:
                pred = head_fn(point_local_feat)
            else:
                pred = self.surface_classifier(point_local_feat)
            preds.append(in_img[..., None].astype(pred.dtype) * pred)
        return preds

    # -- ray-structured query (fine-pass fast path) --------------------------
    def query_taps(self, feats_stages: FeatStages, xy_world: jax.Array,
                   z_world: jax.Array,
                   calibs: Optional[jax.Array] = None,
                   transforms: Optional[jax.Array] = None,
                   head_taps_fn=None) -> jax.Array:
        """Eval-mode query of T z-taps per ray: [B,R,2] xy + [B,R,T] z ->
        [B, R, T, Res].

        Same arithmetic as ``query`` on the expanded [B, R*T, 3] batch, but
        exploits that all taps of a ray share (x, y): the pixel-aligned
        feature gather (geometry.py:4-16) runs once per ray, and
        ``head_taps_fn`` (ops/pallas/fused_ray_mlp.py) shares the skip
        x-projections across taps. VALID ONLY when the calibration's
        image-plane rows have no z term — true for the flagship pifu_calib
        (RTL/recon.py:13-21) — and for the plain z*scale normalizer.
        """
        assert not self.normalizer.soft_onehot, \
            "query_taps requires the scalar z normalizer"
        feats = feats_stages[-1]
        base = jnp.concatenate([xy_world, z_world[..., :1]], axis=-1)
        xyz = self.projection(base, calibs, transforms) \
            if calibs is not None else base
        xy = xyz[..., :2]
        in_img = ((xy[..., 0] >= -1.0) & (xy[..., 0] <= 1.0)
                  & (xy[..., 1] >= -1.0) & (xy[..., 1] <= 1.0))
        # projected z per tap: the z row may mix x/y (fixed per ray), so
        # only the z-coefficient times the tap offset moves it
        zz = (calibs[:, 2, 2] if calibs is not None
              else jnp.ones((xy.shape[0],), xy.dtype))
        zc = xyz[..., 2:] + zz[:, None, None] * (z_world - z_world[..., :1])
        z_feat = self.normalizer(zc[..., None])[..., 0]      # [B, R, T]
        feat = jnp.concatenate([index(f, xy) for f in feats], axis=-1)
        if head_taps_fn is not None:
            pred = head_taps_fn(feat, z_feat.astype(feat.dtype))
        else:
            # correctness fallback through the flax head (still saves the
            # per-tap gathers): expand taps into the point axis
            b, r, t = z_feat.shape
            x = jnp.concatenate([
                jnp.broadcast_to(feat[:, :, None],
                                 (b, r, t, feat.shape[-1])),
                z_feat[..., None].astype(feat.dtype)], axis=-1)
            pred = self.surface_classifier(
                x.reshape(b, r * t, -1)).reshape(b, r, t, -1)
        return in_img[..., None, None].astype(pred.dtype) * pred

    # -- anchored ray query (rotated-view fast path) --------------------------
    def query_taps_anchored(self, feats_stages: FeatStages,
                            xy_world: jax.Array, z_world: jax.Array,
                            calibs: Optional[jax.Array] = None,
                            transforms: Optional[jax.Array] = None,
                            anchors: int = 2,
                            head_anchor_fn=None) -> jax.Array:
        """Eval-mode query of T z-taps per ray under an arbitrary affine
        calib OR a perspective net: [B,R,2] recon-space xy + [B,R,T] z ->
        [B, R, T, Res].

        The demo's orbit camera rotates the view extrinsic
        (RTL/scene.py:122-137), putting z-terms in the image rows — which
        invalidates ``query_taps``' shared-uv assumption. But a ray's
        projected path stays a STRAIGHT uv segment for both projections:
        linear in the tap z under any affine calib, and a projective map
        of a line (still a line, rationally reparameterized) under the
        z-divide (geometry.py:37-55). This path projects every tap
        EXACTLY (cheap — matvecs, no gathers), gathers features at
        ``anchors`` evenly spaced points on the chord, and reconstructs
        every tap's feature as the piecewise-linear combination of its two
        bracketing anchors (hat weights over alpha = the tap's exact chord
        position). (u, v, zc) and the in-image mask per tap are EXACT;
        the feature itself is approximate wherever the bilinear sample is
        nonlinear across a lerp segment — spans are ~2 texels/segment at
        demo orbit angles (DESIGN.md round-4 notes), measured against the
        exact per-point query by tests/test_anchored.py and
        scripts/eval_rotated_anchored.py. Gathers and skip x-projections
        drop from T to ``anchors`` per ray (ops/pallas/fused_ray_mlp.py
        apply_anchor_*). Requires the scalar z normalizer.
        """
        assert not self.normalizer.soft_onehot, \
            "query_taps_anchored requires the scalar z normalizer"
        feats = feats_stages[-1]
        b, r, t = z_world.shape
        k = anchors
        base_t = jnp.concatenate([
            jnp.broadcast_to(xy_world[:, :, None], (b, r, t, 2)),
            z_world[..., None]], axis=-1)                   # [B, R, T, 3]
        if calibs is not None:
            xyz_t = self.projection(base_t.reshape(b, r * t, 3), calibs,
                                    transforms).reshape(b, r, t, 3)
        else:
            xyz_t = base_t
        uv_t = xyz_t[..., :2]                               # exact per tap
        uv0 = uv_t[..., :1, :]
        duv = uv_t[..., -1:, :] - uv0                       # [B, R, 1, 2]
        # alpha: each tap's exact position on the chord (equals the z lerp
        # for affine calibs; rational in z under perspective)
        denom = (duv * duv).sum(-1)                         # [B, R, 1]
        alpha = jnp.where(denom > 1e-12,
                          ((uv_t - uv0) * duv).sum(-1)
                          / jnp.maximum(denom, 1e-12), 0.0)  # [B, R, T]
        ak = jnp.linspace(0.0, 1.0, k, dtype=jnp.float32) if k > 1 \
            else jnp.zeros((1,), jnp.float32)
        uv_k = uv0 + ak[:, None] * duv                      # [B, R, K, 2]
        feat_k = jnp.concatenate(
            [index(f, uv_k.reshape(b, r * k, 2)) for f in feats],
            axis=-1).reshape(b, r, k, -1)
        # hat weights: tap t combines its two bracketing anchors
        pos = alpha[..., None] * (k - 1) - jnp.arange(k, dtype=jnp.float32)
        w_taps = jnp.maximum(0.0, 1.0 - jnp.abs(pos))       # [B, R, T, K]
        in_img = ((uv_t[..., 0] >= -1.0) & (uv_t[..., 0] <= 1.0)
                  & (uv_t[..., 1] >= -1.0) & (uv_t[..., 1] <= 1.0))
        zc = xyz_t[..., 2:]                                 # [B, R, T, 1]
        z_feat = self.normalizer(zc)[..., 0]                # [B, R, T]
        if head_anchor_fn is not None:
            pred = head_anchor_fn(feat_k, w_taps,
                                  z_feat.astype(feat_k.dtype))
        else:
            # flax-head fallback: reconstruct per-tap features, expand taps
            # into the point axis (still saves the per-tap gathers)
            feat_t = jnp.einsum("brtk,brkc->brtc",
                                w_taps.astype(feat_k.dtype), feat_k)
            x = jnp.concatenate(
                [feat_t, z_feat[..., None].astype(feat_k.dtype)], axis=-1)
            pred = self.surface_classifier(
                x.reshape(b, r * t, -1)).reshape(b, r, t, -1)
        return in_img[..., None].astype(pred.dtype) * pred

    # -- grid-structured query (frontal fast path, gather-free) --------------
    def query_taps_grid(self, feats_stages: FeatStages, x_world: jax.Array,
                        y_world: jax.Array, z_world: jax.Array,
                        calibs: Optional[jax.Array] = None,
                        head_taps_fn=None) -> jax.Array:
        """Eval-mode query of an OUTER-PRODUCT ray lattice: x_world [B,Nu]
        x y_world [B,Nv] with z_world [B,Nu,Nv,T] z-taps ->
        [B, Nu, Nv, T, Res].

        Same arithmetic as ``query_taps`` on the flattened grid, but the
        pixel-aligned feature sampling is the separable matmul
        ``index_grid`` — no gathers at all. VALID ONLY when the calib's
        image-plane rows are diagonal and z-free (u depends on x alone, v
        on y alone): frontal pifu_calib (RTL/recon.py:13-21). The z row
        may still mix axes (per-point scalar). Callers gate on the
        concrete calib (engine._calib_grid_ok)."""
        from ..ops.sampling import index_grid

        assert not self.normalizer.soft_onehot, \
            "query_taps_grid requires the scalar z normalizer"
        feats = feats_stages[-1]
        if calibs is not None:
            u = calibs[:, 0, 0, None] * x_world + calibs[:, 0, 3, None]
            v = calibs[:, 1, 1, None] * y_world + calibs[:, 1, 3, None]
            zc = (calibs[:, 2, 0, None, None, None] * x_world[:, :, None, None]
                  + calibs[:, 2, 1, None, None, None] * y_world[:, None, :, None]
                  + calibs[:, 2, 2, None, None, None] * z_world
                  + calibs[:, 2, 3, None, None, None])
        else:
            u, v, zc = x_world, y_world, z_world
        in_img = ((u[:, :, None] >= -1.0) & (u[:, :, None] <= 1.0)
                  & (v[:, None, :] >= -1.0) & (v[:, None, :] <= 1.0))
        z_feat = self.normalizer(zc[..., None])[..., 0]   # [B, Nu, Nv, T]
        feat = jnp.concatenate(
            [index_grid(f, u, v) for f in feats], axis=-1)
        b, nu, nv, c = feat.shape
        t = z_feat.shape[-1]
        feat = feat.reshape(b, nu * nv, c)
        zf = z_feat.reshape(b, nu * nv, t).astype(feat.dtype)
        if head_taps_fn is not None:
            pred = head_taps_fn(feat, zf)
        else:
            x = jnp.concatenate([
                jnp.broadcast_to(feat[:, :, None],
                                 (b, nu * nv, t, feat.shape[-1])),
                zf[..., None]], axis=-1)
            pred = self.surface_classifier(
                x.reshape(b, nu * nv * t, -1)).reshape(b, nu * nv, t, -1)
        pred = pred.reshape(b, nu, nv, t, -1)
        return in_img[..., None, None].astype(pred.dtype) * pred

    # -- loss (MonoPortNet.py:93-117) ----------------------------------------
    def get_loss(self, pred_stages: Sequence[jax.Array],
                 labels: jax.Array) -> jax.Array:
        from ..config import CN
        imf = CN(self.opt_net).loss.IMF
        if imf == "MSE":
            fn = lambda p, l: jnp.mean((p - l) ** 2)
        elif imf == "L1":
            fn = lambda p, l: jnp.mean(jnp.abs(p - l))
        else:
            raise NotImplementedError(imf)
        loss = sum(fn(p, labels) for p in pred_stages)
        return loss / len(pred_stages)

    def __call__(self, images: jax.Array, points: jax.Array,
                 calibs: jax.Array, transforms: Optional[jax.Array] = None,
                 labels: Optional[jax.Array] = None,
                 feat_prior: Optional[jax.Array] = None,
                 train: bool = False):
        feats_stages = self.filter(images, feat_prior)
        pred_stages = self.query(feats_stages, points, calibs, transforms,
                                 train=train)
        if labels is not None:
            return pred_stages[-1], self.get_loss(pred_stages, labels)
        return pred_stages[-1]


def eval_net(net: MonoPortNet) -> MonoPortNet:
    """Inference-mode sibling of a net trained with norm='batch_train':
    same parameter/batch_stats trees, BatchNorm switched to running stats.
    Nets without train-mode BN are returned unchanged."""
    from ..config import CN
    opt = CN(net.opt_net)
    if opt.backbone.get("norm", "group") == "batch_train":
        opt.backbone.norm = "batch"
        return MonoPortNet(opt)
    return net


def _pifu_opt(projection: str, backbone: str, head: str, loss: str):
    from ..config import CN
    opt = CN()
    opt.projection = projection
    opt.backbone = CN({"IMF": backbone})
    opt.normalizer = CN({"IMF": "PIFuNomalizer", "soft_onehot": False,
                         "soft_dim": 64})
    opt.head = CN({"IMF": head})
    opt.loss = CN({"IMF": loss})
    return opt


def PIFuNetG() -> MonoPortNet:
    """Geometry network factory (MonoPortNet.py:163-184)."""
    return MonoPortNet(_pifu_opt(
        "orthogonal", "PIFuHGFilters", "PIFuNetGMLP", "MSE"))


def PIFuNetC() -> MonoPortNet:
    """Color network factory (MonoPortNet.py:187-208)."""
    return MonoPortNet(_pifu_opt(
        "orthogonal", "PIFuResBlkFilters", "PIFuNetCMLP", "L1"))
