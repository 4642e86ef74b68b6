"""ReconEngine — the fused per-frame on-device program.

This is the TPU-native replacement for the reference's 15-stage
multi-thread/multi-GPU pipeline core (RTL/main.py:326-452, stages 7-14):
netG feature filtering, hierarchical occupancy reconstruction, visible-
surface depth peeling, normal shading, netC color query and visualization
all compile into a single XLA program — the device boundaries of the
reference (feats .to(cuda_recon), verts .to(cuda_color)) become no-ops or
XLA-managed transfers, and the five sequential recon levels stay on-device
instead of doing five GPU round-trips per frame.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .models import MonoPortNet
from .recon.depth_peel import colorize, depth_peel, shade_normal, visualize
from .recon.hierarchy import HierarchicalRecon

# Adaptive rotated-compaction budget rungs: a BOUNDED set of compiled
# frame variants (each rung used is one extra cached trace). Floor 0.25
# keeps a tiny subject from demanding ever-smaller programs; measured
# dC/dN: 0.5 -> 0.25 on the bench body is 36.9 -> 41.5 fps with zero
# drops (scripts/probe_points_cost.py).
COMPACT_LADDER = (0.25, 0.375, 0.5, 0.625)


def _snap_budget(hint: float, ceiling: float) -> float:
    """Smallest COMPACT_LADDER rung >= hint, capped at the constructor
    ceiling (a capped rung may drop rays; telemetry counts them)."""
    for rung in COMPACT_LADDER:
        if rung >= hint:
            return min(rung, ceiling)
    return ceiling


# --------------------------------------------------------------------------
# Engine configuration — grouped, frozen (VERDICT r4 item 6: the flat
# 20-knob constructor hid the rotated/texture/ray interactions; the groups
# below make them explicit and hashable). Measurement history that used to
# live in the constructor docstring is in DESIGN.md ("engine knob history").
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RayCfg:
    """Reconstruction-path shape.

    mode: 'dense' = full hierarchical volume at the final resolution
      (exact, frame output keeps 'sdf'); 'ray' = coarse volume + per-ray
      fine refinement (recon/ray_refine.py) — the real-time path.
    fine_res: fine ray-grid resolution (reference volume: 257,
      RTL/main.py:187).
    taps: fine z-taps per ray bracketing the coarse crossing.
    window: optional window^2 ray block over the subject bbox (the
      detection-region prior, RTL/main.py:290); None = full lattice.
    march_levels: e.g. (33, 65) — replace coarse hierarchy + depth peel
      with the volume-free ray-march pyramid (ray_refine.ray_pyramid) on
      eligible frames; emits no 'sdf'/'recon_counts'. Requires mode='ray'
      and direction='front'.
    use_ray_query: ALLOW the ray-structured fine pass (shared gather +
      skip x-projections per ray, ops/pallas/fused_ray_mlp.py). Only valid
      for calibs with z-free image-plane rows; frame() checks per call and
      falls back for rotated cameras. False disables it outright.
    """
    mode: str = "dense"
    fine_res: int = 257
    taps: int = 6
    window: Optional[int] = None
    march_levels: Optional[tuple] = None
    use_ray_query: bool = True


@dataclasses.dataclass(frozen=True)
class RotatedCfg:
    """Rotated-view (orbit camera / perspective net) path.

    march: rotated calibs also take the march pyramid via exact per-point
      queries (the march axis IS the view ray for any calib); False
      restores the hierarchy fallback (keeps 'sdf' for rotated frames).
    compact: query only the coarse-valid rays of each refine level and
      only the valid texture pixels, padded to this fraction of the
      lattice; None = dense. This is the CEILING of the adaptive
      per-frame budget (frame(compact_hint=...) snaps up COMPACT_LADDER).
      Overflow degrades to the coarse silhouette and is counted in
      frame()['compact_dropped'].
    anchors: refine levels run the anchored ray query
      (monoport_net.query_taps_anchored: K feature gathers per ray +
      per-tap lerp). 'auto' = per-level K from the concrete calib
      (engine._rot_anchor_plan); an int pins K; None/0 = exact per-point
      refines.
    anchor_texels: 'auto' planner tolerance — max feature texels a lerp
      segment may span (sweep history in DESIGN.md).
    """
    march: bool = True
    compact: Optional[float] = 0.5
    anchors: Any = "auto"
    anchor_texels: float = 1.5


@dataclasses.dataclass(frozen=True)
class TextureCfg:
    """netC texture-stage knobs (rotated per-point path).

    bf16: keep netC feature maps in compute_dtype for the per-point
      texture query instead of casting f32. Measured a no-op end-to-end
      (DESIGN.md r4); kept as the A/B record.
    reuse_compact: the per-point texture query rides the final refine
      level's compaction (window, gathered rays, refined depths) instead
      of re-deriving window/valid/flatnonzero from the assembled maps.
    stride: query colors on a DENSE (window/stride)^2 lattice instead of
      the compacted valid set — no flatnonzero/scatter glue at all, and
      stride 2 quarters the queried points (the r4 roofline's reading:
      the rotated texture stage is small-op latency, and its measured
      cost DOES scale with point count, probe_points_cost.py). Colors
      are bilinearly upsampled back to the ray lattice; geometry is
      untouched. Quality trade is bounded by color smoothness over
      ~stride fine pixels (measured: probe_tex_stride.py + DESIGN.md).
      1 = exact (compacted-valid query, the r4 path).
    pallas_head: run the per-point texture query's color MLP through the
      fused Pallas head like the occupancy queries do. MEASURED as the
      rotated texture stage's entire fixed cost (probe_tex_headpath.py,
      r5): the pallas_call at the texture shape costs ~7.4 ms/frame that
      the XLA flax head simply doesn't (37.7 -> 52.5 fps, output MAD
      1.2e-4). Default False = XLA head for the per-point color query;
      engine.use_pallas keeps governing the occupancy heads.
    """
    bf16: bool = False
    reuse_compact: bool = True
    stride: int = 1
    pallas_head: bool = False


@dataclasses.dataclass(frozen=True)
class EngineCfg:
    """Grouped ReconEngine configuration (frozen — one engine, one config).

    render_size: output canvas (reference: 256, RTL/main.py:257).
    direction: depth-peel view direction for the dense path.
    compute_dtype: backbone/MLP compute dtype (bf16 = the demo path; the
      feature maps feeding point queries are upcast f32, see _feats_f32).
    use_pallas: fused VMEM-resident Pallas kernels for the surface MLPs.
    pallas_interpret: interpret-mode kernels (CPU tests).
    """
    render_size: int = 256
    direction: str = "front"
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    ray: RayCfg = RayCfg()
    rotated: RotatedCfg = RotatedCfg()
    texture: TextureCfg = TextureCfg()

    _FLAT = {  # legacy flat knob name -> (group, field); None = top level
        "render_size": None, "direction": None, "compute_dtype": None,
        "use_pallas": None, "pallas_interpret": None,
        "mode": ("ray", "mode"), "fine_res": ("ray", "fine_res"),
        "ray_taps": ("ray", "taps"), "ray_window": ("ray", "window"),
        "march_levels": ("ray", "march_levels"),
        "use_ray_query": ("ray", "use_ray_query"),
        "march_rotated": ("rotated", "march"),
        "compact_rotated": ("rotated", "compact"),
        "rot_anchors": ("rotated", "anchors"),
        "rot_anchor_texels": ("rotated", "anchor_texels"),
        "tex_bf16": ("texture", "bf16"),
        "tex_reuse_compact": ("texture", "reuse_compact"),
        "tex_stride": ("texture", "stride"),
        "tex_pallas_head": ("texture", "pallas_head"),
    }

    @classmethod
    def flat(cls, **knobs) -> "EngineCfg":
        """Build a grouped config from the legacy flat knob names (the
        pre-r5 ReconEngine keyword surface) — one mapping, kept for the
        measurement-record scripts whose call sites are history."""
        top: dict = {}
        groups: dict = {"ray": {}, "rotated": {}, "texture": {}}
        for name, value in knobs.items():
            where = cls._FLAT[name]     # KeyError = unknown knob, loudly
            if where is None:
                top[name] = value
            else:
                groups[where[0]][where[1]] = value
        return cls(ray=RayCfg(**groups["ray"]),
                   rotated=RotatedCfg(**groups["rotated"]),
                   texture=TextureCfg(**groups["texture"]), **top)


class ReconEngine:
    """Jitted frame program: (params, images, calib) -> rendered maps.

    Args:
      netG / netC: MonoPortNet modules (netC optional — texture off).
      recon: HierarchicalRecon config (resolutions/budgets/tau).
      config: EngineCfg — every shape/path knob, grouped (ray / rotated /
        texture). Legacy flat knob names build one via EngineCfg.flat().
      mesh: optional jax.sharding.Mesh with a 'points' axis — the point/
        ray batches of every occupancy and texture query are sharded over
        it (features replicated, XLA partitions the gathers+MLP GEMMs and
        all-gathers the tiny occupancy outputs over ICI). The TPU analog
        of SURVEY §5.7's long-axis scaling. Pallas heads stay enabled
        under a mesh: they are pure maps over rays/points, so each one is
        wrapped in shard_map over 'points' (_shard_map_head) and runs
        per-chip while XLA manages the surrounding collectives.
    """

    def __init__(self, netG: MonoPortNet, netC: Optional[MonoPortNet] = None,
                 recon: Optional[HierarchicalRecon] = None,
                 config: Optional[EngineCfg] = None, mesh=None):
        cfg = config or EngineCfg()
        self.config = cfg
        assert cfg.ray.mode in ("dense", "ray")
        self.netG = netG
        self.netC = netC
        self.recon = recon or HierarchicalRecon()
        # flat attribute mirrors of the grouped config: the engine body
        # (and the probe/profile scripts) read these by their r1-r4 names
        self.render_size = cfg.render_size
        self.direction = cfg.direction
        self.compute_dtype = cfg.compute_dtype
        self.mode = cfg.ray.mode
        self.fine_res = cfg.ray.fine_res
        self.ray_taps = cfg.ray.taps
        self.ray_window = cfg.ray.window
        self.use_pallas = cfg.use_pallas
        self.pallas_interpret = cfg.pallas_interpret
        self.use_ray_query = cfg.ray.use_ray_query
        self.march_levels = (tuple(cfg.ray.march_levels)
                             if cfg.ray.march_levels else None)
        self.march_rotated = cfg.rotated.march
        self.compact_rotated = cfg.rotated.compact
        self.tex_bf16 = cfg.texture.bf16
        self.tex_reuse_compact = cfg.texture.reuse_compact
        self.tex_stride = cfg.texture.stride
        self.tex_pallas_head = cfg.texture.pallas_head
        self.rot_anchors = cfg.rotated.anchors
        self.rot_anchor_texels = cfg.rotated.anchor_texels
        if self.march_levels:
            assert self.mode == "ray" and self.direction == "front", \
                "march_levels requires mode='ray' and the frontal viewer"
        self.mesh = mesh
        # use_taps is static: frame() picks the variant per call from the
        # CONCRETE calib (the ray-structured fast path is only valid when
        # the image-plane rows have no z term; a rotating demo camera must
        # fall back to the exact per-point fine pass)
        self._frame = jax.jit(self._frame_impl,
                              static_argnames=("use_taps", "use_grid",
                                               "rot_k", "stage",
                                               "compact_budget"))
        # vmapped variants: keyed on (texture stream?, taps ok?)
        # (in_axes differ; retraces for new shapes are jax.jit's job)
        self._frames_jit: dict[tuple, Any] = {}

    def _calib_taps_ok(self, calibs) -> bool:
        """True iff every (concrete) calib has z-free image-plane rows —
        the validity condition of query_taps (monoport_net.py:110-112).
        A perspective-projection net NEVER qualifies: the z-divide moves
        (u, v) along every ray regardless of the calib (geometry.py:37-55)
        — those configs ride the anchored rotated-frame machinery instead
        (r4; the uv path is still a straight segment under perspective).
        Host-side check on the host-built calib; never call under trace."""
        if not self.use_ray_query:
            return False
        from .config import CN
        if CN(self.netG.opt_net).projection != "orthogonal":
            return False
        import numpy as np
        c = np.asarray(calibs)
        return bool(np.abs(c[..., :2, 2]).max() < 1e-6)

    def _calib_grid_ok(self, calibs) -> bool:
        """True iff the calib's image rows are DIAGONAL and z-free (u from
        x alone, v from y alone) — the validity condition of the separable
        gather-free sampling (query_taps_grid). Frontal pifu_calib
        qualifies; any in-plane rotation falls back to query_taps."""
        if not self._calib_taps_ok(calibs):
            return False
        import numpy as np
        c = np.asarray(calibs)
        return bool(max(np.abs(c[..., 0, 1]).max(),
                        np.abs(c[..., 1, 0]).max()) < 1e-6)

    def _shard_points(self, x: jax.Array, axis: int = 1) -> jax.Array:
        """Constrain a point/ray batch to the mesh's 'points' axis."""
        if self.mesh is None or "points" not in self.mesh.axis_names:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        spec = [None] * x.ndim
        spec[axis] = "points"
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, PartitionSpec(*spec)))

    def _feats_f32(self, feats):
        """bf16 backbone -> f32 feature maps before the point queries.

        Two reasons: (a) the XLA TPU backend crashes its register
        allocator on large-N bf16 gather+GEMM query programs (verified on
        v5e: RET_CHECK in lsrav2/live_range_finder.cc); (b) bf16 lives in
        the MLP via the Pallas kernel anyway, where the FLOPs are.
        """
        if self.compute_dtype == jnp.float32:
            return feats
        return [[f.astype(jnp.float32) for f in fs] for fs in feats]

    def _head_fn(self, net: MonoPortNet, params: Any):
        """Pallas fused-MLP head override (None -> flax head)."""
        if not self.use_pallas:
            return None
        from .config import CN
        from .models.heads import HEAD_SPECS
        from .ops.pallas.fused_mlp import apply_packed, pack_mlp_params

        chans, last_op = HEAD_SPECS[CN(net.opt_net).head.IMF]
        dtype = self.compute_dtype
        packed = pack_mlp_params(params["params"]["surface_classifier"],
                                 chans, dtype)
        return self._shard_map_head(
            functools.partial(apply_packed, packed, last_op=last_op,
                              compute_dtype=dtype,
                              interpret=self.pallas_interpret))

    def _shard_map_head(self, head):
        """Wrap a per-point/per-ray head (arrays [B, R, ...] -> [B, R, ...],
        pure map over axis 1) in shard_map over the mesh 'points' axis,
        padding R up to the shard count. This keeps the Pallas kernels in
        mesh mode (they run per-chip on their ray slice; the map is
        communication-free, so no collectives are needed inside)."""
        if self.mesh is None or "points" not in self.mesh.axis_names \
                or self.mesh.shape["points"] == 1:
            return head
        import functools as ft

        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
            shard_map = ft.partial(shard_map, check_vma=False)
        except ImportError:  # pre-0.9 location
            from jax.experimental.shard_map import shard_map
            shard_map = ft.partial(shard_map, check_rep=False)
        mesh = self.mesh
        n = mesh.shape["points"]

        def wrapped(*arrays):
            r = arrays[0].shape[1]
            rp = -(-r // n) * n
            padded = tuple(
                jnp.pad(a, ((0, 0), (0, rp - r)) + ((0, 0),) * (a.ndim - 2))
                for a in arrays)
            # vma/rep checking is off: pallas_call's out_shape carries no
            # varying-mesh-axis annotation, and the head is a pure per-ray
            # map so the check adds nothing here
            fn = shard_map(lambda *xs: head(*xs), mesh=mesh,
                           in_specs=tuple(P(None, "points") for _ in padded),
                           out_specs=P(None, "points"))
            return fn(*padded)[:, :r]

        return wrapped

    def _ray_head(self, net: MonoPortNet, params: Any):
        """Packed ray-structured head (shared z-splitting MLP kernel) for
        a net, or None when the config can't use it (soft-onehot z,
        non-orthogonal projection)."""
        if not self.use_ray_query:
            return None
        from .config import CN
        from .models.heads import HEAD_SPECS
        from .ops.pallas.fused_ray_mlp import (apply_ray_packed,
                                               apply_ray_xla,
                                               pack_ray_mlp_params)

        opt = CN(net.opt_net)
        if opt.projection != "orthogonal" or \
                opt.normalizer.get("soft_onehot", False):
            return None
        last_op = HEAD_SPECS[opt.head.IMF][1]
        dtype = self.compute_dtype
        # channels inferred from the params: small-backbone configs have a
        # narrower head input than the PIFu factory spec (flax Dense infers)
        packed = pack_ray_mlp_params(params["params"]["surface_classifier"],
                                     dtype=dtype)
        if self.use_pallas:
            head = functools.partial(apply_ray_packed, packed,
                                     last_op=last_op, compute_dtype=dtype,
                                     interpret=self.pallas_interpret)
        else:
            head = functools.partial(apply_ray_xla, packed,
                                     last_op=last_op, compute_dtype=dtype)
        return self._shard_map_head(head)

    def _query_taps_fn(self, net: MonoPortNet, params: Any, feats, calib):
        """Ray-structured occupancy query for the fine pass, or None when
        the net config can't use it (soft-onehot z, non-orthogonal)."""
        head = self._ray_head(net, params)
        if head is None:
            return None

        def query_taps(xy, z_taps):
            xy = self._shard_points(xy)
            z_taps = self._shard_points(z_taps)
            return net.apply(params, feats, xy, z_taps, calib,
                             method="query_taps", head_taps_fn=head)[..., 0]

        return query_taps

    def _refine_pairs(self) -> list:
        """(rc, rf) resolution pairs of the refine levels a rotated frame
        runs, in order — the march pyramid's chain, or the hierarchy
        fallback's single coarse->fine pass."""
        if self.march_levels and self.march_rotated:
            lv = list(self.march_levels) + [self.fine_res]
            return list(zip(lv[:-1], lv[1:]))
        if self.mode == "ray":
            return [(self.recon.resolutions[-1], self.fine_res)]
        return []

    def _rot_anchor_plan(self, calibs, image_h: int) -> tuple:
        """Host-side per-refine-level anchor counts for a rotated calib
        (or any calib of a perspective net).

        A refine level's taps span (2*pad+1) fine voxels along recon z
        (ray_refine._refine_core); under the net's projection they sweep
        an image-space chord whose texel length is measured NUMERICALLY
        here — project that z-span's endpoints through the actual
        projection (affine or z-divide) for a grid of probe rays across
        the volume and take the worst chord. K anchors split the chord
        into K-1 lerp segments; K is the smallest count keeping each
        segment under ~rot_anchor_texels feature texels (the scale on
        which bilinear samples are near-linear — eval_rotated_anchored.py
        measures the resulting end-to-end deviation). Levels that would
        need K >= taps gain nothing and fall back to exact per-point
        (None). Fixed-int rot_anchors pins every level (tests/sweeps)."""
        import math

        import numpy as np
        if not self.rot_anchors or not self._refine_pairs():
            return ()
        pairs = self._refine_pairs()
        if self.rot_anchors != "auto":
            return tuple(int(self.rot_anchors) for _ in pairs)
        from .config import CN
        persp = CN(self.netG.opt_net).projection == "perspective"
        c = np.asarray(calibs).reshape(-1, 4, 4)[0]
        feat_hw = max(image_h // 4, 2)          # stride-4 backbones
        b_min = np.asarray(self.recon.b_min, np.float64)
        b_max = np.asarray(self.recon.b_max, np.float64)
        # probe rays: 5x5 (x, y) grid x a few z starts across the volume
        ax = np.linspace(0.0, 1.0, 5)
        gx, gy = np.meshgrid(ax, ax, indexing="ij")
        xy = np.stack([b_min[0] + gx.ravel() * (b_max[0] - b_min[0]),
                       b_min[1] + gy.ravel() * (b_max[1] - b_min[1])], -1)

        def uv(pts):
            homo = pts @ c[:3, :3].T + c[:3, 3]
            if persp:
                return homo[..., :2] / np.maximum(
                    np.abs(homo[..., 2:3]), 1e-9) * np.sign(homo[..., 2:3])
            return homo[..., :2]

        z_range = float(b_max[2] - b_min[2])
        plan = []
        for rc, rf in pairs:
            scale = (rf - 1) / (rc - 1)
            pad = math.ceil(scale) + 1
            world_span = (2 * pad + 1) * z_range / (rf - 1)
            span = 0.0
            for z0f in (0.0, 0.5, 1.0 - world_span / z_range):
                z0 = b_min[2] + z0f * z_range
                p0 = np.concatenate([xy, np.full((len(xy), 1), z0)], -1)
                p1 = p0.copy()
                p1[:, 2] += world_span
                span = max(span, float(
                    np.linalg.norm(uv(p1) - uv(p0), axis=-1).max()))
            texels = span * 0.5 * (feat_hw - 1)
            k = max(2, math.ceil(texels / self.rot_anchor_texels) + 1)
            plan.append(k if k < self.ray_taps else None)
        return tuple(plan)

    def _query_anchored_fn(self, net: MonoPortNet, params: Any, feats,
                           calib, anchors: int):
        """Anchored ray occupancy query for ROTATED-calib refine passes
        (same [B,R,2] xy + [B,R,T] z -> [B,R,T] contract as
        `_query_taps_fn`, valid for ANY affine calib AND for perspective
        nets — a ray's uv path is a straight chord under both,
        monoport_net.query_taps_anchored), or None when the net config
        can't use it (soft-onehot z)."""
        from .config import CN
        from .models.heads import HEAD_SPECS
        from .ops.pallas.fused_ray_mlp import (apply_anchor_packed,
                                               apply_anchor_xla,
                                               pack_ray_mlp_params)

        opt = CN(net.opt_net)
        if opt.normalizer.get("soft_onehot", False):
            return None
        last_op = HEAD_SPECS[opt.head.IMF][1]
        dtype = self.compute_dtype
        packed = pack_ray_mlp_params(params["params"]["surface_classifier"],
                                     dtype=dtype)
        if self.use_pallas:
            head = functools.partial(apply_anchor_packed, packed,
                                     last_op=last_op, compute_dtype=dtype,
                                     interpret=self.pallas_interpret)
        else:
            head = functools.partial(apply_anchor_xla, packed,
                                     last_op=last_op, compute_dtype=dtype)
        head = self._shard_map_head(head)

        def query_anchored(xy, z_taps):
            xy = self._shard_points(xy)
            z_taps = self._shard_points(z_taps)
            return net.apply(params, feats, xy, z_taps, calib,
                             method="query_taps_anchored", anchors=anchors,
                             head_anchor_fn=head)[..., 0]

        return query_anchored

    def _query_grid_fn(self, net: MonoPortNet, params: Any, feats, calib):
        """Grid-structured occupancy query (separable gather-free feature
        sampling, ops/sampling.index_grid) for outer-product ray lattices,
        or None when ineligible. Under a mesh the sampling einsums stay
        replicated-or-partitioned at XLA's choice while the head (already
        shard_map'ed over 'points' by _ray_head) shards the flattened ray
        axis — multi-chip keeps the full r3 grid program."""
        head = self._ray_head(net, params)
        if head is None:
            return None

        def query_grid(xw, yw, wz):
            return net.apply(params, feats, xw[None], yw[None], wz[None],
                             calib, method="query_taps_grid",
                             head_taps_fn=head)[0, ..., 0]

        return query_grid

    def _grid_color_fn(self, net: MonoPortNet, params: Any, feats, calib):
        """Grid-structured TEXTURE query: one surface point per ray on the
        outer-product lattice ([r] x [r] world axes + [r, r] surface z) ->
        [r, r, 3] colors. Replaces colorize()'s 257^2-point gather+MLP on
        the frontal path (the gather alone measured ~8 ms; r3 ledger)."""
        head = self._ray_head(net, params)
        if head is None:
            return None

        def color_grid(xw, yw, zw):
            return net.apply(params, feats, xw[None], yw[None],
                             zw[None, ..., None], calib,
                             method="query_taps_grid",
                             head_taps_fn=head)[0, :, :, 0, :]

        return color_grid

    def _texture_canvas(self, maps, resolution: int, color_grid=None,
                        query_color=None, compact: Optional[float] = None,
                        telemetry: Optional[list] = None,
                        reuse: Optional[dict] = None):
        """Texture canvas with the bbox window, for BOTH color queries.

        When a fine-pass window is configured (`ray_window`), the color
        MLP runs only on a window^2 lattice over the subject's bbox — the
        texture analog of the fine-pass window (r3 stage ledger: the 257^2
        texture query is the frame's largest stage, and ~45% of its rays
        lie outside the window that bounds every tap-verified surface
        pixel). The stride-1 case (subject fits the window, integer start)
        resamples back to the full lattice as an EXACT gather; a larger
        subject gets a bilinear color resample at stride > 1 — colors are
        smooth, unlike depth, so this matches the fine pass's own
        resampling policy.

        ``color_grid`` (frontal frames): gather-free separable query — the
        ray lattice is an outer-product grid, so the voxel->world map of
        surface_world_points (RTL/main.py:204-210 semantics) factors into
        per-axis vectors + the per-ray surface z. ``query_color`` (rotated
        view frames): the exact per-point query on the same window lattice
        — the window cuts its gather+MLP cost the same way.

        ``compact``: per-point branch only — query just the window pixels
        whose ray is valid (padded to this fraction of the window lattice,
        ray_refine._compact_rays); unqueried pixels stay background-white.
        Colors at valid pixels are identical; the final canvas masks by
        ``maps.valid`` anyway, so this only skips MLP+gather work the
        mask was about to discard (the rotated-texture cost lever).

        ``reuse``: the final refine level's compact_state (tex_reuse_compact
        docstring) — the color query runs directly at that level's gathered
        rays and refined depths, skipping this function's own window/
        valid/flatnonzero derivation entirely. World coordinates still use
        the texture (r)-convention (surface_world_points parity), NOT the
        refine's (r-1) step, so colors at valid pixels match the
        independent path exactly at stride 1."""
        r = resolution
        b_min = jnp.asarray(self.recon.b_min, jnp.float32)
        b_max = jnp.asarray(self.recon.b_max, jnp.float32)
        sr = (b_max - b_min) / r
        w = self.ray_window
        if w is None or w >= r:
            if color_grid is not None:
                a = jnp.arange(r, dtype=jnp.float32)
                color = color_grid(a * sr[0] + b_min[0],
                                   a * sr[1] + b_min[1],
                                   (float(r) - maps.depth) * sr[2]
                                   + b_min[2])
                color = color * 0.5 + 0.5
                return jnp.where(maps.valid[..., None], color, 1.0)
            return colorize(maps, query_color, r, self.recon.b_min,
                            self.recon.b_max)
        from .recon.ray_refine import _axis_window, _sample_grid
        if self.tex_stride > 1 and query_color is not None:
            # dense strided color lattice (texture.stride docstring): one
            # (w/stride)^2 grid query over the SAME window span — no
            # valid resample, no flatnonzero, no scatter; colors are
            # bilinearly upsampled to the ray lattice and masked by
            # maps.valid as every other branch. Invalid lattice pixels
            # carry the march's fallback-depth color; they only matter as
            # a <= stride-texel halo blended at silhouette edges.
            # no telemetry row: the dense lattice cannot drop pixels
            # (compact_report tolerates the absent texture row)
            if reuse is not None:
                w = reuse["w"]
                x0, sx, y0, sy = (reuse["x0"], reuse["sx"],
                                  reuse["y0"], reuse["sy"])
            else:
                x0, sx = _axis_window(maps.valid.any(axis=1), r, r, 1.0, w)
                y0, sy = _axis_window(maps.valid.any(axis=0), r, r, 1.0, w)
            wc = max(2, w // self.tex_stride)
            sxc = sx * (w - 1) / (wc - 1)
            syc = sy * (w - 1) / (wc - 1)
            ac = x0 + jnp.arange(wc, dtype=jnp.float32) * sxc
            bc = y0 + jnp.arange(wc, dtype=jnp.float32) * syc
            depth_c = _sample_grid(maps.depth, ac, bc)
            xw = ac * sr[0] + b_min[0]
            yw = bc * sr[1] + b_min[1]
            zw = (float(r) - depth_c) * sr[2] + b_min[2]
            pts = jnp.stack([jnp.broadcast_to(xw[:, None], (wc, wc)),
                             jnp.broadcast_to(yw[None, :], (wc, wc)),
                             zw], axis=-1).reshape(1, -1, 3)
            color_c = query_color(pts)[0].reshape(wc, wc, 3)
            fr = jnp.arange(r, dtype=jnp.float32)
            u = jnp.clip((fr - x0) / sxc, 0.0, wc - 1)
            v = jnp.clip((fr - y0) / syc, 0.0, wc - 1)
            color = jnp.stack([_sample_grid(color_c[..., k], u, v)
                               for k in range(3)], axis=-1)
            color = color * 0.5 + 0.5
            return jnp.where(maps.valid[..., None], color, 1.0)
        if reuse is not None:
            # ride the final refine level's compaction: same window, same
            # gathered rays, refined depth straight from the core — no
            # second _axis_window / valid resample / flatnonzero round
            w = reuse["w"]
            x0, sx, y0, sy = (reuse["x0"], reuse["sx"],
                              reuse["y0"], reuse["sy"])
            idx, safe = reuse["idx"], reuse["safe"]
            if telemetry is not None:
                # a ray dropped at the refine level loses its texture too
                telemetry.append(reuse["dropped"])
            xw = reuse["aw"] * sr[0] + b_min[0]
            yw = reuse["bw"] * sr[1] + b_min[1]
            zw_sel = (float(r) - reuse["z"]) * sr[2] + b_min[2]   # [K]
            pts = jnp.stack([xw[safe // w], yw[safe % w], zw_sel],
                            axis=-1)[None]                        # [1, K, 3]
            col = query_color(pts)[0]                             # [K, 3]
            color_w = jnp.ones((w * w, 3), col.dtype).at[idx].set(
                col, mode="drop").reshape(w, w, 3)
            fr = jnp.arange(r, dtype=jnp.float32)
            u = jnp.clip((fr - x0) / sx, 0.0, w - 1)
            v = jnp.clip((fr - y0) / sy, 0.0, w - 1)
            color = jnp.stack([_sample_grid(color_w[..., k], u, v)
                               for k in range(3)], axis=-1)
            color = color * 0.5 + 0.5
            return jnp.where(maps.valid[..., None], color, 1.0)
        x0, sx = _axis_window(maps.valid.any(axis=1), r, r, 1.0, w)
        y0, sy = _axis_window(maps.valid.any(axis=0), r, r, 1.0, w)
        aw = x0 + jnp.arange(w, dtype=jnp.float32) * sx
        bw = y0 + jnp.arange(w, dtype=jnp.float32) * sy
        depth_w = _sample_grid(maps.depth, aw, bw)
        xw = aw * sr[0] + b_min[0]
        yw = bw * sr[1] + b_min[1]
        zw = (float(r) - depth_w) * sr[2] + b_min[2]
        if color_grid is not None:
            color_w = color_grid(xw, yw, zw)
        else:
            from .recon.ray_refine import _compact_rays
            budget = _compact_rays(compact, w, w)
            if budget:
                # query only valid-ray window pixels; the rest stay white
                # (display background) and are masked by maps.valid below
                v_w = _sample_grid(maps.valid.astype(jnp.float32),
                                   aw, bw) > 0.0
                if telemetry is not None:
                    # valid pixels beyond the budget keep the white
                    # background — count them (frame 'compact_dropped')
                    telemetry.append(jnp.maximum(
                        v_w.sum(dtype=jnp.int32) - budget, 0))
                idx = jnp.flatnonzero(v_w.reshape(-1), size=budget,
                                      fill_value=w * w)
                safe = jnp.where(idx < w * w, idx, 0)
                pts = jnp.stack([xw[safe // w], yw[safe % w],
                                 zw.reshape(-1)[safe]],
                                axis=-1)[None]               # [1, K, 3]
                col = query_color(pts)[0]                    # [K, 3]
                color_w = jnp.ones((w * w, 3), col.dtype).at[idx].set(
                    col, mode="drop").reshape(w, w, 3)
            else:
                pts = jnp.stack([jnp.broadcast_to(xw[:, None], (w, w)),
                                 jnp.broadcast_to(yw[None, :], (w, w)),
                                 zw], axis=-1).reshape(1, -1, 3)
                color_w = query_color(pts)[0].reshape(w, w, 3)
        fr = jnp.arange(r, dtype=jnp.float32)
        u = jnp.clip((fr - x0) / sx, 0.0, w - 1)
        v = jnp.clip((fr - y0) / sy, 0.0, w - 1)
        color = jnp.stack([_sample_grid(color_w[..., k], u, v)
                           for k in range(3)], axis=-1)
        color = color * 0.5 + 0.5
        return jnp.where(maps.valid[..., None], color, 1.0)

    def _cast(self, tree):
        if self.compute_dtype == jnp.float32 or tree is None:
            return tree
        return jax.tree.map(
            lambda t: t.astype(self.compute_dtype)
            if hasattr(t, "dtype") and t.dtype == jnp.float32 else t, tree)

    def _frame_impl(self, params_g: Any, params_c: Any, image_g: jax.Array,
                    image_c: Optional[jax.Array], calib: jax.Array,
                    use_taps: bool = True, use_grid: bool = False,
                    rot_k: tuple = (), stage: Optional[str] = None,
                    compact_budget: Optional[float] = None):
        """``stage``: optional prefix truncation for the stage profilers
        and the roofline cost model (scripts/profile_stages_*,
        scripts/roofline_stages.py) — 'filter' | 'recon' | 'shade' |
        'cfilter' stop after that stage and return {'mask': scalar dep}
        (plus whatever is already computed), so consecutive prefixes
        difference into per-stage costs. None = the full frame.
        ``compact_budget``: static per-trace override of
        self.compact_rotated (the adaptive ladder, frame() docstring);
        None = the constructor ceiling."""
        compact_eff = (self.compact_rotated if compact_budget is None
                       else compact_budget)
        params_g = self._cast(params_g)
        params_c = self._cast(params_c)
        image_g = self._cast(image_g)
        image_c = self._cast(image_c)
        feats_g = self.netG.apply(params_g, image_g, method="filter")
        feats_g = self._feats_f32(feats_g)
        if stage == "filter":
            return {"mask": feats_g[-1][-1].astype(jnp.float32).sum()}
        head_g = self._head_fn(self.netG, params_g)

        def query_occ(pts):
            pts = self._shard_points(pts)
            return self.netG.apply(params_g, feats_g, pts, calib,
                                   method="query", head_fn=head_g)[0]

        qt = (self._query_taps_fn(self.netG, params_g, feats_g, calib)
              if use_taps else None)
        qg = (self._query_grid_fn(self.netG, params_g, feats_g, calib)
              if (use_taps and use_grid) else None)
        # rotated frames: anchored ray query per refine level (exact ray
        # geometry, K-anchor feature lerp, K from the host-side plan);
        # the dense march stays per-point (full-volume tap spans)
        qa = None
        if not use_taps and rot_k:
            qa = [self._query_anchored_fn(self.netG, params_g, feats_g,
                                          calib, anchors=k)
                  if k else None for k in rot_k]
            if not any(qa):
                qa = None
        # the march pyramid runs on frontal taps-eligible frames (ray/grid
        # structured queries) AND — geometry is calib-agnostic, the march
        # axis is the view ray for any calib — on taps-ineligible frames
        # (rotated calib, or use_ray_query off) via the exact per-point
        # query when march_rotated is on. Frontal frames whose NET cannot
        # build the ray head (perspective / soft-onehot) keep the r2
        # hierarchy path, as before.
        march = self.march_levels and (
            (use_taps and qt is not None)
            or (not use_taps and self.march_rotated))
        compact_telem: list = []
        tex_state: list = []
        if march:
            # volume-free fast path: no hierarchy, no depth peel, no sdf
            from .recon.ray_refine import ray_pyramid
            resolution = self.fine_res
            vol, counts = None, []
            want_state = (self.tex_reuse_compact and not use_taps
                          and self.netC is not None
                          and params_c is not None)
            maps = ray_pyramid(query_occ, self.fine_res,
                               levels=self.march_levels, taps=self.ray_taps,
                               balance_value=self.recon.balance_value,
                               b_min=self.recon.b_min,
                               b_max=self.recon.b_max,
                               window=self.ray_window,
                               query_taps_fn=qt if use_taps else qa,
                               query_grid_fn=qg, march_taps=use_taps,
                               compact=(compact_eff
                                        if not use_taps else None),
                               telemetry=compact_telem,
                               compact_state=(tex_state if want_state
                                              else None))
        else:
            vol, counts = self.recon(query_occ, return_counts=True)
            if self.mode == "ray":
                from .recon.ray_refine import ray_refine
                resolution = self.fine_res
                maps = ray_refine(query_occ, vol, self.fine_res,
                                  taps=self.ray_taps,
                                  balance_value=self.recon.balance_value,
                                  b_min=self.recon.b_min,
                                  b_max=self.recon.b_max,
                                  direction=self.direction,
                                  window=self.ray_window,
                                  query_taps_fn=(qt if use_taps else
                                                 (qa[-1] if qa else None)),
                                  query_grid_fn=qg)
            else:
                resolution = self.recon.resolutions[-1]
                maps = depth_peel(vol, self.direction,
                                  self.recon.balance_value)
        if stage == "recon":
            return {"mask": maps.depth.sum()
                    + maps.valid.astype(jnp.float32).sum()}
        norm_canvas = shade_normal(maps)
        render_norm, mask = visualize(norm_canvas, self.render_size)
        out = {"depth": maps.depth, "valid": maps.valid,
               "render_norm": render_norm, "mask": mask}
        if stage == "shade":
            return out
        if vol is not None:
            out["sdf"] = vol
        if counts:
            # per-refine-level candidate counts (budget-overflow telemetry;
            # compare against self.recon.budgets[1:])
            out["recon_counts"] = jnp.stack(counts)

        if self.netC is not None and params_c is not None:
            feat_prior = feats_g[-1][-1]
            feats_c = self.netC.apply(params_c, image_c, feat_prior,
                                      method="filter")
            # per-point (rotated) texture may keep bf16 maps (tex_bf16
            # docstring): <=20k query points, far below the bf16
            # register-allocator crash threshold
            if not (self.tex_bf16 and not use_taps):
                feats_c = self._feats_f32(feats_c)
            if stage == "cfilter":
                out["mask"] = (mask.astype(jnp.float32).sum()
                               + feats_c[-1][-1].astype(jnp.float32).sum())
                return out
            # per-point color MLP: XLA head by default — the Pallas head
            # at the texture shape measured ~7.4 ms/frame of pure kernel
            # overhead (texture.pallas_head docstring; the widest r4
            # roofline gap closed by this one line)
            head_c = (self._head_fn(self.netC, params_c)
                      if self.tex_pallas_head else None)

            color_grid = (self._grid_color_fn(self.netC, params_c, feats_c,
                                              calib)
                          if (use_taps and use_grid) else None)
            if color_grid is not None:
                tex_canvas = self._texture_canvas(maps, resolution,
                                                  color_grid=color_grid)
            else:
                def query_color(pts):
                    pts = self._shard_points(pts)
                    return self.netC.apply(params_c, feats_c, pts, calib,
                                           method="query",
                                           head_fn=head_c)[0]

                tex_canvas = self._texture_canvas(
                    maps, resolution, query_color=query_color,
                    compact=(compact_eff if not use_taps
                             else None), telemetry=compact_telem,
                    reuse=tex_state[0] if tex_state else None)
            render_tex, mask_tex = visualize(tex_canvas, self.render_size)
            out.update({"render_tex": render_tex, "mask": mask_tex})
        if compact_telem:
            # dropped valid rays per compacted refine level (+ texture
            # window last, when texture runs compacted): nonzero means the
            # frame degraded those rays/pixels to the coarse silhouette —
            # graceful, but it must be observable (compact_report)
            out["compact_dropped"] = jnp.stack(compact_telem)
        return out

    def band_report(self, out) -> str:
        """Per-level candidate counts vs budgets from a frame's output dict
        (fetches recon_counts). Flags budget overflow — with
        select='uncertain' an overflow degrades gracefully (most-confident
        voxels dropped first), but it should still be visible, not silent."""
        import numpy as np

        if "recon_counts" not in out:
            return "recon band: no refine levels"
        counts = np.asarray(out["recon_counts"]).tolist()
        budgets = list(self.recon.budgets[1:])
        parts, overflow = [], False
        for res, c, b in zip(self.recon.resolutions[1:], counts, budgets):
            flag = ""
            if c > b:
                overflow = True
                flag = " OVERFLOW" if self.recon.select == "uncertain" \
                    else " OVERFLOW(TRUNCATED)"
            parts.append(f"{res}^3: {int(c)}/{b}{flag}")
        head = "recon band candidates/budget — "
        if overflow:
            head = ("recon band OVER BUDGET (raise recon.budgets or keep "
                    "select='uncertain' for graceful degradation) — ")
        return head + ", ".join(parts)

    def compact_report(self, out) -> str:
        """Dropped-ray counts of the rotated compaction budgets from a
        frame's output dict (fetches compact_dropped). Overflow degrades
        gracefully (dropped rays keep the coarse silhouette; dropped
        texture pixels keep the white background under the valid mask) —
        but a large/spread subject losing fine detail must be visible,
        not a green log (VERDICT r3 item 6)."""
        import numpy as np

        if "compact_dropped" not in out:
            return "compact: dense (no ray compaction in this frame)"
        dropped = np.asarray(out["compact_dropped"]).tolist()
        labels = [f"refine{rc}->{rf}" for rc, rf in self._refine_pairs()]
        if len(dropped) == len(labels) + 1:
            labels.append("texture")
        parts = [f"{lb}: {int(d)} dropped"
                 for lb, d in zip(labels, dropped)]
        if any(dropped):
            return ("compact OVERFLOW (raise compact_rotated or shrink the"
                    " subject window) — " + ", ".join(parts))
        return "compact budgets ok — " + ", ".join(parts)

    def compact_hint_from_valid(self, valid_fraction: float,
                                safety: float = 1.3) -> float:
        """Adaptive-budget hint from a PREVIOUS frame's fetched valid
        fraction (valid pixels / full fine lattice). Rescales to the
        texture/refine WINDOW the budgets are fractions of (every valid
        pixel lies inside the subject-bbox window) and adds headroom for
        inter-frame subject growth. Feed the result to
        frame(compact_hint=...); overflow, if the subject outgrows the
        headroom in one frame, degrades those rays to the coarse
        silhouette for that frame only and is counted in
        frame()['compact_dropped']."""
        w = self.ray_window or self.fine_res
        window_frac = (self.fine_res / float(w)) ** 2
        return float(valid_fraction) * window_frac * safety

    def frame(self, params_g: Any, image_g: jax.Array,
              params_c: Any = None, image_c: Optional[jax.Array] = None,
              calib: Optional[jax.Array] = None,
              compact_hint: Optional[float] = None):
        """Run one frame. images are NHWC [1, H, W, 3]; calib [1, 4, 4].

        The ray-structured fast path is selected per call from the calib:
        z-free image-plane rows (frontal pifu_calib) use it; a rotated
        view camera falls back to the exact per-point fine pass (one extra
        compile the first time each variant is hit).

        compact_hint: measured window-valid fraction from a previous
        frame (compact_hint_from_valid) — rotated frames snap it UP the
        COMPACT_LADDER and run that budget variant instead of the
        constructor ceiling (smaller = faster; output is bit-identical
        whenever nothing drops, and drops are counted). Ignored on
        frontal frames and when compaction is off."""
        if calib is None:
            calib = jnp.eye(4, dtype=jnp.float32)[None]
        use_taps = self._calib_taps_ok(calib)
        budget = None
        if (compact_hint is not None and not use_taps
                and self.compact_rotated is not None):
            budget = _snap_budget(compact_hint, self.compact_rotated)
            if budget == self.compact_rotated:
                budget = None        # ceiling variant = the default trace
        return self._frame(params_g, params_c, image_g, image_c, calib,
                           use_taps=use_taps,
                           use_grid=self._calib_grid_ok(calib),
                           rot_k=(() if use_taps else self._rot_anchor_plan(
                               calib, image_g.shape[1])),
                           compact_budget=budget)

    def _frames_call(self, params_g, params_c, images_g, images_c, calibs,
                     use_taps: bool, use_grid: bool, rot_k: tuple):
        """One vmapped jitted clip call for frames of a single calib
        class (jit cache keyed on the class + clip size)."""
        no_tex = images_c is None
        key = (no_tex, use_taps, use_grid, rot_k)
        if key not in self._frames_jit:
            fn = jax.vmap(
                functools.partial(self._frame_impl, use_taps=use_taps,
                                  use_grid=use_grid, rot_k=rot_k),
                in_axes=(None, None, 0, None if no_tex else 0, 0))
            self._frames_jit[key] = jax.jit(fn)
        return self._frames_jit[key](params_g, params_c, images_g,
                                     images_c, calibs)

    def frames(self, params_g: Any, images_g: jax.Array,
               params_c: Any = None, images_c: Optional[jax.Array] = None,
               calibs: Optional[jax.Array] = None):
        """Batched video mode (BASELINE config #4): process a [B, H, W, 3]
        clip in one vmapped program (per-frame recon states stay
        independent; throughput path for offline video).

        Mixed-calib clips are GROUPED per frame by their fast-path class
        (frontal grid / frontal taps / rotated with its anchor plan) and
        each group runs its own vmapped program — one rotated frame no
        longer drops the whole clip off the ray/grid fast path (r3 ran
        all-or-nothing; VERDICT r3 item 4). Outputs are reassembled in
        clip order; keys are the intersection across groups (a rotated
        group's compact telemetry is dropped when mixed with frontal)."""
        b = images_g.shape[0]
        if calibs is None:
            calibs = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None],
                              (b, 1, 1))
        images_g = images_g[:, None]                  # [B, 1, H, W, 3]
        images_c = None if images_c is None else images_c[:, None]
        calibs = calibs[:, None]                      # [B, 1, 4, 4]
        groups: dict[tuple, list] = {}
        for i in range(b):
            ci = calibs[i]
            ut = self._calib_taps_ok(ci)
            key = (ut, self._calib_grid_ok(ci),
                   () if ut else self._rot_anchor_plan(
                       ci, images_g.shape[-3]))
            groups.setdefault(key, []).append(i)
        if len(groups) == 1:
            (ut, ug, rk), _ = next(iter(groups.items()))
            return self._frames_call(params_g, params_c, images_g,
                                     images_c, calibs, ut, ug, rk)
        import logging
        logging.getLogger(__name__).debug(
            "frames(): mixed calibs — %d groups over %d frames (one "
            "program per group; each keeps its own fast path)",
            len(groups), b)
        outs = []
        for (ut, ug, rk), idx in groups.items():
            sel = jnp.asarray(idx)
            outs.append((sel, self._frames_call(
                params_g, params_c, images_g[sel],
                None if images_c is None else images_c[sel],
                calibs[sel], ut, ug, rk)))
        keys = set.intersection(*(set(o.keys()) for _, o in outs))
        result = {}
        for k in keys:
            buf = jnp.zeros((b,) + outs[0][1][k].shape[1:],
                            outs[0][1][k].dtype)
            for sel, o in outs:
                buf = buf.at[sel].set(o[k].astype(buf.dtype))
            result[k] = buf
        return result
