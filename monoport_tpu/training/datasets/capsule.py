"""On-device 3D capsule-human dataset — image + exact occupancy pairs.

Role: runnable flagship-model training with zero external data (the
reference's datasets point at private RenderPeople roots,
ppl_dynamic.py:46-47, unreachable here). A randomized articulated capsule
body is rendered orthographically by first-crossing ray march — so the
image and the 3D occupancy labels are exactly consistent — and occupancy
samples follow the reference's surface+uniform scheme
(ppl_dynamic.py:262-298). Everything is jnp and PRNG-keyed: batches are
generated INSIDE the jitted train step (zero host->device traffic, like
training/matting.py).

Shares the 2D skeleton of training/matting.py lifted to 3D: joints get
z offsets so limbs leave the z=0 plane and the occupancy field is
genuinely volumetric.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rot(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def skeleton3d(key, scale_range=(0.6, 1.0), pose_spread: float = 1.0,
               z_spread: float = 0.25):
    """Random humanoid -> capsules (a [K,3], b [K,3], r [K]) in [-1,1]^3.

    Defaults reproduce the r2 distribution exactly (committed-weight
    gates depend on it); the r3 "hard" curriculum widens scale_range,
    pose_spread and z_spread (VERDICT r2 item 2)."""
    ks = jax.random.split(key, 20)
    u = lambda k, lo, hi: jax.random.uniform(ks[k], (), minval=lo, maxval=hi)
    scale = u(0, *scale_range)
    pelvis = jnp.stack([u(1, -0.25, 0.25), u(2, -0.35, 0.0),
                        u(3, -0.15, 0.15)])
    lean = u(4, -0.2 * pose_spread, 0.2 * pose_spread)
    up2 = _rot(lean) @ jnp.array([0.0, 1.0])
    up = jnp.stack([up2[0], up2[1], 0.0])

    neck = pelvis + up * (0.52 * scale)
    head_c = neck + up * (0.16 * scale)
    torso_r = u(5, 0.13, 0.19) * scale
    head_r = u(6, 0.09, 0.12) * scale

    def limb(k0, root, base_angle, spread, l1, l2, r):
        spread = spread * pose_spread
        a1 = base_angle + u(k0, -spread, spread)
        a2 = a1 + u(k0 + 1, -0.8 * pose_spread, 0.8 * pose_spread)
        z1 = u(k0 + 2, -z_spread, z_spread)  # out-of-plane
        z2 = z1 + u(k0 + 3, -z_spread, z_spread)
        d1 = jnp.stack([jnp.cos(a1), jnp.sin(a1), z1])
        d2 = jnp.stack([jnp.cos(a2), jnp.sin(a2), z2])
        j1 = root + d1 / jnp.linalg.norm(d1) * (l1 * scale)
        j2 = j1 + d2 / jnp.linalg.norm(d2) * (l2 * scale)
        return [(root, j1, r * scale), (j1, j2, r * scale)]

    down = -jnp.pi / 2 + lean
    side = jnp.stack([up[1], -up[0], 0.0])
    segs = [(pelvis, neck, torso_r), (head_c, head_c, head_r)]
    segs += limb(7, neck - side * (0.10 * scale), down - 0.5, 0.9,
                 0.26, 0.24, 0.05)
    segs += limb(11, neck + side * (0.10 * scale), down + 0.5, 0.9,
                 0.26, 0.24, 0.05)
    segs += limb(15, pelvis - side * (0.07 * scale), down - 0.1, 0.3,
                 0.30, 0.30, 0.065)
    # reuse early keys with offsets for the second leg (20-key budget)
    a1 = down + 0.1 + u(19, -0.3, 0.3)
    d1 = jnp.stack([jnp.cos(a1), jnp.sin(a1), u(18, -0.25, 0.25)])
    j1 = pelvis + side * (0.07 * scale) + d1 / jnp.linalg.norm(d1) * (
        0.30 * scale)
    j2 = j1 + jnp.stack([jnp.cos(a1 + 0.2), jnp.sin(a1 + 0.2),
                         u(17, -0.25, 0.25)]) * (0.30 * scale)
    segs += [(pelvis + side * (0.07 * scale), j1, 0.065 * scale),
             (j1, j2, 0.065 * scale)]

    a = jnp.stack([s[0] for s in segs])
    b = jnp.stack([s[1] for s in segs])
    r = jnp.stack([s[2] for s in segs])
    return a, b, r


def capsule_occupancy(pts, caps, sharpness: float = 200.0):
    """[..., 3] points x capsules -> soft occupancy in [0, 1].

    ``caps`` is (a, b, r) or the clothed 4-tuple from ``clothe`` — the
    4th element (amp, freq, phase) modulates each capsule's radius along
    its axis, giving cloth-fold-like surface displacement while image and
    labels stay exactly consistent (both come from this function)."""
    a, b, r = caps[0], caps[1], caps[2]
    p = pts[..., None, :] - a                       # [..., K, 3]
    ab = b - a                                      # [K, 3]
    denom = jnp.maximum((ab * ab).sum(-1), 1e-9)
    t = jnp.clip((p * ab).sum(-1) / denom, 0.0, 1.0)
    r_eff = r
    if len(caps) == 4:
        amp, freq, phase = caps[3]
        r_eff = r * (1.0 + amp * jnp.sin(freq * t + phase))
    d = jnp.linalg.norm(p - t[..., None] * ab[None], axis=-1) - r_eff
    return jax.nn.sigmoid(-d.min(axis=-1) * sharpness)


def clothe(key, caps, amp=(0.0, 0.30)):
    """Attach random radial displacement (clothing folds) to a skeleton:
    per-capsule relative amplitude in ``amp``, frequency 4-14 rad along
    the axis, random phase."""
    a, b, r = caps
    k1, k2, k3 = jax.random.split(key, 3)
    k_caps = r.shape[0]
    amp_v = jax.random.uniform(k1, (k_caps,), minval=amp[0], maxval=amp[1])
    freq = jax.random.uniform(k2, (k_caps,), minval=4.0, maxval=14.0)
    phase = jax.random.uniform(k3, (k_caps,), minval=0.0,
                               maxval=2.0 * jnp.pi)
    return (a, b, r, (amp_v, freq, phase))


_DEFAULT_BASE = (0.8, 0.65, 0.55)


def _shade(z):
    """Depth-cue shading used by both the render and the color labels."""
    return 0.35 + 0.65 * (z + 1.0) / 2.0


def sample_appearance(key):
    """Random body appearance: base color + a world-(x, y) sinusoidal
    texture pattern (amp can be ~0, so the plain default look stays in
    distribution). Consumed by render_front AND surface_color so netC's
    target stays consistent with its input view."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "base": jax.random.uniform(k1, (3,), minval=0.35, maxval=0.9),
        "amp": jax.random.uniform(k2, (), minval=0.0, maxval=0.3),
        "freq": jax.random.uniform(k3, (2,), minval=3.0, maxval=15.0),
        "phase": jax.random.uniform(k4, (2,), minval=0.0,
                                    maxval=2.0 * jnp.pi),
    }


def _pattern(xy, app):
    """Multiplicative texture over world (x, y) (front-view ortho: image
    position == world position, so the pattern is view-consistent)."""
    if app is None:
        return 1.0
    return 1.0 + app["amp"] * (
        jnp.sin(xy[..., 0:1] * app["freq"][0] + app["phase"][0])
        * jnp.sin(xy[..., 1:2] * app["freq"][1] + app["phase"][1]))


def render_front_occ(occ_fn, size: int, n_march: int = 48, base_color=None,
                     appearance=None, flat: bool = False):
    """Orthographic front render of ANY soft-occupancy field by
    first-crossing ray march along z (shared by the capsule and
    superquadric families so eval inputs stay in the netG contract).

    ``flat=True`` skips the depth-cue shading — a constant-color
    silhouette like the PPL fixture renders (fixture.py _render_rgba) —
    used by the shading-free appearance slice of the mixed curriculum.

    Returns (image [S,S,3] normalized to [-1,1] with bg=0 after masking —
    the netG input contract, RTL/main.py:353-358 — and mask [S,S])."""
    base = jnp.asarray(base_color if base_color is not None
                       else (appearance["base"] if appearance is not None
                             else _DEFAULT_BASE))
    ax = jnp.linspace(-1.0, 1.0, size)
    xx, yy = jnp.meshgrid(ax, -ax)                   # row 0 = top (+y)
    zs = jnp.linspace(1.0, -1.0, n_march)

    def probe(z):
        pts = jnp.stack([xx, yy, jnp.full_like(xx, z)], -1)
        return occ_fn(pts) > 0.5                     # [S, S]

    occ = jax.vmap(probe)(zs)                        # [M, S, S]
    hit = occ.any(axis=0)
    first = jnp.argmax(occ, axis=0)                  # first crossing index
    depth = zs[first]                                # + = near
    # ``flat`` may be a traced bool (per-item curriculum mixing)
    shade = jnp.where(hit, jnp.where(jnp.asarray(flat), 1.0, _shade(depth)),
                      0.0)
    pat = _pattern(jnp.stack([xx, yy], -1), appearance)
    image = jnp.clip(shade[..., None] * base * pat, 0.0, 1.0) * 2.0 - 1.0
    return image * hit[..., None], hit.astype(jnp.float32)


def render_front(caps, size: int, n_march: int = 48, base_color=None,
                 appearance=None, flat: bool = False):
    """Capsule-body front render (render_front_occ over capsule_occupancy)."""
    return render_front_occ(lambda pts: capsule_occupancy(pts, caps),
                            size, n_march=n_march, base_color=base_color,
                            appearance=appearance, flat=flat)


def surface_color(pts, base_color=None, appearance=None, flat=False):
    """Ground-truth surface color at [..., 3] points, normalized [-1, 1]
    (the same shading model render_front painted into the image — netC's
    learning target is consistent with its input view). ``flat`` (may be
    a traced bool, per-item curriculum mixing) drops the depth cue to
    match a render_front_occ(flat=True) input — base * pattern only."""
    base = jnp.asarray(base_color if base_color is not None
                       else (appearance["base"] if appearance is not None
                             else _DEFAULT_BASE))
    pat = _pattern(pts[..., :2], appearance)
    shade = jnp.where(jnp.asarray(flat), 1.0, _shade(pts[..., 2:3]))
    return jnp.clip(shade * base * pat, 0.0, 1.0) * 2.0 - 1.0


def sample_surface_points(key, caps, n: int):
    """n points ON the capsule surfaces (color supervision sites)."""
    a, b, r = caps[0], caps[1], caps[2]
    k1, k2, k3 = jax.random.split(key, 3)
    seg = jax.random.randint(k1, (n,), 0, a.shape[0])
    t = jax.random.uniform(k2, (n, 1))
    on_axis = a[seg] + t * (b[seg] - a[seg])
    noise = jax.random.normal(k3, (n, 3))
    dirs = noise / jnp.maximum(
        jnp.linalg.norm(noise, axis=-1, keepdims=True), 1e-9)
    return on_axis + dirs * r[seg][:, None]


def sample_points(key, caps, n: int, sigma: float = 0.05):
    """Surface+uniform sampling, 50/50 in/out rebalanced in expectation
    (ppl_dynamic.py:262-298 scheme, without host-side rejection)."""
    a, b, r = caps[0], caps[1], caps[2]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_surf = (n * 4) // 5
    seg = jax.random.randint(k1, (n_surf,), 0, a.shape[0])
    t = jax.random.uniform(k2, (n_surf, 1))
    on_axis = a[seg] + t * (b[seg] - a[seg])
    noise = jax.random.normal(k3, (n_surf, 3))
    # points at the surface +- gaussian sigma (half in, half out)
    dirs = noise / jnp.maximum(
        jnp.linalg.norm(noise, axis=-1, keepdims=True), 1e-9)
    radial = jax.random.normal(k4, (n_surf, 1)) * sigma
    surf = on_axis + dirs * (r[seg][:, None] + radial)
    unif = jax.random.uniform(jax.random.fold_in(key, 7), (n - n_surf, 3),
                              minval=-1.0, maxval=1.0)
    pts = jnp.concatenate([surf, unif], axis=0)
    labels = (capsule_occupancy(pts, caps) > 0.5).astype(jnp.float32)
    return pts, labels[:, None]


def gt_texture_canvas(depth, valid, resolution: int, base_color=None,
                      appearance=None, flat: bool = False):
    """Ground-truth texture canvas for an engine ray-map pair: GT surface
    colors (the shading model render_front painted) evaluated at the
    reconstructed surface points, white background — directly comparable
    to the engine's tex canvas/render_tex. Voxel->world mapping matches
    depth_peel.surface_world_points (RTL/main.py:204-210).

    ``flat``: the render was shading-free (render_front_occ flat=True), so
    the GT surface color drops the depth cue too — base * pattern only.
    Shared by every family that renders through render_front_occ (capsule
    AND superquadric), which is what makes the cross-family texture PSNR
    well-defined."""
    r = resolution
    sr = 2.0 / r
    a = jnp.arange(r, dtype=jnp.float32) * sr - 1.0
    pts = jnp.stack([jnp.broadcast_to(a[:, None], (r, r)),
                     jnp.broadcast_to(a[None, :], (r, r)),
                     (float(r) - depth) * sr - 1.0], -1)
    gt = surface_color(pts, base_color, appearance, flat=flat) * 0.5 + 0.5
    return jnp.where(valid[..., None], gt, 1.0)


def synth_item(key, size: int, n_points: int, hard: bool = False,
               sigma: float | None = None, flat_prob: float = 0.0):
    """-> dict(image [S,S,3], points [N,3], labels [N,1], calib [4,4]).

    hard=True: the r3 curriculum — wider scales (0.45-1.0), harder poses,
    more out-of-plane motion, clothing-like radial displacement and
    textured/tinted appearance (VERDICT r2 item 2). The plain default
    look stays inside this distribution (amp ranges include ~0).
    sigma: override the surface-sample sigma (None keeps the per-mode
    default — the r3-decisive quality lever, DESIGN.md).
    flat_prob: fraction rendered WITHOUT depth shading (flat silhouette,
    the PPL-fixture look) — the r4 cross-family curriculum slice."""
    k_skel, k_pts, k_cloth, k_app, k_flat = jax.random.split(key, 5)
    if hard:
        caps = skeleton3d(k_skel, scale_range=(0.45, 1.0),
                          pose_spread=1.35, z_spread=0.35)
        caps = clothe(k_cloth, caps, amp=(0.0, 0.30))
        app = sample_appearance(k_app)
        # tighter surface sigma concentrates supervision at the boundary
        # (the silhouette is where IOU is won; +-0.035 = +-4.5 fine voxels)
        sigma = 0.035 if sigma is None else sigma
    else:
        caps = skeleton3d(k_skel)
        app = None
        sigma = 0.05 if sigma is None else sigma
    flat = (jax.random.uniform(k_flat, ()) < flat_prob) \
        if flat_prob > 0 else False
    image, mask = render_front(caps, size, appearance=app, flat=flat)
    pts, labels = sample_points(k_pts, caps, n_points, sigma=sigma)
    return {"image": image, "points": pts, "labels": labels,
            "calib": jnp.eye(4, dtype=jnp.float32)}


def synth_train_batch(key, batch: int, size: int, n_points: int,
                      hard: bool = False, sigma: float | None = None):
    """Train-step batch dict (images/points/calibs/labels), all on-device."""
    items = jax.vmap(functools.partial(
        synth_item, size=size, n_points=n_points, hard=hard, sigma=sigma))(
            jax.random.split(key, batch))
    return {"images": items["image"], "points": items["points"],
            "calibs": items["calib"], "labels": items["labels"]}
