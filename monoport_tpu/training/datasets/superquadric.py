"""Superquadric-limb human bodies — a procedural family DISJOINT from the
capsule generator, for cross-family generalization eval (and optional
training mix).

Role: the reference demos pretrained PIFu checkpoints on real people
(/root/reference/README.md:44-51); with zero egress the committed weights
train on the capsule family (capsule.py), so quality numbers measured on
held-out capsule SEEDS say nothing about bodies outside that family. This
module provides analytic bodies the capsule generator CANNOT emit — boxy
cross-sections, flat end-caps, anisotropic limbs (superquadric exponents
e != 1) — with exact occupancy for free ground truth, mirroring the
reference's demo-generality requirement as an eval probe.

A body reuses the humanoid SKELETON of capsule.skeleton3d (segment
endpoints + radii: pose plausibility is shared) but replaces every
capsule with a superquadric: the standard implicit
    F = ((|x/ax|^(2/e2) + |y/ay|^(2/e2))^(e2/e1) + |z/az|^(2/e1)) <= 1
in the segment's local frame (z along the bone). e2 < 1 squares the
cross-section, e1 < 1 flattens the end-caps (cylinder/box-like limbs) —
local surface geometry no min-over-capsules distance field can produce.

Everything is jnp and PRNG-keyed like capsule.py, so the family drops
into the same on-device training/eval plumbing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .capsule import (render_front_occ, sample_appearance, skeleton3d,
                      surface_color)


def sq_body(key, scale_range=(0.5, 1.0), pose_spread: float = 1.2,
            z_spread: float = 0.3, e_range=(0.4, 1.6),
            aniso_range=(0.7, 1.4)):
    """Random superquadric humanoid -> parameter dict.

    Keys: a/b [K,3] segment endpoints, r [K] base radii (from
    skeleton3d), e1/e2 [K] superquadric exponents, aniso [K] cross-
    section x/y anisotropy, elong [K] end-cap extension of the bone
    half-length."""
    k_skel, k_e1, k_e2, k_an, k_el = jax.random.split(key, 5)
    a, b, r = skeleton3d(k_skel, scale_range=scale_range,
                         pose_spread=pose_spread, z_spread=z_spread)
    n = r.shape[0]
    u = lambda k, lo, hi: jax.random.uniform(k, (n,), minval=lo, maxval=hi)
    return {"a": a, "b": b, "r": r,
            "e1": u(k_e1, *e_range), "e2": u(k_e2, *e_range),
            "aniso": u(k_an, *aniso_range),
            "elong": u(k_el, 1.0, 1.25)}


def _frames(body):
    """Per-segment orthonormal frames (t1, t2, w) and half-axes."""
    a, b, r = body["a"], body["b"], body["r"]
    ab = b - a
    length = jnp.linalg.norm(ab, axis=-1, keepdims=True)     # [K, 1]
    w = ab / jnp.maximum(length, 1e-9)
    # degenerate (point) segments — the head — get a vertical axis
    w = jnp.where(length > 1e-6, w, jnp.array([0.0, 1.0, 0.0]))
    up = jnp.where(jnp.abs(w[..., 2:3]) < 0.9,
                   jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    t1 = jnp.cross(w, up)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(w, t1)
    half = length[..., 0] / 2.0
    ax = r * body["aniso"]
    ay = r / jnp.sqrt(body["aniso"])
    az = half * body["elong"] + r
    return t1, t2, w, ax, ay, az


def sq_occupancy(pts, body, sharpness: float = 12.0):
    """[..., 3] points x superquadric segments -> soft occupancy [0, 1].

    Union over segments via min of the implicit F; the 0.5 level set is
    exactly the analytic surface (F = 1), so thresholded labels are exact
    GT like capsule_occupancy's."""
    t1, t2, w, ax, ay, az = _frames(body)
    c = (body["a"] + body["b"]) / 2.0                        # [K, 3]
    p = pts[..., None, :] - c                                # [..., K, 3]
    x = jnp.abs((p * t1).sum(-1)) / ax + 1e-9
    y = jnp.abs((p * t2).sum(-1)) / ay + 1e-9
    z = jnp.abs((p * w).sum(-1)) / az + 1e-9
    e1, e2 = body["e1"], body["e2"]
    f = (x ** (2.0 / e2) + y ** (2.0 / e2)) ** (e2 / e1) + z ** (2.0 / e1)
    return jax.nn.sigmoid((1.0 - f.min(axis=-1)) * sharpness)


def render_front(body, size: int, n_march: int = 48, base_color=None,
                 appearance=None, flat: bool = False):
    """Front render of a superquadric body (netG input contract)."""
    return render_front_occ(lambda pts: sq_occupancy(pts, body), size,
                            n_march=n_march, base_color=base_color,
                            appearance=appearance, flat=flat)


def sample_surface_points(key, body, n: int):
    """n points ON the body surface (netC color-supervision sites, the
    capsule.sample_surface_points contract): walk from a random axis
    point along a random direction to the F=1 crossing by bisection
    (exact to ~1e-3)."""
    k_dir, k_seg, k_t = jax.random.split(key, 3)
    a, b = body["a"], body["b"]
    seg = jax.random.randint(k_seg, (n,), 0, body["r"].shape[0])
    t = jax.random.uniform(k_t, (n, 1))
    on_axis = a[seg] + t * (b[seg] - a[seg])
    d = jax.random.normal(k_dir, (n, 3))
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)

    def occ_at(s):
        return sq_occupancy(on_axis + s[:, None] * d, body)

    lo = jnp.zeros((n,))
    hi = jnp.full((n,), 1.0)

    def bisect(_, carry):
        lo, hi = carry
        mid = (lo + hi) / 2.0
        ins = occ_at(mid) > 0.5
        return jnp.where(ins, mid, lo), jnp.where(ins, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 18, bisect, (lo, hi))
    return on_axis + ((lo + hi) / 2.0)[:, None] * d


def sample_points(key, body, n: int, sigma: float = 0.035):
    """Surface+uniform occupancy samples (the ppl_dynamic.py:262-298
    scheme capsule.sample_points follows): 4/5 near-surface via radial
    perturbation of ray-cast boundary points, 1/5 uniform."""
    k_surf, k_rad, k_uni = jax.random.split(key, 3)
    n_surf = (n * 4) // 5
    surf = sample_surface_points(k_surf, body, n_surf)
    surf = surf + jax.random.normal(k_rad, (n_surf, 3)) * sigma
    unif = jax.random.uniform(k_uni, (n - n_surf, 3), minval=-1.0,
                              maxval=1.0)
    pts = jnp.concatenate([surf, unif], axis=0)
    labels = (sq_occupancy(pts, body) > 0.5).astype(jnp.float32)
    return pts, labels[:, None]


def synth_item(key, size: int, n_points: int, sigma: float = 0.035,
               flat_prob: float = 0.25):
    """One training item from the superquadric family (same dict contract
    as capsule.synth_item). A ``flat_prob`` slice renders WITHOUT depth
    shading (the PPL-fixture look) so the model cannot rely on the
    capsule renderer's shading cue."""
    k_body, k_pts, k_app, k_flat = jax.random.split(key, 4)
    body = sq_body(k_body)
    app = sample_appearance(k_app)
    flat = jax.random.uniform(k_flat, ()) < flat_prob   # traced per item
    image, _ = render_front(body, size, appearance=app, flat=flat)
    pts, labels = sample_points(k_pts, body, n_points, sigma=sigma)
    return {"image": image, "points": pts, "labels": labels,
            "calib": jnp.eye(4, dtype=jnp.float32)}


def synth_train_batch(key, batch: int, size: int, n_points: int,
                      sigma: float = 0.035, flat_prob: float = 0.25):
    """Train-step batch dict, all on-device (capsule contract)."""
    items = jax.vmap(functools.partial(
        synth_item, size=size, n_points=n_points, sigma=sigma,
        flat_prob=flat_prob))(jax.random.split(key, batch))
    return {"images": items["image"], "points": items["points"],
            "calibs": items["calib"], "labels": items["labels"]}


def mixed_train_batch(key, batch: int, size: int, n_points: int,
                      sigma: float | None = None, flat_prob: float = 0.15):
    """Cross-family curriculum batch: a static half/half split of
    hard-curriculum capsules and superquadric bodies (both with a
    ``flat_prob`` shading-free slice), so one jitted step trains on both
    families with no per-item branching. Same batch-dict contract as
    capsule.synth_train_batch."""
    from .capsule import synth_item as capsule_item
    k_caps, k_sq = jax.random.split(key)
    n_caps = max(1, batch // 2)
    n_sq = batch - n_caps
    items = jax.vmap(functools.partial(
        capsule_item, size=size, n_points=n_points, hard=True, sigma=sigma,
        flat_prob=flat_prob))(jax.random.split(k_caps, n_caps))
    out = {"images": items["image"], "points": items["points"],
           "calibs": items["calib"], "labels": items["labels"]}
    if n_sq:
        sq_items = jax.vmap(functools.partial(
            synth_item, size=size, n_points=n_points,
            sigma=sigma if sigma is not None else 0.035,
            flat_prob=flat_prob))(jax.random.split(k_sq, n_sq))
        sq_out = {"images": sq_items["image"], "points": sq_items["points"],
                  "calibs": sq_items["calib"], "labels": sq_items["labels"]}
        out = {k: jnp.concatenate([out[k], sq_out[k]], axis=0)
               for k in out}
    return out
