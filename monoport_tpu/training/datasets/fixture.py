"""Miniature RenderPeople/PIFu fixture trees for the PPL datasets.

Generates, from an analytic ellipsoid "person", a tree in exactly the
layout `PPLDynamicDataset` (reference monoport/lib/dataset/ppl_dynamic.py:
214-260 path scheme) and `PPLStaticDataset` (ppl_static.py RENDER/MASK/
PARAM/SAMPLE layout) expect — calib txts, RGBA renders, occupancy sample
files, skeleton/center/scale sidecars, an OBJ mesh — so the dataset code
paths (sanity check, aug/flip calib math, 4N:N/4 sampling, retry) can run
end-to-end in CI and in `apps/train.py --dataset ppl_dynamic` smoke runs
without the (environment-unavailable) RenderPeople data.

Geometry is CONSISTENT: the rendered silhouette is the calib-projection of
the analytic ellipsoid, so projecting the generated occupancy samples with
the loaded (augmented/flipped) calib lands inside the rendered mask — the
invariant the tests assert.
"""

from __future__ import annotations

import os

import numpy as np

# analytic "person": ellipsoid at the origin, ~1.6 units tall like the
# reference's world-scale subjects
RADII = (0.30, 0.80, 0.25)
SIZE = 512


def _rotate_y(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    m = np.eye(4)
    m[0, 0], m[0, 2] = c, s
    m[2, 0], m[2, 2] = -s, c
    return m


def inside(points: np.ndarray) -> np.ndarray:
    """[N, 3] -> bool occupancy of the analytic ellipsoid."""
    return (np.square(points / np.asarray(RADII)).sum(-1) <= 1.0)


def _render_rgba(rotation: float, size: int = SIZE):
    """Silhouette of the rotated ellipsoid under the ortho calib below."""
    from PIL import Image, ImageDraw

    rx, ry, rz = RADII
    r = np.deg2rad(rotation)
    # x-extent of the y-rotated ellipsoid's projection
    rx_proj = float(np.hypot(rx * np.cos(r), rz * np.sin(r)))
    img = Image.new("RGBA", (size, size), (0, 0, 0, 0))
    draw = ImageDraw.Draw(img)
    cx = cy = size / 2
    a = rx_proj * size / 2
    b = ry * size / 2
    draw.ellipse([cx - a, cy - b, cx + a, cy + b],
                 fill=(90, 140, 200, 255))
    return img


def _sample_arrays(rng: np.random.RandomState, n: int, sigma: float):
    """-> (surface [n,4], uniform [n,4]) sample files' contents: xyz plus
    inside flag (the 4th column consumed by balance_in_out)."""
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
    surf = d * np.asarray(RADII) + rng.randn(n, 3) * sigma
    uni = rng.uniform(-1.0, 1.0, (n, 3))
    pack = lambda p: np.concatenate(
        [p, inside(p)[:, None].astype(np.float64)], -1).astype(np.float32)
    return pack(surf), pack(uni)


def _write_obj(path: str):
    with open(path, "w") as f:
        f.write("v 0 0.8 0\nv 0.3 -0.8 0\nv -0.3 -0.8 0\nf 1 2 3\n")


def make_dynamic_fixture(root: str, subjects=("subj_a", "subj_b"),
                         rotations=(0, 120, 240), sigma_geo: float = 0.05,
                         n_points: int = 400, seed: int = 0,
                         broken: bool = True) -> dict:
    """Emit a PPLDynamicDataset tree under ``root``.

    Each subject gets one action/frame with renders+calibs for
    ``rotations``, 100 surface + 100 uniform sample files (the dataset
    draws file index randint(0, 99), ppl_dynamic.py:267-273), skeleton/
    center/scale sidecars and a poisson mesh. With ``broken`` three
    defective motions are added that the startup sanity check
    (ppl_dynamic.py:181-212 semantics) must prune: missing files, a
    head-below-hip skeleton, and an out-of-frustum skeleton.

    Returns {"good": [motion dirs], "broken": [motion dirs]}.
    """
    rng = np.random.RandomState(seed)
    good, bad = [], []

    def motion_dir(subject, action="walk", frame=0):
        return os.path.join(root, subject, action, f"{frame:06d}")

    def write_motion(mdir, head_y=0.78, skel_x=0.0, skip=()):
        os.makedirs(os.path.join(mdir, "render"), exist_ok=True)
        os.makedirs(os.path.join(mdir, "calib"), exist_ok=True)
        for rot in rotations:
            if "render" not in skip:
                _render_rgba(rot).save(
                    os.path.join(mdir, "render", f"{rot:03d}.png"))
            extrinsic = _rotate_y(rot)
            intrinsic = np.diag([1.0, -1.0, 1.0, 1.0])
            np.savetxt(os.path.join(mdir, "calib", f"{rot:03d}.txt"),
                       np.concatenate([extrinsic, intrinsic], 0))
        if "mesh" not in skip:
            _write_obj(os.path.join(mdir, "mesh_poisson.obj"))
        np.savetxt(os.path.join(mdir, "center.txt"), np.zeros(3))
        np.savetxt(os.path.join(mdir, "scale.txt"),
                   np.asarray([0.6, 1.6]))  # [width, height] world units
        # skeleton: "name x y z" rows in cm (loader divides by 100,
        # ppl_dynamic.py:190); row 1 = hip, row 6 = head
        ys = [0.0, 0.0, 0.2, 0.4, 0.5, 0.6, head_y]
        with open(os.path.join(mdir, "skeleton.txt"), "w") as f:
            for i, y in enumerate(ys):
                f.write(f"j{i} {skel_x * 100:.1f} {y * 100:.1f} 0.0\n")
        if "samples" not in skip:
            sdir = os.path.join(mdir, f"samples_{sigma_geo:.2f}_v3")
            os.makedirs(sdir, exist_ok=True)
            for i in range(100):
                surf, uni = _sample_arrays(rng, n_points, sigma_geo)
                np.save(os.path.join(sdir, f"surface_{i}.npy"), surf)
                np.save(os.path.join(sdir, f"uniform_{i}.npy"), uni)

    for subject in subjects:
        mdir = motion_dir(subject)
        write_motion(mdir)
        good.append(mdir)

    if broken:
        m = motion_dir("broken_missing")
        write_motion(m, skip=("mesh",))          # mesh_poisson.obj absent
        bad.append(m)
        m = motion_dir("broken_skel")
        write_motion(m, head_y=-0.5)             # head below hip
        bad.append(m)
        m = motion_dir("broken_frustum")
        write_motion(m, skel_x=5.0)              # projects outside [-1, 1]
        bad.append(m)
    return {"good": good, "broken": bad}


def make_static_fixture(root: str, subjects=("stat_a", "stat_b"),
                        rotations=(0, 120, 240), sigma_geo: float = 0.05,
                        n_points: int = 400, seed: int = 1,
                        ortho_ratio: float = 0.9, scale: float = 180.0
                        ) -> dict:
    """Emit a PPLStaticDataset (PIFu-format) tree under ``root``:
    RENDER/<s>/<rot>_0_00.jpg + MASK pngs + PARAM npy dicts
    (ortho_ratio/scale/center/R, ppl_static.py:10-39) + SAMPLE files."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    ndc = scale / ortho_ratio / (SIZE // 2)   # world -> NDC coefficient
    for subject in subjects:
        for sub in ("RENDER", "MASK", "PARAM"):
            os.makedirs(os.path.join(root, sub, subject), exist_ok=True)
        sdir = os.path.join(root, f"SAMPLE_{sigma_geo:.2f}", subject)
        os.makedirs(sdir, exist_ok=True)
        for rot in rotations:
            rgba = _render_rgba(rot)
            # static projection differs from dynamic only by the ndc
            # coefficient: rescale the silhouette accordingly
            w = max(2, int(round(SIZE * ndc)))
            scaled = rgba.resize((w, w), Image.BILINEAR)
            canvas = Image.new("RGBA", (SIZE, SIZE), (0, 0, 0, 0))
            canvas.paste(scaled, ((SIZE - w) // 2, (SIZE - w) // 2))
            canvas.convert("RGB").save(
                os.path.join(root, "RENDER", subject, f"{rot}_0_00.jpg"))
            canvas.split()[-1].save(
                os.path.join(root, "MASK", subject, f"{rot}_0_00.png"))
            param = {"ortho_ratio": ortho_ratio, "scale": scale,
                     "center": np.zeros(3),
                     "R": _rotate_y(rot)[:3, :3]}
            np.save(os.path.join(root, "PARAM", subject, f"{rot}_0_00.npy"),
                    param, allow_pickle=True)
        for i in range(5):
            surf, uni = _sample_arrays(rng, n_points, sigma_geo)
            np.save(os.path.join(sdir, f"samples_{i}.npy"),
                    np.concatenate([surf, uni], 0))
    return {"ndc": ndc}
