"""Generate the committed floor prop (monoport_tpu/data/floor/):
a plank-grid OBJ + procedural wood-grain JPG, consumed by
pipeline/scene.load_floor exactly like the reference's OBJ+JPG floor sets
(RTL/scene.py:20-43; the reference ships five such sets under RTL/floor/).

Run once: python scripts/make_floor_prop.py
The outputs are small (a few KB OBJ, ~60 KB JPG) and checked in.
"""

import os

import numpy as np


def wood_texture(size: int = 512, seed: int = 7) -> np.ndarray:
    """Procedural wood planks: grain stripes + knots + per-plank tint."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    planks = 6
    plank_id = np.floor(y * planks).astype(int)
    # per-plank base tint around a warm brown
    base = np.asarray([0.55, 0.38, 0.24])
    tint = 1.0 + 0.12 * rng.randn(planks, 1)[plank_id, 0][..., None]
    # grain: layered sines along x, phase-shifted per plank, plus noise
    phase = rng.uniform(0, 10, planks)[plank_id]
    grain = (0.5 * np.sin(x * 80 + phase + 3 * y)
             + 0.3 * np.sin(x * 190 + 2 * phase)
             + 0.2 * rng.randn(size, size))
    shade = 1.0 + 0.10 * grain
    # dark seams between planks
    fy = y * planks - np.floor(y * planks)
    seam = np.minimum(fy, 1 - fy)
    shade *= np.clip(seam * 30, 0.55, 1.0)
    img = np.clip(base * tint * shade[..., None], 0.0, 1.0)
    return (img * 255).astype(np.uint8)


def plank_obj(path: str, planks: int = 6, span_cm: float = 150.0):
    """OBJ plank grid in the x-y plane spanning ~span_cm (load_floor
    swaps y<->z and rescales by /150, RTL/scene.py semantics)."""
    lines = ["# monoport_tpu floor prop (generated)"]
    s = span_cm / 2
    n_v = 0
    faces = []
    for p in range(planks):
        y0 = -s + p / planks * span_cm
        y1 = -s + (p + 1) / planks * span_cm
        v0 = p / planks
        v1 = (p + 1) / planks
        # small per-plank height jitter gives the z-buffer real work
        z = 0.3 * np.sin(p * 2.1)
        for (vx, vy) in ((-s, y0), (s, y0), (s, y1), (-s, y1)):
            lines.append(f"v {vx:.3f} {vy:.3f} {z:.3f}")
        for (u, v) in ((0, v0), (1, v0), (1, v1), (0, v1)):
            lines.append(f"vt {u:.4f} {v:.4f}")
        a = n_v + 1
        faces.append(f"f {a}/{a} {a+1}/{a+1} {a+2}/{a+2}")
        faces.append(f"f {a}/{a} {a+2}/{a+2} {a+3}/{a+3}")
        n_v += 4
    lines += faces
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    from PIL import Image

    out = os.path.join(os.path.dirname(__file__), os.pardir,
                       "monoport_tpu", "data", "floor")
    os.makedirs(out, exist_ok=True)
    plank_obj(os.path.join(out, "floor.obj"))
    Image.fromarray(wood_texture()).save(
        os.path.join(out, "floor.jpg"), quality=85)
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
