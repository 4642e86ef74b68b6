"""Per-stage roofline accounting (VERDICT r3 item 2): FLOPs and HBM bytes
of the production frame program, stage by stage, from XLA's own cost model
(CPU lowering; dots/convs are platform-independent algebra).

Consecutive stage PREFIXES of engine._frame_impl (stage='filter' |
'recon' | 'shade' | 'cfilter' | full) are lowered and differenced, for the
frontal grid program and the rotated anchored program. Combine the
per-stage GFLOP / GB with a measured stage ledger (scripts/
profile_stages_r3.py, profile_stages_rot.py) to get achieved TFLOP/s,
achieved GB/s, and the binding resource per stage against the v5e roofline
(197 bf16 TFLOP/s peak, 819 GB/s HBM -> ridge ~240 FLOP/B). The summary
table lives in DESIGN.md.

Run (CPU, ~5-10 min of lowering/compiling):
    python scripts/roofline_stages.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from monoport_tpu import get_cfg_defaults  # noqa: E402
from monoport_tpu.engine import EngineCfg, ReconEngine  # noqa: E402
from monoport_tpu.models import MonoPortNet  # noqa: E402
from monoport_tpu.recon.calib import pifu_calib  # noqa: E402
from monoport_tpu.recon.hierarchy import HierarchicalRecon  # noqa: E402
from monoport_tpu.render.camera import orbit_extrinsic  # noqa: E402
from monoport_tpu.utils.params_io import load_params  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), os.pardir, "monoport_tpu",
                    "data")
STAGES = ["filter", "recon", "shade", "cfilter", None]


def _cost(fn, *args) -> dict:
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return {"gflops": float(ca.get("flops", 0.0)) / 1e9,
            "gbytes": float(ca.get("bytes accessed", 0.0)) / 1e9}


def main():
    t0 = time.time()
    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    netC = MonoPortNet(cfg.netC)
    params_g = {"params": load_params(
        os.path.join(DATA, "netg_capsule.npz"))[0]}
    params_c = {"params": load_params(
        os.path.join(DATA, "netc_capsule.npz"))[0]}
    recon = HierarchicalRecon(resolutions=(17, 33, 65),
                              budgets=(0, 4096, 16384), select="uncertain")
    # production shapes/dtypes, XLA heads (identical arithmetic to the
    # Pallas kernels; pallas_call does not lower on CPU)
    engine = ReconEngine(netG, netC, recon=recon,
                 config=EngineCfg.flat(mode="ray", fine_res=257, ray_taps=6,
                                       ray_window=192,
                                       compute_dtype=jnp.bfloat16,
                                       use_pallas=False, march_levels=(33, 65),
                                       rot_anchors="auto"))
    image = jnp.zeros((1, 512, 512, 3), jnp.float32)
    front = jnp.eye(4, dtype=jnp.float32)[None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    plan = engine._rot_anchor_plan(rot, 512)

    out = {"anchor_plan": str(plan)}
    for name, use_taps, use_grid, calib, rot_k in (
            ("frontal", True, True, front, ()),
            ("rotated", False, False, rot, plan),
            ("rotated_pp", False, False, rot, ())):
        prev = {"gflops": 0.0, "gbytes": 0.0}
        for stage in STAGES:
            def fn(pg, pc, img, stage=stage, calib=calib,
                   use_taps=use_taps, use_grid=use_grid, rot_k=rot_k):
                return engine._frame_impl(pg, pc, img, img, calib,
                                          use_taps=use_taps,
                                          use_grid=use_grid, rot_k=rot_k,
                                          stage=stage)
            cost = _cost(fn, params_g, params_c, image)
            label = stage or "tex"
            gf = cost["gflops"] - prev["gflops"]
            gb = cost["gbytes"] - prev["gbytes"]
            out[f"{name}_{label}_gflops"] = round(gf, 2)
            out[f"{name}_{label}_gbytes"] = round(gb, 3)
            out[f"{name}_{label}_intensity"] = round(gf / max(gb, 1e-9), 1)
            prev = cost
            print(f"{name}/{label}: {gf:.2f} GF, {gb:.3f} GB", flush=True)
        out[f"{name}_total_gflops"] = round(prev["gflops"], 2)
        out[f"{name}_total_gbytes"] = round(prev["gbytes"], 3)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
