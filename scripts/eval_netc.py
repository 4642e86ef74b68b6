"""Held-out texture-PSNR eval for candidate netG/netC checkpoint pairs.

Mirrors bench.py's real-model texture section (gt_texture_canvas +
masked_psnr at the bench profile) so netC candidates — which must be
retrained whenever netG changes, since the feat_prior distribution moves —
compare apples-to-apples against the committed pair (r3: 29.48 dB on
PRNGKey(31337)).

Run: python scripts/eval_netc.py <netg.npz> <netc.npz> [seed ...]
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from monoport_tpu import get_cfg_defaults  # noqa: E402
from monoport_tpu.engine import EngineCfg, ReconEngine  # noqa: E402
from monoport_tpu.models import MonoPortNet  # noqa: E402
from monoport_tpu.recon.depth_peel import visualize  # noqa: E402
from monoport_tpu.recon.hierarchy import HierarchicalRecon  # noqa: E402
from monoport_tpu.training.datasets.capsule import (  # noqa: E402
    gt_texture_canvas, render_front, skeleton3d)
from monoport_tpu.training.metrics import masked_psnr  # noqa: E402
from monoport_tpu.utils.compile_cache import enable as _enable  # noqa: E402
from monoport_tpu.utils.params_io import load_params  # noqa: E402

_enable()


def main():
    data = os.path.join(os.path.dirname(__file__), os.pardir,
                        "monoport_tpu", "data")
    argv = sys.argv[1:]
    pg = argv[0] if argv else os.path.join(data, "netg_capsule.npz")
    pc = argv[1] if len(argv) > 1 else os.path.join(data, "netc_capsule.npz")
    seeds = [int(s) for s in argv[2:]] or [31337, 4242, 777]

    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    netC = MonoPortNet(cfg.netC)
    params_g = {"params": load_params(pg)[0]}
    params_c = {"params": load_params(pc)[0]}
    engine = ReconEngine(netG, netC,
                 recon=HierarchicalRecon(resolutions=(17, 33, 65), budgets=(0, 4096, 16384), select="uncertain"),
                 config=EngineCfg.flat(mode="ray", fine_res=257, ray_taps=6,
                                       ray_window=192,
                                       compute_dtype=jnp.bfloat16,
                                       use_pallas=True, march_levels=(33, 65)))
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    rows = []
    for seed in seeds:
        caps = skeleton3d(jax.random.PRNGKey(seed))
        image = render_front(caps, 512)[0][None]
        out = engine.frame(params_g, image, params_c, image, calib=calib)
        gt_canvas = gt_texture_canvas(jnp.asarray(out["depth"]),
                                      jnp.asarray(out["valid"]), 257)
        gt_vis, _ = visualize(gt_canvas, engine.render_size)
        m = np.asarray(out["mask"])
        m = (m[..., 0] if m.ndim == 3 else m) > 0.5
        psnr, mae = masked_psnr(np.asarray(out["render_tex"]),
                                np.asarray(gt_vis), m)
        rows.append((seed, psnr, mae))
        print(f"seed{seed}: psnr={psnr:.2f}dB mae={mae:.4f}", flush=True)
    mean = sum(r[1] for r in rows) / len(rows)
    print(f"{pg} + {pc}: mean psnr={mean:.2f}dB", flush=True)


if __name__ == "__main__":
    main()
