"""Train DetectNet on procedural multi-person scenes and save a checkpoint.

Completes the human_det story for a zero-egress environment (the reference
downloads a pretrained torchhub detector, README.md:16-19; here the weights
are produced in-repo). The committed checkpoint at
``monoport_tpu/data/detectnet.npz`` is loaded automatically by
``Segmentation.load_default()``, replacing the fixed-rectangle detection
region of round 1.

Run (real TPU, steps fully on-device):
    python -m monoport_tpu.apps.train_detection --steps 3000 --out \
        monoport_tpu/data/detectnet.npz
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from ..pipeline.detection import Detection, DetectNet
from ..training.detection import box_iou, make_train_fns, synth_det_batch
from ..utils.params_io import save_params


def evaluate(params, width: int, size: int, key, batch: int = 8,
             thresh: float = 0.3, stride: int = 16):
    """Held-out eval -> dict(mean matched-box IOU, precision, recall,
    fp_rate) at confidence ``thresh`` (greedy IOU>=0.5 matching)."""
    det = Detection({"params": params["params"]
                     if "params" in params else params}, width=width,
                    stride=stride)
    images, gt_boxes, gt_valid = synth_det_batch(key, batch, size)
    boxes, probs = det(images)
    ious, tp, fp, fn = [], 0, 0, 0
    for i in range(batch):
        got = np.asarray(boxes[i])
        p = np.asarray(probs[i])
        want = np.asarray(gt_boxes[i])
        valid = np.asarray(gt_valid[i])
        conf = list(np.where(p > thresh)[0])
        matched = set()
        for j in np.where(valid)[0]:
            cand = {m: float(np.asarray(box_iou(got[m], want[j])))
                    for m in conf if m not in matched}
            best = max(cand, key=cand.get) if cand else None
            iou = cand[best] if best is not None else 0.0
            ious.append(iou)
            if iou >= 0.5:
                tp += 1
                matched.add(best)
            else:
                fn += 1
        fp += len([m for m in conf if m not in matched])
    return {
        "iou": float(np.mean(ious)) if ious else 1.0,
        "precision": tp / max(tp + fp, 1),
        "recall": tp / max(tp + fn, 1),
        "fp_rate": fp / max(len(ious), 1),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--chunk", type=int, default=100,
                        help="steps per device dispatch")
    parser.add_argument("--sizes", default="256,512",
                        help="comma list; chunks alternate between sizes "
                        "so the size/offset heads see the demo's 512 "
                        "resolution, not just 256 (ADVICE r2)")
    parser.add_argument("--batch", type=int, default=8,
                        help="batch at the smallest size; larger sizes "
                        "scale it down to keep per-step cost flat")
    parser.add_argument("--width", type=int, default=16)
    parser.add_argument("--stride", type=int, default=16,
                        help="output grid pitch; 8 doubles localization "
                        "resolution (box-IOU ceiling on small people)")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true",
                        help="pin the CPU backend (tests / no-TPU boxes)")
    parser.add_argument("--out", default="monoport_tpu/data/detectnet.npz")
    args = parser.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()  # remote-compile relay: reuse compiled programs
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    net = DetectNet(width=args.width, stride=args.stride)
    sizes = [int(s) for s in args.sizes.split(",")]
    s_min = min(sizes)
    runs = []
    init_fn = None
    for s in sizes:
        b = max(2, args.batch * s_min * s_min // (s * s))
        ifn, rfn = make_train_fns(net, s, b, args.lr,
                                  total_steps=args.steps)
        init_fn = init_fn or ifn
        runs.append(jax.jit(rfn, static_argnums=2))
    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    state = init_fn(k_init)

    t0 = time.time()
    done = 0
    turn = 0
    while done < args.steps:
        n = min(args.chunk, args.steps - done)
        key, k_run = jax.random.split(key)
        run = runs[turn % len(runs)]  # alternate sizes per chunk
        state, loss = run(state, k_run, n)
        loss = float(np.asarray(loss))  # materializes the chunk
        done += n
        turn += 1
        print(f"step {done}/{args.steps} size {sizes[(turn - 1) % len(sizes)]}"
              f" mean loss {loss:.4f} ({time.time() - t0:.0f}s)", flush=True)

    params = state[0]
    iou = 1.0
    for s in sizes:
        m = evaluate(params, args.width, s,
                     jax.random.PRNGKey(args.seed + 10_000),
                     stride=args.stride)
        print(f"held-out @{s}: IOU {m['iou']:.4f} precision "
              f"{m['precision']:.3f} recall {m['recall']:.3f} "
              f"fp_rate {m['fp_rate']:.3f}", flush=True)
        iou = min(iou, m["iou"])

    save_params(args.out, params["params"] if "params" in params else params,
                meta={"width": args.width, "stride": args.stride})
    print(f"saved {args.out}", flush=True)
    return iou


if __name__ == "__main__":
    main()
