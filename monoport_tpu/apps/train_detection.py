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


def evaluate(params, width: int, size: int, key, batch: int = 8):
    """Held-out eval -> (mean matched-box IOU, false-positive rate)."""
    det = Detection({"params": params["params"]
                     if "params" in params else params}, width=width)
    images, gt_boxes, gt_valid = synth_det_batch(key, batch, size)
    boxes, probs = det(images)
    ious, fps = [], 0
    for i in range(batch):
        got = np.asarray(boxes[i])
        p = np.asarray(probs[i])
        want = np.asarray(gt_boxes[i])
        valid = np.asarray(gt_valid[i])
        conf = p > 0.3
        for j in np.where(valid)[0]:
            cand = [float(np.asarray(box_iou(got[m], want[j])))
                    for m in np.where(conf)[0]]
            ious.append(max(cand) if cand else 0.0)
        # confident detections not matching any GT instance
        for m in np.where(conf)[0]:
            cand = [float(np.asarray(box_iou(got[m], want[j])))
                    for j in np.where(valid)[0]]
            if not cand or max(cand) < 0.3:
                fps += 1
    return (float(np.mean(ious)) if ious else 1.0,
            fps / max(len(ious), 1))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--chunk", type=int, default=100,
                        help="steps per device dispatch")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--width", type=int, default=16)
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

    net = DetectNet(width=args.width)
    init_fn, run_fn = make_train_fns(net, args.size, args.batch, args.lr)
    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    state = init_fn(k_init)
    run = jax.jit(run_fn, static_argnums=2)

    t0 = time.time()
    done = 0
    while done < args.steps:
        n = min(args.chunk, args.steps - done)
        key, k_run = jax.random.split(key)
        state, loss = run(state, k_run, n)
        loss = float(np.asarray(loss))  # materializes the chunk
        done += n
        print(f"step {done}/{args.steps} mean loss {loss:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    params = state[0]
    iou, fp_rate = evaluate(params, args.width, args.size,
                            jax.random.PRNGKey(args.seed + 10_000))
    print(f"held-out matched-box IOU @{args.size}: {iou:.4f} "
          f"(fp rate {fp_rate:.3f})", flush=True)

    save_params(args.out, params["params"] if "params" in params else params,
                meta={"width": args.width})
    print(f"saved {args.out}", flush=True)
    return iou


if __name__ == "__main__":
    main()
