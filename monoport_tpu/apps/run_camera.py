"""Minimal streamer+segmentation demo (reference RTL/run_camera.py).

Smoke-tests the capture pipeline and segmentation without reconstruction:
camera/video/images -> Segmentation -> side-by-side display (or frame
count in headless mode).

Run: python -m monoport_tpu.apps.run_camera --image_folder ./frames
"""

from __future__ import annotations

import argparse

import numpy as np

import jax.numpy as jnp

from ..pipeline.runtime import Pipeline
from ..pipeline.segmentation import Segmentation
from ..pipeline.streamer import open_stream


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--camera", action="store_true")
    parser.add_argument("--images", default=[], nargs="*")
    parser.add_argument("--image_folder", default=None)
    parser.add_argument("--videos", default=[], nargs="*")
    parser.add_argument("--loop", action="store_true")
    parser.add_argument("--show", action="store_true")
    parser.add_argument("--max_frames", type=int, default=0)
    args = parser.parse_args(argv)

    seg = Segmentation.load_default()

    def stage_segment(frame):
        segm, bboxes, probs = seg(jnp.asarray(frame[None]))
        return {"input": frame, "segm": np.asarray(segm[0]),
                "bboxes": np.asarray(bboxes), "probs": np.asarray(probs)}

    stage_segment.__name__ = "segment"
    stream = open_stream(camera=args.camera, videos=args.videos,
                         images=args.images,
                         image_folder=args.image_folder, loop=args.loop)
    pipeline = Pipeline(stream, [stage_segment], name="run_camera")

    n = 0
    for d in pipeline:
        n += 1
        if args.show:  # pragma: no cover - UI path
            import cv2
            masked = ((d["segm"][..., :3] * 0.5 + 0.5)
                      * d["segm"][..., 3:4])
            window = np.hstack([d["input"], masked])
            cv2.imshow("segmentation", window[..., ::-1])
            if cv2.waitKey(1) == ord("q"):
                break
        if args.max_frames and n >= args.max_frames:
            pipeline.close()
            break
    print(pipeline.report())
    return n


if __name__ == "__main__":
    main()
