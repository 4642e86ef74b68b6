"""Real-time volumetric capture demo — the flagship application (L7).

Reference contract: RTL/main.py — CLI (argparse + config overrides after a
literal ``--``), camera/video/image sources, the 15-stage processor
pipeline, desktop OpenCV windows with hotkey mode switching, and a Flask
MJPEG server at /video_feed.

TPU-native redesign: stages 7-14 of the reference pipeline (filter ->
recon -> peel -> color) are ONE jitted device program (monoport_tpu.engine)
fed by a 3-stage host pipeline (capture -> segment+calib -> device frame ->
composite). The MJPEG server uses the stdlib http.server (flask is not in
this environment); the desktop path uses cv2 when available.

Run:
    python -m monoport_tpu.apps.rtl_main --image_folder ./frames \
        -- netG.ckpt_path data/PIFu/net_G netC.ckpt_path data/PIFu/net_C
"""

from __future__ import annotations

import argparse
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax
import jax.numpy as jnp

from ..config import get_cfg_defaults
from ..engine import EngineCfg, ReconEngine
from ..models import MonoPortNet
from ..pipeline.runtime import Pipeline
from ..pipeline.scene import MonoPortScene
from ..pipeline.segmentation import Segmentation
from ..pipeline.streamer import open_stream
from ..recon.calib import pifu_calib
from ..recon.hierarchy import HierarchicalRecon

MODES = {
    "desktop": "TEXTURE_NORM",   # SEGM | NORM | TEXTURE | TEXTURE_NORM
    "server": "TEXTURE",         # NORM | TEXTURE
    "view": "AUTO",              # FRONT | BACK | LEFT | RIGHT | AUTO | LOAD
}

_VIEW_ANGLES = {"FRONT": (20, 0), "BACK": (20, 180), "LEFT": (20, 90),
                "RIGHT": (20, 270)}


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-cfg", "--config_file", default=None)
    parser.add_argument("--camera", action="store_true")
    parser.add_argument("--images", default=[], nargs="*")
    parser.add_argument("--image_folder", default=None)
    parser.add_argument("--videos", default=[], nargs="*")
    parser.add_argument("--loop", action="store_true")
    parser.add_argument("--use_server", action="store_true")
    parser.add_argument("--desktop", action="store_true")
    parser.add_argument("--max_frames", type=int, default=0)
    parser.add_argument("--ip", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=5555)

    argv = list(sys.argv[1:] if argv is None else argv)
    # args before a literal '--' go to argparse, after it to the config
    # (reference convention, RTL/main.py:73-75)
    if "--" in argv:
        split = argv.index("--")
        argv, opts = argv[:split], argv[split + 1:]
    else:
        opts = []
    args = parser.parse_args(argv)

    cfg = get_cfg_defaults()
    # RTL demo profile: the measured real-time operating point (DESIGN.md)
    # — coarse 65^3 volume + 257-equivalent per-ray refinement; explicit
    # user overrides (config file / CLI) still win below.
    cfg.recon.mode = "ray"
    cfg.recon.resolutions = [17, 33, 65]
    cfg.recon.budgets = [0, 4096, 16384]
    cfg.recon.ray_window = 192
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(opts)
    cfg.freeze()
    return args, cfg


def _arch_matches_default(cfg, net_key: str) -> bool:
    """True iff cfg.<net_key>'s architecture equals the package default.

    The committed in-repo weights (data/*.npz) were trained with
    get_cfg_defaults(); loading them under an overridden backbone/head/
    normalizer/projection config would raise a flax shape error (the
    normalizer's soft-onehot width feeds the head input dim), so gate on
    equality of every architecture-defining subtree.
    """
    from ..config import get_cfg_defaults
    default = get_cfg_defaults()[net_key]
    net = cfg[net_key]
    return (dict(net.backbone) == dict(default.backbone)
            and dict(net.head) == dict(default.head)
            and dict(net.normalizer) == dict(default.normalizer)
            and net.projection == default.projection)


def load_networks(cfg):
    """Build netG/netC and load checkpoints (RTL/main.py:105-128).

    Accepts legacy PyTorch PIFu checkpoints (converted on the fly) or
    orbax checkpoints saved by the Trainer.
    """
    import os

    import logging

    log = logging.getLogger("monoport_tpu.rtl")
    # a set-but-missing path warns up front, whatever branch follows — a
    # typo'd checkpoint must never silently masquerade as something else
    for net_key in ("netG", "netC"):
        path = cfg[net_key].ckpt_path
        if path and not os.path.exists(path):
            log.warning("%s.ckpt_path %r not found on disk", net_key, path)
    netG = MonoPortNet(cfg.netG)
    params_g, g_from_capsule = None, False
    if cfg.netG.ckpt_path and os.path.exists(cfg.netG.ckpt_path):
        from ..convert import load_legacy_pifu
        params_g = load_legacy_pifu(cfg.netG.ckpt_path,
                                    cfg.netG.backbone.IMF)
    elif _arch_matches_default(cfg, "netG"):
        # no (reachable) checkpoint: fall back to the committed in-repo
        # netG trained on capsule humans (apps/train_capsule_netG.py) —
        # far better than random init for the demo. Only when the
        # architecture config equals the defaults the weights were trained
        # with (a shrunken test config must get random init, not a shape
        # error).
        default = os.path.join(os.path.dirname(__file__), os.pardir,
                               "data", "netg_capsule.npz")
        if os.path.exists(default):
            if cfg.netG.ckpt_path:
                # (reference asserts on a missing path, RTL/main.py:107;
                # here the zero-egress default profile intentionally
                # works without downloads — but says what it substitutes)
                log.warning("using the committed capsule netG demo "
                            "weights instead of %r", cfg.netG.ckpt_path)
            from ..utils.params_io import load_params
            params_g = {"params": load_params(default)[0]}
            g_from_capsule = True
    netC, params_c = None, None
    if cfg.netC.ckpt_path and os.path.exists(cfg.netC.ckpt_path):
        from ..convert import load_legacy_pifu
        netC = MonoPortNet(cfg.netC)
        params_c = load_legacy_pifu(cfg.netC.ckpt_path,
                                    cfg.netC.backbone.IMF)
    elif g_from_capsule and _arch_matches_default(cfg, "netC"):
        # The committed netC was trained against the committed capsule
        # netG's feature distribution (train_capsule_netC.py freezes that
        # netG as the prior), so it only auto-loads when netG ALSO came
        # from the capsule weights — pairing it with a user's legacy PIFu
        # netG would silently produce garbage textures.
        default = os.path.join(os.path.dirname(__file__), os.pardir,
                               "data", "netc_capsule.npz")
        if os.path.exists(default):
            if cfg.netC.ckpt_path:
                log.warning("using the committed capsule netC demo "
                            "weights instead of %r", cfg.netC.ckpt_path)
            from ..utils.params_io import load_params
            netC = MonoPortNet(cfg.netC)
            params_c = {"params": load_params(default)[0]}
    return netG, params_g, netC, params_c


def _init_random_params(net, image_hw=512):
    """Random init when no checkpoint is supplied (demo still runs)."""
    img = jnp.zeros((1, image_hw, image_hw, 3), jnp.float32)
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    opt = net.opt_net
    feat_prior = None
    if opt.backbone.IMF == "PIFuResBlkFilters":
        feat_prior = jnp.zeros((1, 128, 128, 256), jnp.float32)
    return net.init(jax.random.PRNGKey(0), img, pts, calib,
                    feat_prior=feat_prior)


class FrameState:
    """Mutable UI state (the reference's module globals, RTL/main.py:39-46)."""

    def __init__(self):
        self.desktop_mode = MODES["desktop"]
        self.server_mode = MODES["server"]
        self.view_mode = MODES["view"]
        self.latest_jpeg: bytes | None = None
        self.lock = threading.Lock()
        # adaptive rotated-compaction hint: the composite stage writes
        # the fetched valid fraction back, the device stage feeds it to
        # the NEXT frame (engine.compact_hint_from_valid / COMPACT_LADDER)
        self.compact_hint: float | None = None


def build_pipeline(args, cfg, state: FrameState):
    netG, params_g, netC, params_c = load_networks(cfg)
    if params_g is None:
        params_g = _init_random_params(netG)
    if netC is not None and params_c is None:
        params_c = _init_random_params(netC)

    import jax.numpy as _jnp

    recon = HierarchicalRecon(
        resolutions=tuple(cfg.recon.resolutions),
        budgets=tuple(cfg.recon.budgets),
        boundary_tau=cfg.recon.boundary_tau,
        dilate=cfg.recon.dilate,
        balance_value=cfg.recon.balance_value,
        select=cfg.recon.select)
    engine = ReconEngine(netG, netC, recon=recon,
                 config=EngineCfg.flat(mode=cfg.recon.mode,
                                       fine_res=cfg.recon.fine_res,
                                       ray_taps=cfg.recon.ray_taps,
                                       ray_window=cfg.recon.ray_window or None,
                                       march_levels=tuple(cfg.recon.march_levels) if cfg.recon.mode == "ray" else None,
                                       march_rotated=cfg.recon.march_rotated,
                                       compute_dtype=getattr(_jnp, cfg.tpu.compute_dtype),
                                       use_pallas=cfg.tpu.use_pallas and jax.default_backend() != "cpu"))
    seg = Segmentation.load_default()  # trained MatteNet (box fallback if absent)
    scene = MonoPortScene(size=(256, 256))

    mean = np.asarray(cfg.netG.mean, np.float32)
    std = np.asarray(cfg.netG.std, np.float32)

    def stage_segment(frame):
        """Host+device preprocessing: segmentation, camera, calib
        (stages 2-6 of RTL/main.py:326-364)."""
        image = jnp.asarray(frame[None])                 # [1, H, W, 3] 0..1
        segm, bboxes, probs = seg(image)
        if state.view_mode in _VIEW_ANGLES:
            from ..render.camera import orbit_extrinsic
            yaw, pitch = _VIEW_ANGLES[state.view_mode]
            extrinsic = orbit_extrinsic(yaw, pitch)
            intrinsic = scene.intrinsic
        else:
            extrinsic, intrinsic = scene.update_camera(
                load=(state.view_mode == "LOAD"))
        # keep calib on the HOST (numpy): engine.frame reads it to pick
        # the fast-path variant (_calib_taps_ok) — a device-resident calib
        # would cost a tunneled fetch per frame; as a jit argument numpy
        # is device-put for free with the rest of the batch
        calib = pifu_calib(extrinsic, intrinsic)
        rgb = segm[..., :3]
        alpha = segm[..., 3:4]
        input_g = (((rgb * 0.5 + 0.5) - mean) / std) * alpha
        input_c = rgb * alpha
        return {"segm": segm, "input_netG": input_g, "input_netC": input_c,
                "calib": calib, "extrinsic": np.array(extrinsic),
                "intrinsic": np.array(intrinsic)}

    import jax as _jax

    @_jax.jit
    def _pack_display(out):
        """One uint8 device buffer for the per-frame host fetch: the
        tunnel RTT (~110ms) dominates per-array transfers, so the
        composite stage fetches exactly once."""
        norm = jnp.nan_to_num(out["render_norm"], nan=1.0)
        tex = jnp.nan_to_num(out.get("render_tex", out["render_norm"]),
                             nan=1.0)
        mask = out["mask"].astype(jnp.float32)
        # 8th plane: the VALID fraction (depth-based, stable under
        # compaction drops — texture drops whiten 'mask' and would
        # death-spiral an adaptive budget fed from it), broadcast so the
        # one uint8 fetch carries it for free
        frac = out["valid"].astype(jnp.float32).mean()
        frac_plane = jnp.full(mask.shape[:2] + (1,), frac, jnp.float32)
        stack = jnp.concatenate([norm, tex, mask, frac_plane],
                                axis=-1)                     # [S, S, 8]
        return jnp.clip(stack * 255.0, 0, 255).astype(jnp.uint8)

    def stage_device(d):
        """The fused on-device frame program (stages 7-15)."""
        out = engine.frame(params_g, d["input_netG"], params_c,
                           d["input_netC"], d["calib"],
                           compact_hint=state.compact_hint)
        d["display_packed"] = _pack_display(out)
        d.update(out)
        return d

    def stage_composite(d):
        """Composite over the rendered floor background + JPEG encode
        (RTL/main.py:535-557)."""
        packed = np.asarray(d["display_packed"]).astype(np.float32) / 255.0
        norm_img, tex_img = packed[..., 0:3], packed[..., 3:6]
        mask = packed[..., 6:7]
        # feed the measured valid fraction back as the NEXT frame's
        # adaptive compaction hint (uint8 quantization ~0.4% is inside
        # the hint's 1.3x safety headroom)
        state.compact_hint = engine.compact_hint_from_valid(
            float(packed[0, 0, 7]))
        d["render_norm_host"] = norm_img
        d["render_tex_host"] = tex_img
        fg = (tex_img if state.server_mode == "TEXTURE" else norm_img)
        background = scene.render(d["extrinsic"], d["intrinsic"])
        frame = mask * fg + (1.0 - mask) * background
        d["window_server"] = np.clip(frame, 0, 1)
        try:
            import cv2
            ok, enc = cv2.imencode(
                ".jpg", (d["window_server"][..., ::-1] * 255).astype(np.uint8))
            if ok:
                with state.lock:
                    state.latest_jpeg = enc.tobytes()
        except ImportError:
            pass
        return d

    stage_segment.__name__ = "segment"
    stage_device.__name__ = "device_frame"
    stage_composite.__name__ = "composite"

    stream = open_stream(camera=args.camera, videos=args.videos,
                         images=args.images, image_folder=args.image_folder,
                         loop=args.loop)
    pipeline = Pipeline(stream, [stage_segment, stage_device,
                                 stage_composite],
                        max_queue=2, name="rtl")
    pipeline.engine = engine  # for end-of-run band telemetry (main_loop)
    return pipeline


class MJPEGHandler(BaseHTTPRequestHandler):
    state: FrameState = None  # set by serve()

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path == "/":
            # landing page with the embedded stream (the reference serves
            # RTL/templates/test_flask.html at '/', RTL/main.py:604-606)
            import os
            page = os.path.join(os.path.dirname(__file__), "templates",
                                "index.html")
            try:
                with open(page, "rb") as f:
                    body = f.read()
            except OSError:
                body = b"<html><body><img src='/video_feed'/></body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path != "/video_feed":
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type",
                         "multipart/x-mixed-replace; boundary=frame")
        self.end_headers()
        try:
            while True:
                with self.state.lock:
                    jpeg = self.state.latest_jpeg
                if jpeg is not None:
                    self.wfile.write(b"--frame\r\n"
                                     b"Content-Type: image/jpeg\r\n\r\n")
                    self.wfile.write(jpeg)
                    self.wfile.write(b"\r\n")
                time.sleep(1.0 / 30)
        except (BrokenPipeError, ConnectionResetError):
            return


_HOTKEYS = {"q": ("desktop_mode", "SEGM"), "w": ("desktop_mode", "NORM"),
            "e": ("desktop_mode", "TEXTURE"),
            "r": ("desktop_mode", "TEXTURE_NORM"),
            "s": ("server_mode", "NORM"), "d": ("server_mode", "TEXTURE"),
            "z": ("view_mode", "FRONT"), "x": ("view_mode", "BACK"),
            "c": ("view_mode", "LEFT"), "v": ("view_mode", "RIGHT"),
            "b": ("view_mode", "AUTO"), "n": ("view_mode", "LOAD")}
# hotkey 'g' (shift_floor) is handled in _desktop_window via the scene


def _enable_compile_cache():
    from ..utils.compile_cache import enable
    enable()  # remote-compile relay: reuse compiled frame programs


def main_loop(args, cfg, state: FrameState):
    pipeline = build_pipeline(args, cfg, state)
    n, last = 0, None
    for d in pipeline:
        n += 1
        last = d
        if args.desktop:
            _desktop_window(d, state)
        if args.max_frames and n >= args.max_frames:
            pipeline.close()
            break
    print(pipeline.report())
    if last is not None and "recon_counts" in last:
        print(pipeline.engine.band_report(last))
    if last is not None and "compact_dropped" in last:
        # rotated-frame compaction overflow: degraded rays/pixels must be
        # visible, not a green log (engine.compact_report docstring)
        report = pipeline.engine.compact_report(last)
        print(report)
        if "OVERFLOW" in report:
            import logging
            logging.getLogger(__name__).warning(report)
    return n


def _desktop_window(d, state: FrameState):  # pragma: no cover - UI path
    import cv2

    segm = np.asarray(d["segm"][0])
    input_img = segm[..., :3] * 0.5 + 0.5
    if state.desktop_mode == "SEGM":
        seg_img = (segm[..., :3] * segm[..., 3:4]) * 0.5 + 0.5
        window = np.hstack([input_img, seg_img])
    else:
        fg = d.get("render_tex_host")
        if fg is None:
            fg = np.nan_to_num(np.asarray(
                d.get("render_tex", d["render_norm"])), nan=1.0)
        norm = d.get("render_norm_host")
        if norm is None:
            norm = np.nan_to_num(np.asarray(d["render_norm"]), nan=1.0)
        if state.desktop_mode == "TEXTURE_NORM":
            window = np.vstack([fg, norm])
        else:
            key = "NORM" if state.desktop_mode == "NORM" else "TEXTURE"
            img = norm if key == "NORM" else fg
            img = cv2.resize(img, input_img.shape[:2][::-1])
            window = np.hstack([input_img, img])
    cv2.imshow("monoport_tpu", window[..., ::-1])
    key = cv2.waitKey(1)
    if key > 0 and chr(key & 0xFF) in _HOTKEYS:
        attr, value = _HOTKEYS[chr(key & 0xFF)]
        setattr(state, attr, value)


def main(argv=None):
    args, cfg = parse_args(argv)
    _enable_compile_cache()
    state = FrameState()
    if args.use_server:
        MJPEGHandler.state = state
        server = ThreadingHTTPServer((args.ip, args.port), MJPEGHandler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        print(f"MJPEG server at http://{args.ip}:{args.port}/video_feed")
    return main_loop(args, cfg, state)


if __name__ == "__main__":
    main()
