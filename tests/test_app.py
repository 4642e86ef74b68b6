"""End-to-end app smoke test: image folder -> segmentation -> fused device
frame -> composite (headless; the driver-facing config #5 path at small
scale)."""

import os

import numpy as np
import pytest

from PIL import Image


@pytest.fixture()
def frames_dir(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
        img[16:48, 12:36] = [200, 150, 120]  # a "person" blob
        Image.fromarray(img).save(tmp_path / f"f{i}.jpg")
    return str(tmp_path)


def test_run_camera_headless(frames_dir):
    from monoport_tpu.apps.run_camera import main
    n = main(["--image_folder", frames_dir, "--max_frames", "2"])
    assert n == 2


def test_rtl_main_headless(frames_dir):
    from monoport_tpu.apps.rtl_main import main
    n = main([
        "--image_folder", frames_dir, "--max_frames", "2", "--",
        "recon.resolutions", "[9,17,33]",
        "recon.budgets", "[0,2048,8192]",
        "recon.fine_res", "65", "recon.ray_taps", "4",
        "netG.backbone.num_stack", "1",
        "netG.backbone.num_hourglass", "1",
        "netG.backbone.hourglass_dim", "32",
    ])
    assert n == 2


def test_rtl_cli_convention():
    from monoport_tpu.apps.rtl_main import parse_args
    args, cfg = parse_args(["--camera", "--port", "7777", "--",
                            "learning_rate", "0.5"])
    assert args.camera and args.port == 7777
    assert cfg.learning_rate == 0.5


def test_infer_mesh_export(frames_dir, tmp_path):
    from monoport_tpu.apps.infer import main
    import glob
    img = sorted(glob.glob(frames_dir + "/*.jpg"))[0]
    out = str(tmp_path / "mesh.obj")
    n = main(["--image", img, "--out", out, "--max_cells", "8192", "--",
              "recon.resolutions", "[9,17,33]",
              "recon.budgets", "[0,2048,8192]",
              "netG.backbone.num_stack", "1",
              "netG.backbone.num_hourglass", "1",
              "netG.backbone.hourglass_dim", "32"])
    import os
    assert os.path.exists(out)


def test_train_cli_synthetic(tmp_path):
    from monoport_tpu.apps.train import main
    loss = main(["--dataset", "synthetic", "--epochs", "1",
                 "--image_size", "64", "--",
                 "batch_size", "2",
                 "optim", "adam",
                 "dataset.num_sample_geo", "128",
                 "freq_plot", "1", "freq_save", "100000",
                 "checkpoints_path", str(tmp_path / "c"),
                 "results_path", str(tmp_path / "r"),
                 "netG.backbone.num_stack", "1",
                 "netG.backbone.num_hourglass", "1",
                 "netG.backbone.hourglass_dim", "32"])
    import numpy as np
    assert np.isfinite(loss)


def test_config_profiles_load():
    from monoport_tpu.apps.rtl_main import parse_args
    for profile in ("configs/rtl.yaml", "configs/quality.yaml"):
        args, cfg = parse_args(["-cfg", profile, "--camera"])
        assert cfg.recon.mode in ("ray", "dense")
    args, cfg = parse_args(["-cfg", "configs/quality.yaml", "--camera"])
    assert cfg.recon.mode == "dense"
    assert cfg.recon.resolutions[-1] == 257
