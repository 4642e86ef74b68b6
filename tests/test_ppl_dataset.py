"""PPL dataset execution tests (VERDICT r2 item 3).

Runs `PPLDynamicDataset` / `PPLStaticDataset` end-to-end on generated
miniature fixture trees (training/datasets/fixture.py): sanity-check
pruning, __getitem__ contract, aug/flip calib math, 50/50 rebalancing,
retry-on-corrupt-sample, and one real train step through apps/train.py.
Reference semantics: monoport/lib/dataset/ppl_dynamic.py:61-66 (retry),
:181-212 (sanity check), :262-298 (sampling), ppl_static.py:10-39 (calib).
"""

import os
import random

import numpy as np
import pytest

from monoport_tpu.config import get_cfg_defaults
from monoport_tpu.training.datasets.fixture import (RADII,
                                                    make_dynamic_fixture,
                                                    make_static_fixture)
from monoport_tpu.training.datasets.ppl import (PPLDynamicDataset,
                                                PPLStaticDataset,
                                                balance_in_out,
                                                load_calib_dynamic)
from monoport_tpu.training.datasets.utils import projection


def _ds_cfg(**over):
    cfg = get_cfg_defaults().dataset
    cfg.rotation_step = 120
    cfg.num_sample_geo = 64
    cfg.blur = 0.0
    for k, v in over.items():
        cfg[k] = v
    return cfg


@pytest.fixture(scope="module")
def dyn_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ppl_dyn"))
    info = make_dynamic_fixture(root)
    return root, info


@pytest.fixture(scope="module")
def static_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ppl_static"))
    info = make_static_fixture(root)
    return root, info


def test_sanity_check_prunes_broken_motions(dyn_root):
    root, info = dyn_root
    ds = PPLDynamicDataset(_ds_cfg(), root)
    subjects = sorted(m[0] for m in ds.motion_list)
    # the three defective motions (missing mesh, head-below-hip skeleton,
    # out-of-frustum skeleton) are pruned at startup
    assert subjects == ["subj_a", "subj_b"]
    assert len(ds) == 2 * 3  # 2 motions x rotations {0, 120, 240}


def test_dynamic_item_contract(dyn_root):
    root, _ = dyn_root
    ds = PPLDynamicDataset(_ds_cfg(), root)
    item = ds.get_item(0)
    assert item["image"].shape == (512, 512, 3)
    assert item["image"].dtype == np.float32
    assert item["mask"].shape == (512, 512, 1)
    assert item["calib"].shape == (4, 4)
    assert item["samples_geo"].shape == (64, 3)
    assert item["labels_geo"].shape == (64,)
    # 50/50 in/out rebalance (ppl_dynamic.py:281-294): the fixture's
    # surface files contain far more than num_sample/2 inside points, so
    # the split is exactly half
    assert item["labels_geo"].mean() == 0.5
    # background premultiplied to zero after normalization (utils.py:87)
    assert np.abs(item["image"][(item["mask"][..., 0] < 0.5)]).max() == 0.0


@pytest.mark.parametrize("training", [False, True])
def test_projection_consistency(dyn_root, training):
    """Inside-labelled samples projected with the RETURNED calib land on
    the rendered silhouette — aug scale and flip included (the invariant
    that breaks if the aug calib math drifts)."""
    root, _ = dyn_root
    ds = PPLDynamicDataset(_ds_cfg(), root, training=training)
    random.seed(3)
    np.random.seed(3)
    for index in range(4):
        item = ds.get_item(index)
        pts = item["samples_geo"][item["labels_geo"] > 0.5]
        ndc = projection(pts, item["calib"])
        assert np.all(np.abs(ndc[:, :2]) <= 1.0)
        u = np.clip(((ndc[:, 0] + 1) / 2 * 511).round().astype(int), 0, 511)
        v = np.clip(((ndc[:, 1] + 1) / 2 * 511).round().astype(int), 0, 511)
        on_mask = item["mask"][v, u, 0] > 0.5
        assert on_mask.mean() > 0.97, (index, training, on_mask.mean())


def test_augment_scale_flip_math(dyn_root):
    """Exact aug math (ppl_dynamic.py:98-99 scale rows, :122-125 flip
    negates calib row 0): replay the `random` draws the dataset makes."""
    root, _ = dyn_root
    cfg = _ds_cfg()
    ds = PPLDynamicDataset(cfg, root, training=True)
    motion, rotation = ds._decode(1)
    base = load_calib_dynamic(ds.get_calib_path(motion, rotation))
    center = np.loadtxt(ds.get_center_path(motion)).reshape(1, 3)
    base[2, 3] -= projection(center, base).reshape(3)[2]

    for seed in (7, 8, 9, 10):
        random.seed(seed)
        scale = random.uniform(0.9, 1.1)
        flip = random.random() < 0.5
        expected = base.copy()
        expected[0:3] *= scale
        if flip:
            expected[0, :] *= -1

        random.seed(seed)
        item = ds.get_item(1)
        np.testing.assert_allclose(item["calib"], expected.astype(np.float32),
                                   rtol=1e-6)


def test_retry_on_corrupt_sample(tmp_path):
    """Any get_item exception retries a random index (ppl_dynamic.py:61-66)."""
    root = str(tmp_path / "dyn")
    make_dynamic_fixture(root, subjects=("s1", "s2"), broken=False)
    ds = PPLDynamicDataset(_ds_cfg(), root)
    # corrupt s1's rotation-0 calib => index of (s1, rot 0) now raises
    bad_idx = next(i for i in range(len(ds))
                   if ds._decode(i)[0][0] == "s1" and ds._decode(i)[1] == 0)
    with open(ds.get_calib_path(ds._decode(bad_idx)[0], 0), "w") as f:
        f.write("not a calib\n")
    with pytest.raises(Exception):
        ds.get_item(bad_idx)
    # seed so the retry draw lands on a healthy index
    for seed in range(20):
        random.seed(seed)
        if random.randint(0, len(ds) - 1) != bad_idx:
            break
    random.seed(seed)
    item = ds[bad_idx]
    assert item["image"].shape == (512, 512, 3)


def test_balance_in_out_low_inside():
    """nin <= num/2 branch: all inside points kept, outside tops up."""
    samples = np.arange(30).reshape(10, 3).astype(np.float32)
    inside = np.zeros(10)
    inside[:2] = 1.0
    pts, labels = balance_in_out(samples, inside, 8)
    assert pts.shape == (8, 3)
    assert labels.sum() == 2


def test_static_item_and_calib(static_root):
    root, info = static_root
    ds = PPLStaticDataset(_ds_cfg(), root)
    assert sorted(ds.motion_list) == ["stat_a", "stat_b"]
    assert len(ds) == 2 * 3
    item = ds.get_item(0)
    assert item["image"].shape == (512, 512, 3)
    assert item["samples_geo"].shape == (64, 3)
    assert item["labels_geo"].mean() == 0.5

    # calib math (ppl_static.py:10-39): center projects to the origin and
    # a point one radius up maps to -ndc * ry (y flipped by the intrinsic)
    from monoport_tpu.training.datasets.ppl import load_calib_static
    calib = load_calib_static(ds.get_calib_path("stat_a", 0))
    np.testing.assert_allclose(projection(np.zeros((1, 3)), calib), 0.0,
                               atol=1e-12)
    top = projection(np.asarray([[0.0, RADII[1], 0.0]]), calib)
    np.testing.assert_allclose(top[0, 1], -info["ndc"] * RADII[1], rtol=1e-6)

    ndc = projection(item["samples_geo"][item["labels_geo"] > 0.5],
                     item["calib"])
    u = np.clip(((ndc[:, 0] + 1) / 2 * 511).round().astype(int), 0, 511)
    v = np.clip(((ndc[:, 1] + 1) / 2 * 511).round().astype(int), 0, 511)
    # jpg compression + resize make the static mask edge soft: 90% bar
    assert (item["mask"][v, u, 0] > 0.5).mean() > 0.90


def test_train_step_on_fixture(dyn_root, tmp_path):
    """One real epoch of apps/train.py --dataset ppl_dynamic on the
    fixture tree — the full loader -> trainer -> jitted step path."""
    from monoport_tpu.apps.train import main

    root, _ = dyn_root
    loss = main([
        "--dataset", "ppl_dynamic", "--epochs", "1", "--",
        "dataset.root_render", root,
        "dataset.rotation_step", "120",
        "dataset.num_sample_geo", "64",
        "dataset.blur", "0.0",
        "batch_size", "2",
        "num_threads", "0",
        "num_epoch", "1",
        "freq_plot", "1",
        "optim", "adam",
        "learning_rate", "1e-3",
        "checkpoints_path", str(tmp_path / "ckpt"),
        "results_path", str(tmp_path / "results"),
        "netG.backbone.num_stack", "1",
        "netG.backbone.num_hourglass", "1",
        "netG.backbone.hourglass_dim", "64",
    ])
    assert np.isfinite(loss)


def test_ppl_training_improves_eval_iou(tmp_path):
    """Training on the rich PPL fixture IMPROVES held-out point IOU over
    init — the CI gate for VERDICT r3 item 5 (the full-model convergence
    run with mid-run resume is scripts/train_ppl_r4.py; its measured
    ladder lives in DESIGN.md). Tiny net at input_size 128 + a tiny rich
    tree; eval is the SAME subjects at held-out rotations (60/180/300 vs
    the trained 0/120/240). Measured trajectory (seed-pinned): IOU@0.5
    0.368 init -> 0.596 @10 epochs -> 0.641 @20 (/tmp probe, r4); the
    gate locks in most of the 10-epoch level. Full-512 tiny-net training
    was measured NOT to clear the 0.5-threshold knife edge in CI-sized
    step counts (collapses toward all-outside) — input_size 128 with 3x
    the steps is the learnable CI operating point."""
    import random

    import jax
    import jax.numpy as jnp

    from monoport_tpu.apps.train import main
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.parallel.train_step import (create_train_state,
                                                  make_optimizer)
    from monoport_tpu.training.datasets.fixture import make_dynamic_fixture

    train_root = str(tmp_path / "train")
    val_root = str(tmp_path / "val")
    make_dynamic_fixture(train_root, subjects=("r0", "r1"),
                         rotations=(0, 120, 240), rich=True,
                         textured=True, broken=False, seed=5)
    make_dynamic_fixture(val_root, subjects=("r0", "r1"),
                         rotations=(60, 180, 300), rich=True,
                         textured=True, broken=False, seed=5)

    overrides = ["dataset.rotation_step", "120",
                 "dataset.num_sample_geo", "256",
                 "dataset.blur", "0.0",
                 "dataset.input_size", "128",
                 "dataset.aug_bri", "0.0", "dataset.aug_con", "0.0",
                 "dataset.aug_sat", "0.0", "dataset.aug_hue", "0.0",
                 "batch_size", "2",
                 "num_threads", "0",
                 "freq_plot", "100",
                 "freq_save", "100000",
                 "optim", "adam",
                 "learning_rate", "1e-3",
                 "checkpoints_path", str(tmp_path / "ckpt"),
                 "results_path", str(tmp_path / "results"),
                 "name", "gate",
                 "netG.backbone.num_stack", "1",
                 "netG.backbone.num_hourglass", "1",
                 "netG.backbone.hourglass_dim", "64"]

    cfg_ds = _ds_cfg(num_sample_geo=256, rotation_step=60, input_size=128)
    ds_val = PPLDynamicDataset(cfg_ds, val_root, training=False)
    ds_val.rotations = (60, 180, 300)
    random.seed(0)
    np.random.seed(0)
    items = [ds_val.get_item(i) for i in range(6)]
    images = jnp.asarray(np.stack([it["image"] for it in items]))
    calibs = jnp.asarray(np.stack([it["calib"] for it in items]))
    pts = jnp.asarray(np.stack([it["samples_geo"] for it in items]))
    labels = np.stack([it["labels_geo"] for it in items]) > 0.5

    from monoport_tpu.apps.train import build_loader, parse_args, \
        to_train_batch
    args, cfg = parse_args(["--dataset", "ppl_dynamic", "--",
                            "dataset.root_render", train_root] + overrides)
    net = MonoPortNet(cfg.netG)

    def eval_iou(params):
        pred = np.asarray(net.apply({"params": params}, images, pts,
                                    calibs))[..., 0] > 0.5
        return float((pred & labels).sum() / max((pred | labels).sum(), 1))

    loader = build_loader(args, cfg)
    batch = jax.tree.map(np.asarray,
                         to_train_batch(next(iter(loader.epoch(0)))))
    init = create_train_state(net, jax.random.PRNGKey(0), batch,
                              make_optimizer("adam", 1e-3)).params
    iou_init = eval_iou(init)

    main(["--dataset", "ppl_dynamic", "--epochs", "12", "--",
          "dataset.root_render", train_root] + overrides)

    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        trained = ckptr.restore(os.path.abspath(
            str(tmp_path / "ckpt" / "gate" / "epoch_11")))["params"]
    iou_after = eval_iou(trained)
    assert iou_after > iou_init + 0.1, (iou_init, iou_after)
    assert iou_after > 0.52, iou_after


@pytest.fixture(scope="module")
def color_root(tmp_path_factory):
    """Textured rich tree WITH the color_{i}.npy supervision files —
    the netC-through-PPL fixture (VERDICT r4 item 5)."""
    root = str(tmp_path_factory.mktemp("ppl_color"))
    info = make_dynamic_fixture(root, subjects=("c0", "c1"),
                                rotations=(0, 120, 240), rich=True,
                                textured=True, broken=False, seed=11)
    return root, info


def test_color_item_contract(color_root):
    """get_sampling_color contract: [N, 3] near-surface points + [N, 3]
    albedo labels on the tanh head's [-1, 1] scale (the reference
    reserves cfg.num_sample_color/sigma_color, common/config.py:88-90,
    but raises NotImplementedError at ppl_dynamic.py:144)."""
    root, _ = color_root
    ds = PPLDynamicDataset(_ds_cfg(num_sample_color=48, sigma_color=0.0),
                           root, training=False)
    random.seed(0)
    np.random.seed(0)
    item = ds.get_item(0)
    assert item["samples_color"].shape == (48, 3)
    assert item["labels_color"].shape == (48, 3)
    assert item["labels_color"].dtype == np.float32
    assert item["labels_color"].min() >= -1.0
    assert item["labels_color"].max() <= 1.0
    # geometry keys unchanged alongside
    assert item["samples_geo"].shape == (64, 3)


def test_color_labels_match_every_rendered_view(color_root):
    """View-consistency — the property the netC path depends on: a stored
    surface albedo equals the pixel the renderer painted at the point's
    projection in EVERY rotation's render (the fixture's texture pattern
    is vertical-only, fixture._texture_pattern, so a y-rotation cannot
    change a surface point's painted color)."""
    from PIL import Image

    root, info = color_root
    mdir = sorted(info["good"])[0]
    data = np.load(os.path.join(mdir, "samples_0.05_v3", "color_0.npy"))
    pts, rgb = data[:, :3], data[:, 3:6]
    checked = 0
    for rot in (0, 120, 240):
        arr = np.asarray(Image.open(
            os.path.join(mdir, "render", f"{rot:03d}.png")),
            dtype=np.float32) / 255.0
        calib = load_calib_dynamic(
            os.path.join(mdir, "calib", f"{rot:03d}.txt"))
        proj = projection(pts, calib)
        size = arr.shape[0]
        # fixture.py paints at cx=(x_w+1)*size/2, cy=(1-y_w)*size/2 and
        # the dataset calib's intrinsic already flips y (proj_y = -y_w),
        # so cy = (1 + proj_y)*size/2
        u = (proj[:, 0] + 1.0) * size / 2
        v = (proj[:, 1] + 1.0) * size / 2
        ui, vi = np.round(u).astype(int), np.round(v).astype(int)
        ok = (ui > 2) & (ui < size - 3) & (vi > 2) & (vi < size - 3)
        # interior-only: the full 5x5 neighborhood must be opaque, which
        # keeps antialiased silhouette edges and part boundaries out
        alpha = arr[..., 3]
        interior = np.ones_like(ok)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                interior &= alpha[np.clip(vi + dy, 0, size - 1),
                                  np.clip(ui + dx, 0, size - 1)] > 0.99
        sel = ok & interior
        assert sel.sum() > 50, f"rot {rot}: too few interior points"
        painted = arr[vi[sel], ui[sel], :3]
        err = np.abs(painted - rgb[sel]).max(axis=-1)
        # nearest-pixel quantization + the pattern's vertical gradient
        # bound the expected deviation well under 8-bit + half a texel
        assert np.median(err) < 0.02, (rot, np.median(err))
        assert (err < 0.06).mean() > 0.95, (rot, (err < 0.06).mean())
        checked += int(sel.sum())
    assert checked > 300


def test_netc_trains_through_ppl_path(color_root, tmp_path):
    """netC end-to-end through the file-backed path (VERDICT r4 item 5):
    fixture color files -> PPLDynamicDataset.get_sampling_color ->
    DataLoader -> apps/train.py --net netC (feat_prior from a frozen
    netG inside the batch prep) -> Trainer -> jitted step. Gate: the
    trained params beat the init params' color L1 on a fixed batch.
    Reference contract: MonoPortNet.py:187-208 (netC conditions on netG
    features); the full-model TPU run is scripts/train_ppl_r5.py."""
    import jax
    import jax.numpy as jnp

    from monoport_tpu.apps.train import (build_loader, main, make_prior_fn,
                                         parse_args, to_train_batch)
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.models.backbones import BACKBONES, ResnetFilter
    from monoport_tpu.models.heads import HEADS
    from monoport_tpu.models.heads.surface_classifier import \
        SurfaceClassifier
    from monoport_tpu.parallel.train_step import (create_train_state,
                                                  make_optimizer)

    # CI-sized netC: small ResNet filter (32*4=128 ch; GroupNorm needs
    # channel counts divisible by its 32 groups) + tiny netG prior
    # (hourglass_dim 64) + z feature -> 193-channel color MLP
    BACKBONES.setdefault("tiny_resblk", lambda o=None, name=None:
                         ResnetFilter(ngf=32, n_blocks=2, name=name))
    HEADS.setdefault("tiny_chead", lambda o=None, name=None:
                     SurfaceClassifier(filter_channels=(193, 64, 3),
                                       num_views=1, no_residual=False,
                                       last_op=jnp.tanh, name=name))

    root, _ = color_root
    overrides = ["dataset.rotation_step", "120",
                 "dataset.num_sample_geo", "64",
                 "dataset.num_sample_color", "128",
                 "dataset.sigma_color", "0.001",
                 "dataset.blur", "0.0",
                 "dataset.input_size", "128",
                 "dataset.aug_bri", "0.0", "dataset.aug_con", "0.0",
                 "dataset.aug_sat", "0.0", "dataset.aug_hue", "0.0",
                 "batch_size", "2",
                 "num_threads", "0",
                 "freq_plot", "1", "freq_save", "100000",
                 "optim", "adam", "learning_rate", "1e-3",
                 "grad_clip", "1.0",
                 "checkpoints_path", str(tmp_path / "ckpt"),
                 "results_path", str(tmp_path / "results"),
                 "name", "netc_gate",
                 "netG.backbone.num_stack", "1",
                 "netG.backbone.num_hourglass", "1",
                 "netG.backbone.hourglass_dim", "64",
                 "netC.backbone.IMF", "tiny_resblk",
                 "netC.head.IMF", "tiny_chead"]

    args, cfg = parse_args(["--dataset", "ppl_dynamic", "--net", "netC",
                            "--netg", "", "--",
                            "dataset.root_render", root] + overrides)
    netC = MonoPortNet(cfg.netC)
    prior_fn = make_prior_fn(cfg, "")

    random.seed(0)
    np.random.seed(0)
    loader = build_loader(args, cfg)
    batch = jax.tree.map(np.asarray,
                         to_train_batch(next(iter(loader.epoch(0))), "netC"))
    batch["feat_prior"] = np.asarray(prior_fn(batch["images"]))
    assert batch["points"].shape == (2, 128, 3)
    assert batch["labels"].shape == (2, 128, 3)

    init = create_train_state(netC, jax.random.PRNGKey(0), batch,
                              make_optimizer("adam", 1e-3)).params

    def l1(params):
        pred = netC.apply({"params": params}, batch["images"],
                          batch["points"], batch["calibs"],
                          feat_prior=jnp.asarray(batch["feat_prior"]))
        return float(jnp.abs(pred - batch["labels"]).mean())

    loss = main(["--dataset", "ppl_dynamic", "--net", "netC",
                 "--netg", "", "--epochs", "6", "--",
                 "dataset.root_render", root] + overrides)
    assert np.isfinite(loss)

    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        trained = ckptr.restore(os.path.abspath(
            str(tmp_path / "ckpt" / "netc_gate" / "epoch_5")))["params"]
    l_init, l_trained = l1(init), l1(trained)
    assert l_trained < l_init - 0.05, (l_init, l_trained)
