"""Reconstruction engine tests: hierarchical-vs-dense losslessness (the
ImplicitSegCUDA replacement) and depth-peel parity vs RTL/recon.py."""

import numpy as np
import torch

import jax.numpy as jnp

from monoport_tpu.recon import (HierarchicalRecon, dense_eval, depth_peel,
                                grid_points, pifu_calib, shade_normal)


def sphere_query(points: jnp.ndarray) -> jnp.ndarray:
    """Smooth analytic occupancy: offset ellipsoid, [1,N,3] -> [1,N,1]."""
    center = jnp.asarray([0.1, -0.15, 0.05])
    radii = jnp.asarray([0.55, 0.7, 0.4])
    d = jnp.linalg.norm((points - center) / radii, axis=-1)
    return jax.nn.sigmoid((1.0 - d) * 12.0)[..., None]


import jax  # noqa: E402


def test_hierarchy_lossless_vs_dense():
    recon = HierarchicalRecon(resolutions=(9, 17, 33),
                              budgets=(0, 4096, 16384),
                              boundary_tau=0.2, dilate=1)
    occ_h, counts = recon(sphere_query, return_counts=True)
    occ_d = dense_eval(sphere_query, 33, chunk=8192)
    assert occ_h.shape == (33, 33, 33)
    # losslessness: identical binarization (IOU == 1.0 vs dense oracle)
    bin_h = np.asarray(occ_h) > 0.5
    bin_d = np.asarray(occ_d) > 0.5
    assert bin_h.sum() > 100  # the shape is actually there
    np.testing.assert_array_equal(bin_h, bin_d)
    # the evaluated band is exact, not just sign-correct
    band = np.abs(np.asarray(occ_d) - 0.5) < 0.15
    np.testing.assert_allclose(np.asarray(occ_h)[band],
                               np.asarray(occ_d)[band], atol=1e-5)
    # candidate counts stayed within budget (no silent truncation)
    for c, b in zip(counts, (4096, 16384)):
        assert int(c) <= b


def test_hierarchy_static_shapes_jit():
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    jitted = jax.jit(lambda: recon(sphere_query))
    occ = jitted()
    assert occ.shape == (17, 17, 17)


def _reference_maps(vol: np.ndarray):
    """Run the reference forward_vertices and densify its sparse output."""
    import sys
    sys.path.insert(0, "/root/reference/RTL")
    from recon import forward_vertices

    r = vol.shape[0]
    sdf = torch.from_numpy(vol)[None, None]
    X, Y, Z, norm = forward_vertices(sdf, direction="front")
    depth = np.zeros((r, r), np.float32)
    valid = np.zeros((r, r), bool)
    normal = np.zeros((r, r, 3), np.float32)
    xi = X.numpy()
    yi = Y.numpy()
    depth[xi, yi] = Z.numpy()
    valid[xi, yi] = True
    normal[xi, yi] = norm.numpy()
    return depth, valid, normal


def test_depth_peel_matches_reference():
    rng = np.random.RandomState(0)
    # smooth blob volume in [0, 1]
    r = 33
    recon = HierarchicalRecon(resolutions=(9, 17, 33),
                              budgets=(0, 4096, 16384))
    vol = np.asarray(dense_eval(sphere_query, r, chunk=8192))

    want_depth, want_valid, want_norm = _reference_maps(vol)
    maps = depth_peel(jnp.asarray(vol), "front")

    np.testing.assert_array_equal(np.asarray(maps.valid), want_valid)
    got_depth = np.asarray(maps.depth)
    got_norm = np.asarray(maps.normal)
    v = want_valid
    np.testing.assert_allclose(got_depth[v], want_depth[v], atol=1e-4)
    finite = v & np.isfinite(want_norm).all(-1) & np.isfinite(got_norm).all(-1)
    np.testing.assert_allclose(got_norm[finite], want_norm[finite], atol=1e-4)
    # shading produces a white background and in-range colors
    img = np.asarray(shade_normal(maps))
    assert img.shape == (r, r, 3)
    assert (img[~v] == 1.0).all()
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_depth_peel_directions():
    vol = np.asarray(dense_eval(sphere_query, 17, chunk=4096))
    for direction in ("front", "back", "left", "right"):
        maps = depth_peel(jnp.asarray(vol), direction)
        assert bool(np.asarray(maps.valid).any()), direction


def test_pifu_calib_matches_reference():
    import sys
    sys.path.insert(0, "/root/reference/RTL")
    from recon import pifu_calib as ref_calib

    rng = np.random.RandomState(1)
    intrinsic = np.eye(4) + rng.randn(4, 4) * 0.05
    extrinsic = np.eye(4)
    extrinsic[:3, 3] = [0.1, -0.2, -2.0]
    want = ref_calib(extrinsic, intrinsic, device="cpu").numpy()
    got = pifu_calib(extrinsic, intrinsic)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ray_refine_matches_full_depth_peel():
    """Ray-refined depth/normals vs the exact fine-volume depth peel."""
    from monoport_tpu.recon.ray_refine import ray_refine

    fine_res = 65
    recon_c = HierarchicalRecon(resolutions=(9, 17, 33),
                                budgets=(0, 4096, 16384))
    vol_c = recon_c(sphere_query)
    maps_fast = ray_refine(sphere_query, vol_c, fine_res, taps=6)

    vol_f = dense_eval(sphere_query, fine_res, chunk=16384)
    maps_ref = depth_peel(jnp.asarray(vol_f), "front")

    vf = np.asarray(maps_ref.valid)
    vg = np.asarray(maps_fast.valid)
    # valid masks agree except at the silhouette rim (1-2 rays)
    both = vf & vg
    assert both.sum() > 0.8 * vf.sum()

    # interior comparison: drop a 2-ray rim
    import scipy.ndimage as ndi
    interior = ndi.binary_erosion(vf, iterations=3) & both
    d_ref = np.asarray(maps_ref.depth)
    d_fast = np.asarray(maps_fast.depth)
    assert np.abs(d_ref[interior] - d_fast[interior]).max() < 1.5

    n_ref = np.asarray(maps_ref.normal)
    n_fast = np.asarray(maps_fast.normal)
    ok = interior & np.isfinite(n_ref).all(-1) & np.isfinite(n_fast).all(-1)
    cos = np.sum(n_ref[ok] * n_fast[ok], axis=-1)
    assert np.median(cos) > 0.97, np.median(cos)


def test_hierarchy_uncertain_selection():
    """Seg3dTopk-style priority: under budget pressure, the refined set
    prefers the most-uncertain voxels and stays lossless near the surface."""
    tight = HierarchicalRecon(resolutions=(9, 17, 33),
                              budgets=(0, 4096, 16384),
                              select="uncertain")
    occ_u = tight(sphere_query)
    occ_d = dense_eval(sphere_query, 33, chunk=8192)
    np.testing.assert_array_equal(np.asarray(occ_u) > 0.5,
                                  np.asarray(occ_d) > 0.5)


def test_budget_overflow_uncertain_preserves_band():
    """Candidates genuinely exceed the budget: 'uncertain' drops the
    most-confident voxels first so the iso-band survives; 'first' truncates
    in scan order and must never silently win."""
    res = (9, 17, 33)
    probe = HierarchicalRecon(resolutions=res, budgets=(0, 4096, 16384))
    _, counts = probe(sphere_query, return_counts=True)
    band = int(counts[-1])
    budget = band // 2
    assert band > budget > 0  # the overflow regime is actually exercised

    occ_d = np.asarray(dense_eval(sphere_query, 33, chunk=8192))

    def iou(occ):
        a, b = np.asarray(occ) > 0.5, occ_d > 0.5
        return (a & b).sum() / (a | b).sum()

    occ_u = HierarchicalRecon(resolutions=res, budgets=(0, 4096, budget),
                              select="uncertain")(sphere_query)
    occ_f = HierarchicalRecon(resolutions=res, budgets=(0, 4096, budget),
                              select="first")(sphere_query)
    assert iou(occ_u) >= iou(occ_f)
    assert iou(occ_u) > 0.99, iou(occ_u)
    # the surface-adjacent (most-uncertain) voxels were evaluated exactly,
    # not guessed: dense-band values match the oracle
    hot = np.abs(occ_d - 0.5) < 0.06
    assert hot.sum() > 50
    np.testing.assert_allclose(np.asarray(occ_u)[hot], occ_d[hot], atol=5e-3)


def test_band_report_flags_overflow():
    """ReconEngine.band_report surfaces per-level counts and overflow."""
    from types import SimpleNamespace

    from monoport_tpu.engine import ReconEngine

    recon = HierarchicalRecon(resolutions=(9, 17, 33), budgets=(0, 100, 200),
                              select="uncertain")
    dummy = SimpleNamespace(recon=recon)
    out = {"recon_counts": jnp.asarray([50, 900])}
    report = ReconEngine.band_report(dummy, out)
    assert "OVERFLOW" in report and "900/200" in report
    ok = ReconEngine.band_report(dummy, {"recon_counts": jnp.asarray([5, 9])})
    assert "OVERFLOW" not in ok


def test_ray_refine_scale4_quality():
    """Production config analog (coarse->fine scale 4, e.g. 65->257):
    wide-window taps still land within the reference's own 2-voxel
    bracketing error."""
    from monoport_tpu.recon.ray_refine import ray_refine

    recon_c = HierarchicalRecon(resolutions=(9, 17, 33),
                                budgets=(0, 4096, 16384))
    vol_c = recon_c(sphere_query)
    maps_fast = ray_refine(sphere_query, vol_c, 129, taps=6)

    vol_f = dense_eval(sphere_query, 129, chunk=65536)
    maps_ref = depth_peel(jnp.asarray(vol_f), "front")

    import scipy.ndimage as ndi
    vf = np.asarray(maps_ref.valid)
    vg = np.asarray(maps_fast.valid)
    interior = ndi.binary_erosion(vf, iterations=5) & vf & vg
    assert interior.sum() > 500
    d_err = np.abs(np.asarray(maps_ref.depth) - np.asarray(maps_fast.depth))
    # depth agrees within ~2 fine voxels (the reference's own v2 bracket
    # distance) over the interior
    assert np.median(d_err[interior]) < 1.0
    assert np.percentile(d_err[interior], 95) < 2.5

    n_ref = np.asarray(maps_ref.normal)
    n_fast = np.asarray(maps_fast.normal)
    ok = interior & np.isfinite(n_ref).all(-1) & np.isfinite(n_fast).all(-1)
    cos = np.sum(n_ref[ok] * n_fast[ok], axis=-1)
    assert np.median(cos) > 0.95, np.median(cos)


def test_ray_refine_window_matches_full():
    """Windowed fine pass equals the full pass inside the window when the
    subject fits."""
    from monoport_tpu.recon.ray_refine import ray_refine

    recon_c = HierarchicalRecon(resolutions=(9, 17, 33),
                                budgets=(0, 4096, 16384))
    vol_c = recon_c(sphere_query)
    full = ray_refine(sphere_query, vol_c, 65, taps=6)
    win = ray_refine(sphere_query, vol_c, 65, taps=6, window=56)

    vf = np.asarray(full.valid)
    # everything valid must be inside the window for this scene
    d_full = np.asarray(full.depth)
    d_win = np.asarray(win.depth)
    np.testing.assert_allclose(d_win[vf], d_full[vf], atol=1e-4)
    n_full = np.asarray(full.normal)
    n_win = np.asarray(win.normal)
    ok = vf & np.isfinite(n_full).all(-1)
    np.testing.assert_allclose(n_win[ok], n_full[ok], atol=1e-4)


def test_ray_refine_subject_larger_than_window():
    """A subject overflowing the window gets strided (lower-density) rays
    over its FULL extent — no quality cliff at the window border (the
    reference refines the whole volume unwindowed, RTL/main.py:390-395)."""
    from monoport_tpu.recon.ray_refine import ray_refine

    def big_query(points):
        d = jnp.linalg.norm(points / jnp.asarray([0.85, 0.9, 0.5]), axis=-1)
        return jax.nn.sigmoid((1.0 - d) * 12.0)[..., None]

    recon_c = HierarchicalRecon(resolutions=(9, 17, 33),
                                budgets=(0, 4096, 16384))
    vol_c = recon_c(big_query)
    rf = 65
    win = ray_refine(big_query, vol_c, rf, taps=6, window=24)
    ref = depth_peel(dense_eval(big_query, rf, chunk=16384), "front")

    import scipy.ndimage as ndi
    vf = np.asarray(ref.valid)
    interior = ndi.binary_erosion(vf, iterations=3) & np.asarray(win.valid)
    assert interior.sum() > 800  # subject genuinely spans >> 24 rays
    d_err = np.abs(np.asarray(ref.depth) - np.asarray(win.depth))[interior]
    assert np.median(d_err) < 1.0, np.median(d_err)
    # normals must be real everywhere on the subject (the old fixed window
    # left constant (0,0,-1) outside itself)
    n_ref = np.asarray(ref.normal)
    n_win = np.asarray(win.normal)
    ok = interior & np.isfinite(n_ref).all(-1)
    cos = np.sum(n_ref[ok] * n_win[ok], axis=-1)
    assert np.median(cos) > 0.95, np.median(cos)
    # specifically at the subject's extremes (outside any centered 24-ray
    # window): still refined, not the old fallback constant (0,0,-1)
    xs = np.where(interior.any(axis=1))[0]
    rim = interior.copy()
    rim[xs.min() + 8:, :] = False      # keep only the top slab
    assert rim.sum() > 10
    n_rim = n_win[rim]
    is_fallback = (np.abs(n_rim - np.asarray([0, 0, -1.0])) < 1e-6).all(-1)
    assert is_fallback.mean() < 0.05, is_fallback.mean()
    cos_rim = np.sum(n_ref[rim & ok] * n_win[rim & ok], axis=-1)
    # grazing-angle strided rays are noisier but still oriented right
    assert np.median(cos_rim) > 0.7, np.median(cos_rim)
