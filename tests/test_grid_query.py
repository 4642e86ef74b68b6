"""Gather-free separable grid sampling (ops/sampling.index_grid,
MonoPortNet.query_taps_grid, engine use_grid path): exact equivalence with
the gather-based paths it replaces on the frontal fast path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.config import CN
from monoport_tpu.engine import EngineCfg, ReconEngine
from monoport_tpu.models import MonoPortNet
from monoport_tpu.ops.sampling import index, index_grid
from monoport_tpu.recon.hierarchy import HierarchicalRecon


def test_index_grid_matches_index():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(2, 16, 24, 8).astype(np.float32))
    # include partially- and fully-outside positions: the hat-function
    # rows must reproduce index()'s per-tap zeros padding exactly
    u = jnp.asarray(rng.uniform(-1.4, 1.4, (2, 7)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1.4, 1.4, (2, 5)).astype(np.float32))
    got = index_grid(feat, u, v)
    assert got.shape == (2, 7, 5, 8)
    for b in range(2):
        uu, vv = jnp.meshgrid(u[b], v[b], indexing="ij")
        uv = jnp.stack([uu.ravel(), vv.ravel()], -1)[None]
        want = index(feat[b:b + 1], uv)[0].reshape(7, 5, 8)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   atol=1e-6)


def _netG():
    g = CN()
    g.projection = "orthogonal"
    g.backbone = CN({"IMF": "PIFuHGFilters", "num_stack": 1,
                     "num_hourglass": 1, "hourglass_dim": 64,
                     "norm": "group", "hg_down": "ave_pool"})
    g.normalizer = CN({"IMF": "PIFuNomalizer"})
    g.head = CN({"IMF": "PIFuNetGMLP"})
    g.loss = CN({"IMF": "MSE"})
    return MonoPortNet(g)


def test_query_taps_grid_matches_query_taps():
    """Grid query == flattened taps query, including a calib with scale,
    translation and a z-row that mixes x/y (allowed: only the image rows
    must be diagonal and z-free)."""
    net = _netG()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    calib = jnp.asarray(np.diag([1.1, 0.9, 1.05, 1.0]).astype(np.float32))
    calib = calib.at[0, 3].set(0.05).at[1, 3].set(-0.03) \
        .at[2, 0].set(0.02).at[2, 3].set(0.01)[None]
    params = net.init(jax.random.PRNGKey(0), image, jnp.zeros((1, 8, 3)),
                      calib)
    feats = net.apply(params, image, method="filter")
    xw = jnp.asarray(rng.uniform(-1, 1, (1, 9)).astype(np.float32))
    yw = jnp.asarray(rng.uniform(-1, 1, (1, 6)).astype(np.float32))
    zw = jnp.asarray(rng.uniform(-1, 1, (1, 9, 6, 4)).astype(np.float32))
    got = net.apply(params, feats, xw, yw, zw, calib,
                    method="query_taps_grid")
    xx, yy = jnp.meshgrid(xw[0], yw[0], indexing="ij")
    xy = jnp.stack([xx.ravel(), yy.ravel()], -1)[None]
    want = net.apply(params, feats, xy, zw.reshape(1, 54, 4), calib,
                     method="query_taps")
    np.testing.assert_allclose(np.asarray(got.reshape(1, 54, 4, 1)),
                               np.asarray(want), atol=1e-5)


@pytest.fixture(scope="module")
def engine_setup():
    netG = _netG()
    c = CN()
    c.projection = "orthogonal"
    c.backbone = CN({"IMF": "PIFuResBlkFilters"})
    c.normalizer = CN({"IMF": "PIFuNomalizer"})
    c.head = CN({"IMF": "PIFuNetCMLP"})
    c.loss = CN({"IMF": "L1"})
    netC = MonoPortNet(c)
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 8, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, calib,
                         feat_prior=jnp.zeros((1, 32, 32, 64)))
    return netG, netC, params_g, params_c, image, calib


def test_engine_grid_path_equivalence(engine_setup):
    """use_grid on vs off: same frame outputs (march pyramid + texture)."""
    netG, netC, params_g, params_c, image, calib = engine_setup
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    eng = ReconEngine(netG, netC, recon=recon,
              config=EngineCfg.flat(render_size=32, mode="ray", fine_res=33,
                                    ray_taps=4, march_levels=(9, 17)))
    assert eng._calib_grid_ok(calib)
    out_grid = eng._frame(params_g, params_c, image, image, calib,
                          use_taps=True, use_grid=True)
    out_taps = eng._frame(params_g, params_c, image, image, calib,
                          use_taps=True, use_grid=False)
    # a random-init net outputs occupancy ~0.5 everywhere, so last-bit
    # reassociation (matmul vs gather sum order) can flip the `> 0.5`
    # test on a handful of knife-edge rays; require near-total agreement
    # rather than bitwise equality
    for key in ("depth", "render_norm", "render_tex"):
        a = np.asarray(out_grid[key], np.float64)
        b = np.asarray(out_taps[key], np.float64)
        frac = (np.abs(a - b) > 2e-5).mean()
        assert frac < 0.005, (key, frac)
    va = np.asarray(out_grid["valid"])
    vb = np.asarray(out_taps["valid"])
    assert (va != vb).mean() < 0.005


def _analytic_color(xw, yw, zw):
    # smooth analytic color of the world coords (shape contract of
    # engine._grid_color_fn: xw [h], yw [w], zw [h, w] -> [h, w, 3])
    cx = jnp.sin(3.0 * xw)[:, None] + 0.2 * zw
    cy = jnp.cos(2.0 * yw)[None, :] - 0.1 * zw
    cz = 0.5 * zw
    return jnp.stack([jnp.broadcast_to(cx, zw.shape),
                      jnp.broadcast_to(cy, zw.shape), cz], axis=-1)


def _analytic_color_points(pts):
    # per-point form of the same color field (engine query_color contract:
    # [1, N, 3] world points -> [1, N, 3] colors)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    return jnp.stack([jnp.sin(3.0 * x) + 0.2 * z,
                      jnp.cos(2.0 * y) - 0.1 * z, 0.5 * z], axis=-1)


def test_texture_window_exact_and_strided(engine_setup):
    """_texture_canvas with a fine-pass window, BOTH query forms: when the
    subject's bbox fits the window (stride 1, integer start) the resampled
    canvas is an EXACT match to the full-lattice texture on every pixel;
    when the subject overflows the window (stride > 1) the bilinear color
    resample stays close on valid pixels."""
    netG, netC, params_g, params_c, image, calib = engine_setup
    from monoport_tpu.recon.depth_peel import SurfaceMaps

    r = 65
    ii, jj = np.meshgrid(np.arange(r), np.arange(r), indexing="ij")

    def build(radius):
        valid = (ii - 32) ** 2 + (jj - 32) ** 2 < radius ** 2
        depth = 20.0 + 6.0 * np.sin(ii / 9.0) * np.cos(jj / 7.0)
        return SurfaceMaps(depth=jnp.asarray(depth, jnp.float32),
                           normal=jnp.zeros((r, r, 3), jnp.float32),
                           valid=jnp.asarray(valid))

    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    full = ReconEngine(netG, None, recon=recon,
               config=EngineCfg.flat(mode="ray", fine_res=r))
    win = ReconEngine(netG, None, recon=recon,
              config=EngineCfg.flat(mode="ray", fine_res=r, ray_window=48))

    for kwargs in ({"color_grid": _analytic_color},
                   {"query_color": _analytic_color_points}):
        # subject fits the 48-ray window (disk r=14 + 1.5 margin < 48):
        maps = build(14)
        a = np.asarray(full._texture_canvas(maps, r, **kwargs))
        b = np.asarray(win._texture_canvas(maps, r, **kwargs))
        np.testing.assert_allclose(b, a, atol=1e-6)

        # subject overflows the window -> strided color resample,
        # valid-only closeness
        maps = build(30)
        a = np.asarray(full._texture_canvas(maps, r, **kwargs))
        b = np.asarray(win._texture_canvas(maps, r, **kwargs))
        v = np.asarray(maps.valid)
        assert np.abs(b - a)[v].max() < 0.02
        # background is the same constant canvas either way
        np.testing.assert_allclose(b[~v], a[~v], atol=1e-6)

    # the two query forms agree with each other on the full lattice
    maps = build(14)
    a = np.asarray(full._texture_canvas(maps, r,
                                        color_grid=_analytic_color))
    b = np.asarray(full._texture_canvas(
        maps, r, query_color=_analytic_color_points))
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_grid_gate_rejects_rotated_image_rows(engine_setup):
    netG, netC, params_g, params_c, image, calib = engine_setup
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    eng = ReconEngine(netG, None, recon=recon,
              config=EngineCfg.flat(mode="ray", fine_res=33))
    rot = np.eye(4, dtype=np.float32)
    rot[0, 1] = 0.3  # in-plane rotation term: grid invalid, taps still ok
    rot = jnp.asarray(rot)[None]
    assert eng._calib_taps_ok(rot)
    assert not eng._calib_grid_ok(rot)
