"""Occupancy culling (core/occupancy.py): slab test, grid→AABB reduction,
and end-to-end equivalence of the culled render path against the dense path
on an analytic field (SURVEY.md §4.1/4.2 — no reference code exists to diff
against, README.md:1-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashion_nerf.config import load_config
from fashion_nerf.core.occupancy import (
    build_occupancy, build_from_config, cull_background, ray_aabb_intersect,
    ray_multi_aabb)
from fashion_nerf.metrics import psnr
from fashion_nerf.render.renderer import render_rays


def _sphere_field(center=(0.0, 0.0, 0.0), radius=0.8, dens=50.0):
    """Analytic soft-sphere field in the repo-wide field convention:
    (pts (R,S,3), viewdirs (R,3), cond) → (rgb post-sigmoid, σ raw ≥ 0)."""
    c = jnp.asarray(center)

    def field(pts, viewdirs, cond):
        d = jnp.linalg.norm(pts - c, axis=-1)
        sigma = dens * jax.nn.sigmoid(-25.0 * (d - radius))
        rgb = jnp.broadcast_to(jnp.array([0.8, 0.3, 0.2]),
                               pts.shape[:-1] + (3,))
        return rgb, sigma
    return field


class TestRayAABB:
    def test_through_center(self):
        o = jnp.array([[0.0, 0.0, 4.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        lo, hi, hit = ray_aabb_intersect(o, d, jnp.array([-1.0, -1.0, -1.0]),
                                         jnp.array([1.0, 1.0, 1.0]), 2.0, 6.0)
        assert bool(hit[0])
        np.testing.assert_allclose(lo[0], 3.0, atol=1e-5)
        np.testing.assert_allclose(hi[0], 5.0, atol=1e-5)

    def test_miss_gets_degenerate_far_range(self):
        o = jnp.array([[0.0, 3.0, 4.0]])          # offset above the box
        d = jnp.array([[0.0, 0.0, -1.0]])
        lo, hi, hit = ray_aabb_intersect(o, d, jnp.array([-1.0, -1.0, -1.0]),
                                         jnp.array([1.0, 1.0, 1.0]), 2.0, 6.0)
        assert not bool(hit[0])
        assert float(lo[0]) == float(hi[0]) == 6.0

    def test_origin_inside_box(self):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        lo, hi, hit = ray_aabb_intersect(o, d, jnp.array([-1.0, -1.0, -1.0]),
                                         jnp.array([1.0, 1.0, 1.0]), 0.1, 6.0)
        assert bool(hit[0])
        np.testing.assert_allclose(lo[0], 0.1, atol=1e-5)  # clipped to near
        np.testing.assert_allclose(hi[0], 1.0, atol=1e-5)

    def test_axis_parallel_direction(self):
        # d has exact zeros — the slab test must not produce NaNs
        o = jnp.array([[0.5, 0.5, 4.0], [2.5, 0.5, 4.0]])
        d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        lo, hi, hit = ray_aabb_intersect(o, d, jnp.array([-1.0, -1.0, -1.0]),
                                         jnp.array([1.0, 1.0, 1.0]), 2.0, 6.0)
        assert bool(hit[0]) and not bool(hit[1])
        assert np.isfinite(np.asarray(lo)).all()

    def test_clip_behind_far(self):
        # box entirely beyond far → miss
        o = jnp.array([[0.0, 0.0, 10.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        lo, hi, hit = ray_aabb_intersect(o, d, jnp.array([-1.0, -1.0, -1.0]),
                                         jnp.array([1.0, 1.0, 1.0]), 2.0, 6.0)
        assert not bool(hit[0])

    def test_matches_brute_force(self):
        key = jax.random.PRNGKey(0)
        o = jax.random.uniform(key, (64, 3), minval=-3, maxval=3)
        d = jax.random.normal(jax.random.fold_in(key, 1), (64, 3))
        bmin = jnp.array([-0.7, -1.1, -0.4])
        bmax = jnp.array([0.9, 0.3, 1.2])
        lo, hi, hit = ray_aabb_intersect(o, d, bmin, bmax, 0.5, 8.0)
        # brute force: dense t sweep, inside-box test
        t = jnp.linspace(0.5, 8.0, 4097)
        pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
        inside = jnp.all((pts >= bmin) & (pts <= bmax), axis=-1)  # (R, T)
        bf_hit = jnp.any(inside, axis=-1)
        np.testing.assert_array_equal(np.asarray(hit), np.asarray(bf_hit))
        t_in = jnp.where(inside, t[None, :], jnp.inf).min(-1)
        t_out = jnp.where(inside, t[None, :], -jnp.inf).max(-1)
        tol = float(t[1] - t[0]) * 1.5
        np.testing.assert_allclose(np.asarray(lo)[np.asarray(hit)],
                                   np.asarray(t_in)[np.asarray(bf_hit)],
                                   atol=tol)
        np.testing.assert_allclose(np.asarray(hi)[np.asarray(hit)],
                                   np.asarray(t_out)[np.asarray(bf_hit)],
                                   atol=tol)


class TestBuildOccupancy:
    def test_sphere_aabb_tight(self):
        field = _sphere_field(center=(0.2, -0.1, 0.3), radius=0.6)
        occ = build_occupancy(field, -2.0, 2.0, resolution=32,
                              sigma_threshold=1e-2)
        cell = 4.0 / 32
        # the soft sphere's density tail crosses the 1e-2 threshold at
        # r_eff = r + ln(dens/thresh)/25 (σ = dens·sigmoid(-25(d-r)))
        r_eff = 0.6 + np.log(50.0 / 1e-2) / 25.0
        # box must contain the sphere and track r_eff to ~2 cells + margin
        for d, c in enumerate([0.2, -0.1, 0.3]):
            assert float(occ.box_min[d]) <= c - 0.6
            assert float(occ.box_max[d]) >= c + 0.6
            assert float(occ.box_min[d]) >= c - r_eff - 3 * cell
            assert float(occ.box_max[d]) <= c + r_eff + 3 * cell

    def test_empty_grid_falls_back_to_world(self):
        def empty_field(pts, viewdirs, cond):
            return jnp.ones(pts.shape[:-1] + (3,)), \
                jnp.full(pts.shape[:-1], -10.0)
        occ = build_occupancy(empty_field, -2.0, 2.0, resolution=16)
        assert not bool(jnp.any(occ.grid))
        np.testing.assert_allclose(occ.box_min, -2.0)
        np.testing.assert_allclose(occ.box_max, 2.0)

    def test_jittable(self):
        field = _sphere_field()
        occ = jax.jit(lambda: build_occupancy(field, -2.0, 2.0,
                                              resolution=16))()
        assert occ.grid.shape == (16, 16, 16)


class TestCulledRenderEquivalence:
    """Culled vs dense render of the same analytic field: the quality gate
    for the sample-work reduction (VERDICT r1 #2: PSNR delta < 0.1 dB)."""

    def _render(self, occ, n_coarse=32, n_fine=64):
        cfg = load_config("blender_lego", [
            f"sampling.n_coarse={n_coarse}", f"sampling.n_fine={n_fine}",
            "model.compute_dtype=float32",
        ])
        field = _sphere_field(radius=0.7)
        key = jax.random.PRNGKey(3)
        # mixed hit/miss ray fan from a blender-style camera at z=4
        R = 256
        ang = jnp.linspace(-0.45, 0.45, R)
        rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, 4.0]), (R, 3))
        rays_d = jnp.stack([jnp.sin(ang), jnp.zeros_like(ang),
                            -jnp.cos(ang)], -1)
        out = render_rays(field, field, rays_o, rays_d, key, cfg,
                          train=False, occ=occ)
        return out["fine"]

    def test_psnr_delta_tiny(self):
        field = _sphere_field(radius=0.7)
        occ = build_occupancy(field, -2.0, 2.0, resolution=32)
        dense = self._render(None)
        culled = self._render(occ)
        # both hit rays (resampled inside the box) and miss rays (culled to
        # exact background) must agree with the dense render
        delta = psnr(culled["rgb"], dense["rgb"])
        assert float(delta) > 40.0, f"culled vs dense PSNR {delta:.1f} dB"
        # miss rays are exactly background (white_bkgd=True in this preset)
        _, _, hit = ray_aabb_intersect(
            jnp.broadcast_to(jnp.array([0.0, 0.0, 4.0]), (256, 3)),
            jnp.stack([jnp.sin(jnp.linspace(-0.45, 0.45, 256)),
                       jnp.zeros(256),
                       -jnp.cos(jnp.linspace(-0.45, 0.45, 256))], -1),
            occ.box_min, occ.box_max, 2.0, 6.0)
        miss = ~np.asarray(hit)
        assert miss.any() and (~miss).any(), "need both hit and miss rays"
        np.testing.assert_allclose(np.asarray(culled["rgb"])[miss], 1.0)
        np.testing.assert_allclose(np.asarray(culled["acc"])[miss], 0.0)

    def test_fewer_samples_in_tight_range_match_dense_budget(self):
        """The point of culling: 32+64 samples inside the tight interval
        reproduce the 64+128 dense-range render."""
        field = _sphere_field(radius=0.7)
        occ = build_occupancy(field, -2.0, 2.0, resolution=32)
        dense_big = self._render(None, n_coarse=64, n_fine=128)
        culled_small = self._render(occ, n_coarse=32, n_fine=64)
        delta = psnr(culled_small["rgb"], dense_big["rgb"])
        assert float(delta) > 40.0, f"PSNR {float(delta):.1f} dB"


def _two_sphere_field(r=0.25, sep=1.6, dens=50.0):
    """Two small spheres separated along x — interior empty gap between
    them, the geometry macro-box culling exists for (VERDICT r2 #2)."""
    c1 = jnp.array([-sep / 2, 0.0, 0.0])
    c2 = jnp.array([sep / 2, 0.0, 0.0])

    def field(pts, viewdirs, cond):
        d1 = jnp.linalg.norm(pts - c1, axis=-1)
        d2 = jnp.linalg.norm(pts - c2, axis=-1)
        sigma = dens * (jax.nn.sigmoid(-60.0 * (d1 - r))
                        + jax.nn.sigmoid(-60.0 * (d2 - r)))
        rgb = jnp.broadcast_to(jnp.array([0.8, 0.3, 0.2]),
                               pts.shape[:-1] + (3,))
        return rgb, sigma
    return field


class TestMacroBoxes:
    def test_boxes_cover_occupied_cells_and_skip_the_gap(self):
        occ = build_occupancy(_two_sphere_field(), -2.0, 2.0, resolution=32,
                              macro=4)
        assert occ.boxes_min.shape == (64, 3)
        assert int(jnp.sum(occ.boxes_occ)) >= 2
        # every occupied grid-cell center lies inside some occupied box
        g = 32
        cell = 4.0 / g
        idx = np.argwhere(np.asarray(occ.grid))
        centers = -2.0 + cell * (idx + 0.5)
        bmin = np.asarray(occ.boxes_min)[np.asarray(occ.boxes_occ)]
        bmax = np.asarray(occ.boxes_max)[np.asarray(occ.boxes_occ)]
        inside = ((centers[:, None, :] >= bmin[None]) &
                  (centers[:, None, :] <= bmax[None])).all(-1).any(-1)
        assert inside.all()
        # the midpoint between the spheres is in the GLOBAL box but in no
        # occupied macro box — the win over single-AABB culling
        mid = np.zeros(3)
        assert (np.asarray(occ.box_min) <= mid).all()
        assert (np.asarray(occ.box_max) >= mid).all()
        in_any = ((mid >= bmin) & (mid <= bmax)).all(-1).any()
        assert not in_any

    def test_multi_aabb_union_matches_brute_force(self):
        occ = build_occupancy(_two_sphere_field(), -2.0, 2.0, resolution=32,
                              macro=4)
        key = jax.random.PRNGKey(7)
        o = jnp.broadcast_to(jnp.array([0.0, 0.0, 4.0]), (64, 3)) \
            + jax.random.uniform(key, (64, 3), minval=-0.5, maxval=0.5)
        d = jax.random.normal(jax.random.fold_in(key, 1), (64, 3))
        d = d.at[:, 2].set(-jnp.abs(d[:, 2]) - 0.5)
        lo, hi, hit, s_lo, s_hi, s_hit = ray_multi_aabb(o, d, occ, 2.0, 6.0)
        # brute force against the box set
        t = jnp.linspace(2.0, 6.0, 4097)
        pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
        bmin = occ.boxes_min[occ.boxes_occ]
        bmax = occ.boxes_max[occ.boxes_occ]
        inside = ((pts[:, :, None, :] >= bmin[None, None]) &
                  (pts[:, :, None, :] <= bmax[None, None])).all(-1).any(-1)
        bf_hit = jnp.any(inside, axis=-1)
        np.testing.assert_array_equal(np.asarray(hit), np.asarray(bf_hit))
        tol = float(t[1] - t[0]) * 1.5
        m = np.asarray(hit)
        t_in = jnp.where(inside, t[None, :], jnp.inf).min(-1)
        t_out = jnp.where(inside, t[None, :], -jnp.inf).max(-1)
        np.testing.assert_allclose(np.asarray(lo)[m],
                                   np.asarray(t_in)[m], atol=tol)
        np.testing.assert_allclose(np.asarray(hi)[m],
                                   np.asarray(t_out)[m], atol=tol)

    def test_empty_grid_degrades_to_single_world_box(self):
        def empty_field(pts, viewdirs, cond):
            return jnp.ones(pts.shape[:-1] + (3,)), \
                jnp.full(pts.shape[:-1], -10.0)
        occ = build_occupancy(empty_field, -2.0, 2.0, resolution=16, macro=4)
        assert int(jnp.sum(occ.boxes_occ)) == 1
        k = int(jnp.argmax(occ.boxes_occ))
        np.testing.assert_allclose(occ.boxes_min[k], -2.0)
        np.testing.assert_allclose(occ.boxes_max[k], 2.0)
        # multi-box culling must be a no-op: every ray that sees the world
        # box hits the fallback box
        o = jnp.array([[0.0, 0.0, 4.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        _, _, hit, *_ = ray_multi_aabb(o, d, occ, 2.0, 6.0)
        assert bool(hit[0])

    def test_margin_crosses_macro_boundary(self):
        # a single occupied cell exactly at a macro boundary: the dilated
        # halo must appear in BOTH neighbor boxes
        g, k = 16, 4
        grid = np.zeros((g, g, g), bool)
        grid[4, 8, 8] = True          # x-index 4 = boundary of macro 0|1
        from fashion_nerf.core.occupancy import _macro_boxes
        wm = jnp.full((3,), -2.0)
        cell = jnp.full((3,), 4.0 / g)
        bmin, bmax, bocc = _macro_boxes(
            jnp.asarray(grid), wm, cell, g, k, margin_cells=1,
            any_occ=jnp.asarray(True), fallback_min=wm, fallback_max=-wm)
        occd = np.asarray(bocc).reshape(k, k, k)
        assert occd[1, 2, 2]          # home macro cell (x idx 4 → macro 1)
        assert occd[0, 2, 2]          # margin spills into macro 0


def test_cull_background_overwrites_misses():
    out = {"rgb": jnp.full((4, 3), 0.5), "depth": jnp.ones(4),
           "acc": jnp.full((4,), 0.9), "weights": jnp.full((4, 8), 0.1),
           "disp": jnp.ones(4)}
    hit = jnp.array([True, False, True, False])
    culled = cull_background(out, hit, white_bkgd=True)
    np.testing.assert_allclose(culled["rgb"][1], 1.0)
    np.testing.assert_allclose(culled["rgb"][0], 0.5)
    np.testing.assert_allclose(culled["acc"][3], 0.0)
    np.testing.assert_allclose(culled["weights"][1], 0.0)


def test_build_from_config_uses_cfg_fields():
    cfg = load_config("blender_lego", ["occupancy.resolution=16",
                                       "occupancy.enabled=true"])
    occ = build_from_config(cfg, _sphere_field())
    assert occ.grid.shape == (16, 16, 16)


def test_refresh_occupancy_no_retrace(monkeypatch):
    """ADVICE r3 / VERDICT r3 weak #1: the training-time grid refresh must
    trace its lattice sweep ONCE per cfg — a fresh jit(lambda) per refresh
    recompiled the Pallas-field sweep (~15 s each through the remote-compile
    tunnel) every occ_refresh_every steps. build_from_config is called
    exactly once per trace, so counting its calls counts traces."""
    import fashion_nerf.core.occupancy as occ_mod
    from fashion_nerf.train.loop import refresh_occupancy
    from fashion_nerf.train.state import create_train_state

    calls = {"n": 0}
    orig = occ_mod.build_from_config

    def counting(cfg, field):
        calls["n"] += 1
        return orig(cfg, field)

    monkeypatch.setattr(occ_mod, "build_from_config", counting)
    # unique resolution so this test never shares loop._occ_refresh_fn's
    # lru_cache entry with another test's cfg
    cfg = load_config("tiny_lego", [
        "model.net_depth=2", "model.net_width=32", "model.posenc_xyz=4",
        "occupancy.resolution=12", "occupancy.macro=2"])
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    occ1 = refresh_occupancy(cfg, state.params)
    params2 = jax.tree_util.tree_map(lambda x: x * 1.5, state.params)
    occ2 = refresh_occupancy(cfg, params2)   # same shapes → cached trace
    assert calls["n"] == 1, f"grid refresh retraced: {calls['n']} traces"
    assert occ1.grid.shape == occ2.grid.shape == (12, 12, 12)


def test_world_unit_margin_tracks_resolution():
    """VERDICT r3 weak #3: the conservative halo is a WORLD distance — the
    effective cell margin must scale with grid resolution so finer grids
    keep the same physical dilation (the r3 macro=16/res=128 failure)."""
    from fashion_nerf.config import OccupancyConfig
    from fashion_nerf.core.occupancy import effective_margin_cells

    base = OccupancyConfig(resolution=64)            # default margin_world
    assert effective_margin_cells(base) == 1         # = the r3 behavior
    fine = OccupancyConfig(resolution=128)
    assert effective_margin_cells(fine) == 2         # same world halo
    finer = OccupancyConfig(resolution=256)
    assert effective_margin_cells(finer) == 4
    # margin_world=0 degrades to the raw cell count
    off = OccupancyConfig(resolution=128, margin_world=0.0)
    assert effective_margin_cells(off) == 1
    # cell-count floor still wins when it is larger
    floor = OccupancyConfig(resolution=64, margin_cells=3)
    assert effective_margin_cells(floor) == 3
