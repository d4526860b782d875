"""Blockwise early-terminated pipeline (render/blockwise.py) vs the dense
reference path (SURVEY.md §4.3 equivalence discipline): interpret mode on
CPU, compiled under the TPU marker. Termination/culling quality gates run on
the committed trained flagship weights (assets/)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashion_nerf.assets import load_flagship
from fashion_nerf.config import load_config
from fashion_nerf.core.occupancy import build_from_config
from fashion_nerf.kernels.posenc_mlp_pallas import make_fused_field
from fashion_nerf.metrics import psnr
from fashion_nerf.render.blockwise import (render_image_blockwise,
                                           render_rays_blockwise)
from fashion_nerf.render.renderer import render_image, render_rays
from fashion_nerf.train.state import create_train_state


def _cfg(interpret, overrides=()):
    return load_config("blender_lego", [
        "kernels.use_pallas=true",
        f"kernels.interpret={'true' if interpret else 'false'}",
        "sampling.n_coarse=32", "sampling.n_fine=32",
        # the preset ships a reduced render-time eval budget (r3) — zero it
        # so these equivalence tests compare identical sample sets
        "render.eval_n_coarse=0", "render.eval_n_fine=0",
        # r3: the preset defaults to the carry march; most equivalence
        # tests pin the two-stage pipeline and the carry tests flip it on
        "kernels.fused_carry=false",
    ] + list(overrides))


def _rand_params(cfg):
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    return jax.device_get(state.params)


def _ray_fan(R=256, z=4.0, spread=0.45):
    ang = jnp.linspace(-spread, spread, R)
    rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, z]), (R, 3))
    rays_d = jnp.stack([jnp.sin(ang), jnp.zeros_like(ang),
                        -jnp.cos(ang)], -1)
    return rays_o, rays_d


def _dense_reference(params, cfg, rays_o, rays_d, occ=None, cond=None):
    """Same fused field, evaluated densely through the standard renderer —
    isolates the block partitioning + termination as the only difference."""
    fused = make_fused_field(cfg)
    fc = functools.partial(fused, params["coarse"])
    ff = functools.partial(fused, params["fine"])

    def bind(f):
        def bound(pts, _rd, cond):
            return f(pts, rays_d, cond)
        return bound
    out = render_rays(bind(fc), bind(ff), rays_o, rays_d,
                      jax.random.PRNGKey(0), cfg, train=False, occ=occ,
                      cond=cond)
    return out["fine"]


def _assert_close(bw, ref, min_psnr=45.0):
    p = float(psnr(bw["rgb"], ref["rgb"]))
    assert p > min_psnr, f"blockwise vs dense PSNR {p:.1f} dB"
    # tolerance covers the carry march's in-kernel o + d·t (its fma rounds
    # ~1 ulp differently than XLA's; the posenc amplifies that by 2^{L-1}
    # → ~1e-4/pass, and the coarse→fine CDF resample amplifies again on a
    # random-init field). The trained-model gate (scripts/quality_check.py)
    # holds the real bound: blockwise-vs-dense 64 dB whole-frame.
    np.testing.assert_allclose(np.asarray(bw["acc"]), np.asarray(ref["acc"]),
                               atol=2e-2)


class TestEquivalenceInterpret:
    def test_matches_dense_no_termination(self):
        cfg = _cfg(interpret=True, overrides=["kernels.early_term_eps=0.0"])
        params = _rand_params(cfg)
        rays_o, rays_d = _ray_fan()
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d)
        ref = _dense_reference(params, cfg, rays_o, rays_d)
        _assert_close(bw["fine"], ref)
        assert float(bw["fine"]["alive_frac"]) == 1.0

    def test_conditioned_matches_dense(self):
        # r3 (VERDICT r2 #4): cond is fused into the Pallas field — the
        # blockwise pipeline must match the dense renderer on a conditioned
        # model with a non-trivial per-ray cond
        cfg = _cfg(interpret=True, overrides=[
            "kernels.early_term_eps=0.0", "model.conditioned=true",
            "model.condition_dim=16"])
        params = _rand_params(cfg)
        rays_o, rays_d = _ray_fan(R=128)
        cond = jax.random.normal(jax.random.PRNGKey(5), (128, 16))
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                   cond=cond)
        ref = _dense_reference(params, cfg, rays_o, rays_d, cond=cond)
        _assert_close(bw["fine"], ref)

    def test_fused_carry_matches_two_stage(self):
        # r3 (VERDICT r2 next #1b): the carry-in-VMEM march
        # (kernels/blockmarch_pallas.py) is a drop-in for the two-stage
        # pipeline — same outputs up to the in-kernel fma ulp
        params = None
        outs = []
        for carry in (False, True):
            cfg = _cfg(interpret=True,
                       overrides=["kernels.early_term_eps=0.0",
                                  f"kernels.fused_carry="
                                  f"{'true' if carry else 'false'}"])
            if params is None:
                params = _rand_params(cfg)
            rays_o, rays_d = _ray_fan(R=128)
            bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d)
            outs.append(bw)
        # tolerance: in-kernel o + d·t rounds ~1 ulp differently than the
        # XLA-fused fma; posenc amplifies by 2^{L-1} and the coarse→fine CDF
        # resample re-amplifies on a random-init field (measured max: rgb
        # 3.8e-3, acc 7.2e-3). The trained-ckpt gates
        # (scripts/quality_check.py, TestTrainedTermination) hold the real
        # bound at the 60 dB level.
        np.testing.assert_allclose(np.asarray(outs[0]["fine"]["rgb"]),
                                   np.asarray(outs[1]["fine"]["rgb"]),
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(outs[0]["fine"]["acc"]),
                                   np.asarray(outs[1]["fine"]["acc"]),
                                   atol=2e-2)
        # the coarse pass (no resample amplification) agrees tightly
        np.testing.assert_allclose(np.asarray(outs[0]["coarse"]["rgb"]),
                                   np.asarray(outs[1]["coarse"]["rgb"]),
                                   atol=1e-3)

    def test_fused_carry_conditioned(self):
        # the carry march supports the fused cond path too
        cfg = _cfg(interpret=True, overrides=[
            "kernels.early_term_eps=0.0", "kernels.fused_carry=true",
            "model.conditioned=true", "model.condition_dim=16"])
        params = _rand_params(cfg)
        rays_o, rays_d = _ray_fan(R=128)
        cond = jax.random.normal(jax.random.PRNGKey(5), (128, 16))
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                   cond=cond)
        ref = _dense_reference(params, cfg, rays_o, rays_d, cond=cond)
        _assert_close(bw["fine"], ref)

    def test_eval_budget_override(self):
        # r3: RenderConfig.eval_n_* reduce the blockwise render budget
        # without touching the training sampling config — but ONLY under
        # occupancy culling (ADVICE r3: the reduced budget is justified by
        # per-ray sample concentration; without occ it silently halved the
        # budget over the full [near, far] range)
        cfg = _cfg(interpret=True, overrides=[
            "render.eval_n_coarse=16", "render.eval_n_fine=16",
            "kernels.early_term_eps=0.0", "occupancy.resolution=16"])
        params = _rand_params(cfg)
        rays_o, rays_d = _ray_fan(R=64)
        fused = make_fused_field(cfg)
        occ = build_from_config(cfg, functools.partial(fused,
                                                       params["fine"]))
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                   occ=occ)
        assert bw["coarse"]["weights"].shape[1] == 16
        assert bw["fine"]["weights"].shape[1] == 32   # 16 coarse + 16 fine
        # occupancy off ⇒ the override must NOT apply: full sampling budget
        bw0 = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d)
        assert bw0["coarse"]["weights"].shape[1] == cfg.sampling.n_coarse
        assert bw0["fine"]["weights"].shape[1] == (cfg.sampling.n_coarse
                                                   + cfg.sampling.n_fine)

    def test_fused_carry_conditioned_odd_tile_multiple(self):
        # regression (ADVICE r3): conditioned models run the carry kernel
        # with a HALVED tile; the alive_frac diagnostic derived its tile
        # width from the full tile, so R = an odd multiple of the halved
        # rays-per-tile (here 96 = 3·32 at SB=32) failed the reshape at
        # trace time — and grouped rays at the wrong width when R divided
        cfg = _cfg(interpret=True, overrides=[
            "kernels.early_term_eps=0.0", "kernels.fused_carry=true",
            "model.conditioned=true", "model.condition_dim=16"])
        params = _rand_params(cfg)
        rays_o, rays_d = _ray_fan(R=96)
        cond = jax.random.normal(jax.random.PRNGKey(5), (96, 16))
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                   cond=cond)
        assert np.isfinite(np.asarray(bw["fine"]["rgb"])).all()
        assert float(bw["fine"]["alive_frac"]) == 1.0

    def test_coarse_only(self):
        cfg = _cfg(interpret=True, overrides=["sampling.n_fine=0",
                                              "kernels.early_term_eps=0.0"])
        params = _rand_params(cfg)
        rays_o, rays_d = _ray_fan(R=64)
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d)
        assert bw["fine"] is None
        assert bw["coarse"]["rgb"].shape == (64, 3)
        assert np.isfinite(np.asarray(bw["coarse"]["rgb"])).all()

    def test_block_size_invariance(self):
        # SB=16 and SB=32 partition the same march — outputs must agree
        outs = []
        for sb in (16, 32):
            cfg = _cfg(interpret=True,
                       overrides=[f"kernels.block_samples={sb}",
                                  "kernels.early_term_eps=0.0"])
            params = _rand_params(cfg)
            rays_o, rays_d = _ray_fan(R=128)
            bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d)
            outs.append(np.asarray(bw["fine"]["rgb"]))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-4)


_HAS_ASSET = load_flagship() is not None


@pytest.mark.skipif(not _HAS_ASSET, reason="trained flagship asset missing")
class TestTrainedTermination:
    """On the committed trained weights: termination + occupancy culling must
    skip real work (alive_frac < 1) while holding the dense render's output
    (the VERDICT r1 #2 quality gate)."""

    def _setup(self, eps, use_occ):
        cfg = _cfg(interpret=True,
                   overrides=[f"kernels.early_term_eps={eps}",
                              "occupancy.enabled=true",
                              "occupancy.resolution=32"])
        params, _ = load_flagship()
        occ = None
        if use_occ:
            fused = make_fused_field(cfg)
            ff = functools.partial(fused, params["fine"])
            occ = build_from_config(cfg, ff)
        return cfg, params, occ

    def test_termination_holds_quality_and_skips(self):
        cfg, params, occ = self._setup(eps=1e-4, use_occ=True)
        # image-like scanline rays (the bench camera at low res): contiguous
        # pixel tiles include whole-background runs that miss the AABB and
        # interior runs that saturate — the geometry the skip targets. An
        # object-aimed analytic fan has neither (one straggler per 64-ray
        # tile keeps its whole tile alive; measured alive_frac 1.0).
        from fashion_nerf.core.cameras import generate_rays
        H = W = 64
        focal = 0.5 * W / np.tan(0.5 * 0.6911)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[2, 3] = 4.0
        ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
        rays_o, rays_d = ro.reshape(-1, 3), rd.reshape(-1, 3)
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                   occ=occ)
        cfg0, _, _ = self._setup(eps=0.0, use_occ=True)
        dense = render_rays_blockwise(params, cfg0, rays_o, rays_d, rays_d,
                                      occ=occ)
        p = float(psnr(bw["fine"]["rgb"], dense["fine"]["rgb"]))
        assert p > 40.0, f"terminated vs non-terminated PSNR {p:.1f} dB"
        # background tiles never launch; saturated tiles stop early
        assert float(bw["fine"]["alive_frac"]) < 0.9

    def test_macro_box_culling_holds_quality_and_skips_more(self):
        """r3 (VERDICT r2 #2): per-(ray, block) macro-box interval culling
        must agree with global-AABB culling on output while executing no
        MORE block work (interior empty blocks die)."""
        from fashion_nerf.core.cameras import generate_rays
        H = W = 64
        focal = 0.5 * W / np.tan(0.5 * 0.6911)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[2, 3] = 4.0
        ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
        rays_o, rays_d = ro.reshape(-1, 3), rd.reshape(-1, 3)
        outs, fracs = [], []
        for macro in (1, 4):
            cfg = _cfg(interpret=True,
                       overrides=["kernels.early_term_eps=1e-4",
                                  "occupancy.enabled=true",
                                  "occupancy.resolution=32",
                                  f"occupancy.macro={macro}"])
            params, _ = load_flagship()
            fused = make_fused_field(cfg)
            occ = build_from_config(cfg,
                                    functools.partial(fused, params["fine"]))
            bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                       occ=occ)
            outs.append(bw["fine"])
            fracs.append(float(bw["fine"]["alive_frac"]))
        p = float(psnr(outs[1]["rgb"], outs[0]["rgb"]))
        assert p > 40.0, f"macro vs global-AABB PSNR {p:.1f} dB"
        assert fracs[1] <= fracs[0] + 1e-6, fracs

    def test_padded_block_is_not_culled(self):
        """Regression (r3): a sample block whose tail is 0.0-position pad
        sentinels (budget not a multiple of SB) must use the MAX real t as
        its interval end for the macro-box test — the last-slot version
        culled every pad-ending block (−3.6 dB, and a fake speedup)."""
        from fashion_nerf.core.cameras import generate_rays
        H = W = 32
        focal = 0.5 * W / np.tan(0.5 * 0.6911)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[2, 3] = 4.0
        ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
        rays_o, rays_d = ro.reshape(-1, 3), rd.reshape(-1, 3)
        params, _ = load_flagship()
        outs = []
        for sb in (32, 64):       # coarse budget 32: SB=64 pads the block
            cfg = _cfg(interpret=True, overrides=[
                "kernels.early_term_eps=0.0",
                "occupancy.enabled=true", "occupancy.resolution=32",
                "occupancy.macro=4", "kernels.fused_carry=true",
                "sampling.n_coarse=32", "sampling.n_fine=32",
                f"kernels.block_samples={sb}"])
            fused = make_fused_field(cfg)
            occ = build_from_config(
                cfg, functools.partial(fused, params["fine"]))
            bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                       occ=occ)
            outs.append(bw["fine"])
        p = float(psnr(outs[1]["rgb"], outs[0]["rgb"]))
        assert p > 45.0, f"SB=64 (padded block) vs SB=32 PSNR {p:.1f} dB"

    def test_miss_rays_cost_nothing_and_render_background(self):
        cfg, params, occ = self._setup(eps=1e-4, use_occ=True)
        # a fan that entirely misses the scene box
        rays_o = jnp.broadcast_to(jnp.array([0.0, 3.5, 4.0]), (64, 3))
        rays_d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (64, 3))
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                   occ=occ)
        np.testing.assert_allclose(np.asarray(bw["fine"]["rgb"]), 1.0)
        np.testing.assert_allclose(np.asarray(bw["fine"]["acc"]), 0.0)
        assert float(bw["fine"]["alive_frac"]) == 0.0

    def test_whole_image_matches_standard_renderer(self):
        cfg, params, occ = self._setup(eps=1e-4, use_occ=True)
        H = W = 16
        focal, c2w = 20.0, np.eye(4, dtype=np.float32)[:3]
        c2w[2, 3] = 4.0
        img_bw = render_image_blockwise(params, cfg, H, W, focal,
                                        jnp.asarray(c2w), occ=occ)
        # reference: standard renderer, same fused field, occupancy culled
        from fashion_nerf.train.loop import make_fields
        field_c, field_f = make_fields(cfg)
        fc = functools.partial(field_c, params["coarse"])
        ff = functools.partial(field_f, params["fine"])
        img_ref = render_image(fc, ff, H, W, focal, jnp.asarray(c2w), cfg,
                               occ=occ)
        p = float(psnr(img_bw["rgb"], img_ref["rgb"]))
        assert p > 40.0, f"image blockwise vs renderer PSNR {p:.1f} dB"
        assert img_bw["rgb"].shape == (H, W, 3)


@pytest.mark.tpu
class TestCompiledTPU:
    def test_equivalence_compiled(self):
        cfg = _cfg(interpret=False, overrides=["kernels.early_term_eps=0.0"])
        params = _rand_params(cfg)
        rays_o, rays_d = _ray_fan(R=256)
        bw = jax.jit(lambda: render_rays_blockwise(
            params, cfg, rays_o, rays_d, rays_d))()
        ref = _dense_reference(params, cfg, rays_o, rays_d)
        _assert_close(bw["fine"], ref)

    @pytest.mark.skipif(not _HAS_ASSET, reason="asset missing")
    def test_fused_carry_compiled(self):
        # the default production march (r3): carry vs two-stage on the
        # trained ckpt, compiled — agreement must sit at the f32 level
        # after the precision=HIGHEST selector fix (BASELINE.md r3)
        params, _ = load_flagship()
        rays_o, rays_d = _ray_fan(R=1024)
        outs = []
        for carry in (False, True):
            cfg = _cfg(interpret=False,
                       overrides=["kernels.early_term_eps=1e-4",
                                  f"kernels.fused_carry="
                                  f"{'true' if carry else 'false'}"])
            bw = jax.jit(lambda cfg=cfg: render_rays_blockwise(
                params, cfg, rays_o, rays_d, rays_d))()
            outs.append(bw["fine"])
        p = float(psnr(outs[1]["rgb"], outs[0]["rgb"]))
        assert p > 60.0, f"carry vs two-stage PSNR {p:.1f} dB"

    @pytest.mark.skipif(not _HAS_ASSET, reason="asset missing")
    def test_trained_termination_compiled(self):
        cfg = _cfg(interpret=False,
                   overrides=["kernels.early_term_eps=1e-4",
                              "occupancy.enabled=true"])
        params, _ = load_flagship()
        fused = make_fused_field(cfg)
        # params traced, not constant-folded (zero-arg jit of the Pallas
        # lattice sweep SIGILLs the TPU compiler — occupancy.build_jit)
        from fashion_nerf.core.occupancy import build_jit
        occ = build_jit(cfg, fused, params["fine"])
        # image-like scanline rays (see the interpret twin for why a fan
        # aimed at the object cannot show tile-granular skipping)
        from fashion_nerf.core.cameras import generate_rays
        H = W = 64
        focal = 0.5 * W / np.tan(0.5 * 0.6911)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[2, 3] = 4.0
        ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
        rays_o, rays_d = ro.reshape(-1, 3), rd.reshape(-1, 3)
        bw = jax.jit(lambda: render_rays_blockwise(
            params, cfg, rays_o, rays_d, rays_d, occ=occ))()
        assert float(bw["fine"]["alive_frac"]) < 0.9
        assert np.isfinite(np.asarray(bw["fine"]["rgb"])).all()


class TestSampleWarp:
    """Occupancy-warped sampling (r4): stratified budget placed only in
    occupied bins of the union interval, integration widths capped at
    occupied-run ends (core/sampling.occupancy_bins et al.)."""

    def _setup(self, extra=()):
        cfg = _cfg(interpret=True, overrides=[
            "kernels.early_term_eps=0.0", "occupancy.resolution=16",
            "occupancy.macro=4", "occupancy.sample_warp=true",
            "occupancy.warp_bins=32"] + list(extra))
        params = _rand_params(cfg)
        fused = make_fused_field(cfg)
        occ = build_from_config(cfg, functools.partial(fused,
                                                       params["fine"]))
        return cfg, params, occ

    def test_warp_close_to_unwarped_blockwise(self):
        # warp changes sample PLACEMENT, not the integrand: on the same
        # honest macro-culled grid the warped and unwarped marches must
        # agree closely (a dense no-cull reference is NOT the right control
        # here — a random-init field carries sub-threshold fog over 98% of
        # the volume, which culling itself removes: measured acc 0.15 dense
        # vs 0.01 culled; the trained-ckpt 5-pose gate on-chip holds the
        # real production quality bound)
        cfg, params, occ = self._setup()
        rays_o, rays_d = _ray_fan(R=128)
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                   occ=occ)
        cfg0 = dataclasses_replace_warp(cfg, False)
        bw0 = render_rays_blockwise(params, cfg0, rays_o, rays_d, rays_d,
                                    occ=occ)
        p = float(psnr(bw["fine"]["rgb"], bw0["fine"]["rgb"]))
        assert p > 40.0, f"warped vs unwarped blockwise PSNR {p:.1f} dB"
        assert np.isfinite(np.asarray(bw["fine"]["rgb"])).all()

    def test_warp_matches_unwarped_when_fully_occupied(self):
        # a grid with every cell occupied has no gaps: caps are inactive
        # and warped placement is midpoint strata — same integral, so the
        # two paths agree tightly at a generous budget
        from fashion_nerf.core.occupancy import OccupancyState
        cfg, params, _ = self._setup(extra=["sampling.n_coarse=48",
                                            "sampling.n_fine=48"])
        g = cfg.occupancy.resolution
        grid = jnp.ones((g, g, g), bool)
        k = cfg.occupancy.macro
        m = g // k
        idx = jnp.stack(jnp.meshgrid(*[jnp.arange(k)] * 3,
                                     indexing="ij"), -1).reshape(-1, 3)
        cell = 4.0 / g
        bmin = -2.0 + idx.astype(jnp.float32) * (m * cell)
        bmax = bmin + m * cell
        occ = OccupancyState(
            box_min=jnp.full((3,), -2.0), box_max=jnp.full((3,), 2.0),
            grid=grid, boxes_min=bmin, boxes_max=bmax,
            boxes_occ=jnp.ones((k ** 3,), bool))
        rays_o, rays_d = _ray_fan(R=128)
        bw_w = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                     occ=occ)
        cfg0 = dataclasses_replace_warp(cfg, False)
        bw_0 = render_rays_blockwise(params, cfg0, rays_o, rays_d, rays_d,
                                     occ=occ)
        p = float(psnr(bw_w["fine"]["rgb"], bw_0["fine"]["rgb"]))
        assert p > 35.0, f"warp vs unwarped on full occupancy: {p:.1f} dB"

    def test_warp_budget_override_shapes(self):
        cfg, params, occ = self._setup(extra=["render.eval_n_coarse=16",
                                              "render.eval_n_fine=16"])
        rays_o, rays_d = _ray_fan(R=64)
        bw = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d,
                                   occ=occ)
        assert bw["coarse"]["weights"].shape[1] == 16
        assert bw["fine"]["weights"].shape[1] == 32


def dataclasses_replace_warp(cfg, value: bool):
    import dataclasses
    return dataclasses.replace(
        cfg, occupancy=dataclasses.replace(cfg.occupancy,
                                           sample_warp=value))
