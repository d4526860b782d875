"""Slim carry march (kernels/slimmarch_pallas.py, r5) vs the generic carry
march on the same nets — the SURVEY §4.3 equivalence discipline: interpret
mode on CPU, compiled under the TPU marker. The slim kernel changes the
pts/posenc/trunk-x association ((o+d·t)@W → o@W + (d@W)·t, f32 HIGHEST
instead of bf16) so agreement is bounded like the existing carry-vs-two-stage
and sigmamarch tolerances (~1e-4/pass amplified by the posenc)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashion_nerf.assets import load_flagship
from fashion_nerf.config import load_config
from fashion_nerf.models.nerf_mlp import init_field

_HAS_ASSET = load_flagship() is not None


def _cfg(interpret=True, ovr=()):
    return load_config("blender_lego", [
        "kernels.use_pallas=true",
        f"kernels.interpret={'true' if interpret else 'false'}",
        "kernels.fused_carry=true", "kernels.early_term_eps=0.0",
        "sampling.n_coarse=32", "sampling.n_fine=64",
        "render.eval_n_coarse=0", "render.eval_n_fine=0",
        "proposal.enabled=false", "occupancy.enabled=false",
    ] + list(ovr))


def _rays(R=256, z=4.0, spread=0.45):
    ang = jnp.linspace(-spread, spread, R)
    rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, z]), (R, 3))
    rays_d = jnp.stack([jnp.sin(ang), jnp.zeros_like(ang),
                        -jnp.cos(ang)], -1)
    return rays_o, rays_d


def _seg_for(rays_o, rays_d, cfg):
    """Macro-box style segments so block_hit predication paths execute."""
    from fashion_nerf.core.occupancy import ray_aabb_intersect
    R = rays_o.shape[0]
    lo = jnp.full((3,), -0.9)
    hi = jnp.full((3,), 0.9)
    near, far, hit = ray_aabb_intersect(rays_o, rays_d, lo, hi, 2.0, 6.0)
    return (near[:, None], far[:, None], hit[:, None]), hit


def _march_both(cfg, params, rays_o, rays_d, cond=None, seg=None,
                alive0=None, n=None, eps=None):
    """Run ONE pass through the slim and the generic carry kernels."""
    from fashion_nerf.core.sampling import stratified_sample
    from fashion_nerf.kernels.posenc_mlp_pallas import make_block_evaluator
    from fashion_nerf.render.blockwise import (_marched_pass_carry,
                                               _marched_pass_slim)

    R = rays_o.shape[0]
    n = n or cfg.sampling.n_fine
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t_vals = stratified_sample(jax.random.PRNGKey(0), 2.0, 6.0, R, n,
                               perturb=False)
    if alive0 is None:
        alive0 = jnp.ones((R,), bool)
    if eps is not None:
        cfg = dataclasses.replace(
            cfg, kernels=dataclasses.replace(cfg.kernels,
                                             early_term_eps=eps))

    pack, hoist_dirs, hoist_cond, _eb, _rpt = make_block_evaluator(cfg)
    packed = pack(params)
    dirpart = hoist_dirs(packed, rays_d)
    condpart = hoist_cond(packed, cond)
    args = (packed, dirpart, condpart, rays_o, rays_d, t_vals, dnorm,
            alive0, cfg)
    slim = _marched_pass_slim(*args, t_end=6.0, seg=seg)
    gen = _marched_pass_carry(*args, t_end=6.0, seg=seg)
    return slim, gen


def _assert_close(slim, gen, atol=2e-3):
    for k in ("rgb", "depth", "acc", "weights"):
        np.testing.assert_allclose(np.asarray(slim[k]), np.asarray(gen[k]),
                                   atol=atol, err_msg=k)


def _oracle(cfg, params, rays_o, rays_d, n=None):
    """f32 XLA field + volrend on the same samples — the precision referee
    when slim and generic disagree (they take different bf16/f32 paths)."""
    from fashion_nerf.core.sampling import stratified_sample
    from fashion_nerf.core.volrend import volume_render
    from fashion_nerf.models.nerf_mlp import make_field
    R = rays_o.shape[0]
    n = n or cfg.sampling.n_fine
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t_vals = stratified_sample(jax.random.PRNGKey(0), 2.0, 6.0, R, n,
                               perturb=False)
    _, field = make_field(cfg.model)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t_vals[:, :, None]
    rgb_s, sigma = field(params, pts, rays_d, None)
    return volume_render(rgb_s, sigma, t_vals, dnorm,
                         white_bkgd=cfg.render.white_bkgd,
                         sigma_activation=cfg.model.sigma_activation,
                         t_end=6.0)


class TestSlimMarchInterpret:
    def test_matches_generic_full_plan(self):
        """Canonical 8×256 skip + heads_vd plan (the fine net) on a random
        init: rgb/depth/acc/weights must match the generic carry march."""
        cfg = _cfg()
        params = init_field(jax.random.PRNGKey(1), cfg.model)
        rays_o, rays_d = _rays()
        slim, gen = _march_both(cfg, params, rays_o, rays_d)
        _assert_close(slim, gen)

    def test_matches_generic_trained(self):
        """The committed trained flagship (real density structure, multiple
        blocks, white bkgd compositing). The two kernels take different
        precision paths — generic builds pts in-kernel and runs x@Wx in bf16;
        slim hoists o@Wx + (d@Wx)·t at f32 HIGHEST — so the referee is the
        f32 XLA oracle: slim must sit AT LEAST as close to it as generic
        does (measured: slim rgb 0.015 vs generic 0.037)."""
        if not _HAS_ASSET:
            pytest.skip("trained flagship asset missing")
        cfg = _cfg()
        params, _ = load_flagship()
        rays_o, rays_d = _rays()
        slim, gen = _march_both(cfg, params["fine"], rays_o, rays_d)
        _assert_close(slim, gen, atol=5e-2)
        oracle = _oracle(cfg, params["fine"], rays_o, rays_d)
        for k in ("rgb", "acc", "weights"):
            ds = float(np.abs(np.asarray(slim[k])
                              - np.asarray(oracle[k])).max())
            dg = float(np.abs(np.asarray(gen[k])
                              - np.asarray(oracle[k])).max())
            assert ds <= max(dg * 1.25, 2e-3), (k, ds, dg)

    def test_matches_generic_with_seg_and_termination(self):
        """Predication parity: macro-segment block_hit kills + ε-termination
        must fire identically (same blocks skipped → same zeros)."""
        if not _HAS_ASSET:
            pytest.skip("trained flagship asset missing")
        cfg = _cfg()
        params, _ = load_flagship()
        rays_o, rays_d = _rays()
        seg, hit = _seg_for(rays_o, rays_d, cfg)
        slim, gen = _march_both(cfg, params["fine"], rays_o, rays_d,
                                seg=seg, alive0=hit, eps=1e-3)
        # values within the cross-precision family bound (see
        # test_matches_generic_trained); predication — which (ray, block)s
        # got skipped — must agree EXACTLY via the executed-block
        # diagnostics (elementwise zero-pattern equality is too strict:
        # measured 1/16384 straggler where a ~3e-7 weight rounds to exact
        # zero on one precision path but not the other)
        _assert_close(slim, gen, atol=5e-2)
        assert float(slim["alive_frac"]) == float(gen["alive_frac"])
        assert float(slim["ideal_frac"]) == float(gen["ideal_frac"])

    def test_conditioned_plan_folds_cond(self):
        """Conditioned trunk (first_c/skip_c): the slim kernel folds the
        condpart into the hoisted intercepts — must match the generic
        kernel's in-kernel cond expand."""
        cfg = _cfg(ovr=("model.conditioned=true", "model.condition_dim=16"))
        params = init_field(jax.random.PRNGKey(2), cfg.model, cond_dim=16)
        R = 128
        rays_o, rays_d = _rays(R)
        cond = jax.random.normal(jax.random.PRNGKey(5), (R, 16))
        slim, gen = _march_both(cfg, params, rays_o, rays_d, cond=cond)
        _assert_close(slim, gen)

    def test_dead_rays_write_zeros(self):
        cfg = _cfg()
        params = init_field(jax.random.PRNGKey(1), cfg.model)
        rays_o, rays_d = _rays()
        alive0 = jnp.zeros((rays_o.shape[0],), bool)
        slim, _ = _march_both(cfg, params, rays_o, rays_d, alive0=alive0)
        np.testing.assert_array_equal(np.asarray(slim["weights"]), 0.0)
        np.testing.assert_array_equal(np.asarray(slim["acc"]), 0.0)
        # white_bkgd: fully-dead rays composite to exact background
        np.testing.assert_allclose(np.asarray(slim["rgb"]), 1.0, atol=1e-6)

    def test_renderer_routes_hoist_flag(self):
        """render_rays_blockwise with kernels.carry_hoist on/off must agree
        end-to-end (coarse PDF → fine render) on the trained ckpt."""
        if not _HAS_ASSET:
            pytest.skip("trained flagship asset missing")
        from fashion_nerf.metrics import psnr
        from fashion_nerf.render.blockwise import render_rays_blockwise
        cfg = _cfg()
        params, _ = load_flagship()
        rays_o, rays_d = _rays()
        cfg_h = dataclasses.replace(
            cfg, kernels=dataclasses.replace(cfg.kernels, carry_hoist=True))
        out_h = render_rays_blockwise(params, cfg_h, rays_o, rays_d, rays_d)
        cfg_g = dataclasses.replace(
            cfg, kernels=dataclasses.replace(cfg.kernels,
                                             carry_hoist=False))
        out_g = render_rays_blockwise(params, cfg_g, rays_o, rays_d, rays_d)
        p = float(psnr(out_h["fine"]["rgb"], out_g["fine"]["rgb"]))
        assert p > 40.0, f"hoist vs generic end-to-end {p:.1f} dB"


@pytest.mark.tpu
class TestSlimMarchCompiledTPU:
    def test_matches_generic_compiled(self):
        # trained ckpt: cross-precision family bound (slim hoists x@Wx to
        # f32 HIGHEST; generic runs it bf16 in-kernel — see the interpret
        # trained test's oracle triangulation) + exact predication parity
        cfg = _cfg(interpret=False)
        params, _ = load_flagship()
        rays_o, rays_d = _rays()
        seg, hit = _seg_for(rays_o, rays_d, cfg)
        slim, gen = _march_both(cfg, params["fine"], rays_o, rays_d,
                                seg=seg, alive0=hit, eps=1e-3)
        _assert_close(slim, gen, atol=5e-2)
        assert float(slim["alive_frac"]) == float(gen["alive_frac"])
        assert float(slim["ideal_frac"]) == float(gen["ideal_frac"])

    def test_conditioned_compiled(self):
        # random init: 5e-3 matches the sigmamarch compiled bound (measured
        # worst: depth 2.04e-3 — MXU bf16 vs interpret f32 emulation)
        cfg = _cfg(interpret=False,
                   ovr=("model.conditioned=true", "model.condition_dim=16"))
        params = init_field(jax.random.PRNGKey(2), cfg.model, cond_dim=16)
        R = 128
        rays_o, rays_d = _rays(R)
        cond = jax.random.normal(jax.random.PRNGKey(5), (R, 16))
        slim, gen = _march_both(cfg, params, rays_o, rays_d, cond=cond)
        _assert_close(slim, gen, atol=5e-3)
