"""Slim σ-only proposal march (kernels/sigmamarch_pallas.py, r4) vs the
generic carry march on the same proposal net — the SURVEY §4.3 equivalence
discipline: interpret mode on CPU, compiled under the TPU marker. The slim
kernel changes the pts/posenc association ((o+d·t)·f → o·f + (d·f)·t) and
keeps the trunk-x path in f32, so agreement is bounded like the existing
carry-vs-two-stage tolerance (~1e-4/pass amplified by the posenc)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashion_nerf.assets import load_flagship
from fashion_nerf.config import load_config
from fashion_nerf.models.proposal import (init_proposal,
                                          proposal_model_config)

_HAS_ASSET = load_flagship() is not None


def _cfg(interpret=True, ovr=()):
    return load_config("blender_lego", [
        "kernels.use_pallas=true",
        f"kernels.interpret={'true' if interpret else 'false'}",
        "kernels.fused_carry=true", "kernels.early_term_eps=0.0",
        "sampling.n_coarse=32", "sampling.n_fine=32",
        "render.eval_n_coarse=0", "render.eval_n_fine=0",
        "proposal.eval_n=64", "proposal.block_samples=64",
    ] + list(ovr))


def _rays(R=256, z=4.0, spread=0.45):
    ang = jnp.linspace(-spread, spread, R)
    rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, z]), (R, 3))
    rays_d = jnp.stack([jnp.sin(ang), jnp.zeros_like(ang),
                        -jnp.cos(ang)], -1)
    return rays_o, rays_d


def _march_both(cfg, prop_params, rays_o, rays_d, seg=None, alive0=None):
    """Run the SAME proposal pass through the slim kernel and the generic
    carry kernel; return both output dicts."""
    from fashion_nerf.core.sampling import stratified_sample
    from fashion_nerf.kernels.posenc_mlp_pallas import make_block_evaluator
    from fashion_nerf.kernels.sigmamarch_pallas import hoist_rays, pack_sigma
    from fashion_nerf.render.blockwise import (_marched_pass_carry,
                                               _sigma_march_pass)

    pm = proposal_model_config(cfg)
    R = rays_o.shape[0]
    n = cfg.proposal.eval_n
    SB = cfg.proposal.block_samples
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t_vals = stratified_sample(jax.random.PRNGKey(0), 2.0, 6.0, R, n,
                               perturb=False)
    if alive0 is None:
        alive0 = jnp.ones((R,), bool)

    Wx, b0, arrs, n_plain = pack_sigma(prop_params, pm)
    hoists = hoist_rays(Wx, b0, rays_o, rays_d, pm.posenc_xyz)
    slim = _sigma_march_pass((Wx, b0, arrs, n_plain, hoists), rays_o,
                             rays_d, t_vals, dnorm, alive0, cfg, t_end=6.0,
                             seg=seg, L=pm.posenc_xyz, sb=SB)

    pack, hoist_dirs, _hc, _eb, _rpt = make_block_evaluator(cfg, mcfg=pm)
    packed = pack(prop_params)
    dirpart = hoist_dirs(packed, rays_d)
    gen = _marched_pass_carry(packed, dirpart, None, rays_o, rays_d, t_vals,
                              dnorm, alive0, cfg, t_end=6.0, seg=seg,
                              L=pm.posenc_xyz, sb=SB)
    return slim, gen


class TestSigmaMarchInterpret:
    def test_matches_generic_carry(self):
        """Weights/acc from the slim kernel must match the generic carry
        march on the same random proposal net."""
        cfg = _cfg()
        prop = init_proposal(jax.random.PRNGKey(3), cfg)
        rays_o, rays_d = _rays()
        slim, gen = _march_both(cfg, prop, rays_o, rays_d)
        np.testing.assert_allclose(np.asarray(slim["weights"]),
                                   np.asarray(gen["weights"]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(slim["acc"]),
                                   np.asarray(gen["acc"]), atol=2e-3)

    def test_dead_rays_write_zeros(self):
        """Tiles whose rays are all culled must produce exact-zero weights
        and acc (the cull_acc consumer) — not NaN canaries."""
        cfg = _cfg()
        prop = init_proposal(jax.random.PRNGKey(3), cfg)
        rays_o, rays_d = _rays()
        R = rays_o.shape[0]
        alive0 = jnp.zeros((R,), bool)
        slim, _ = _march_both(cfg, prop, rays_o, rays_d, alive0=alive0)
        np.testing.assert_array_equal(np.asarray(slim["weights"]), 0.0)
        np.testing.assert_array_equal(np.asarray(slim["acc"]), 0.0)

    def test_renderer_routes_slim_and_matches_generic(self):
        """render_rays_blockwise with proposal.sigma_march on/off: identical
        sampling decisions, fine renders at the cross-path tolerance."""
        if not _HAS_ASSET:
            pytest.skip("trained flagship asset missing")
        from fashion_nerf.metrics import psnr
        from fashion_nerf.render.blockwise import render_rays_blockwise
        cfg = _cfg(ovr=("proposal.distill_steps=120",
                        "proposal.distill_batch=2048",
                        "occupancy.resolution=32"))
        params, _ = load_flagship()
        from fashion_nerf.core.occupancy import build_from_config
        from fashion_nerf.models.nerf_mlp import make_field
        from fashion_nerf.models.proposal import attach_proposal
        _, field = make_field(cfg.model)
        occ = build_from_config(cfg, functools.partial(field,
                                                       params["fine"]))
        with_prop = attach_proposal(cfg, dict(params), occ=occ,
                                    allow_distill=True, use_asset=False)
        assert "proposal" in with_prop
        rays_o, rays_d = _rays()

        out_slim = render_rays_blockwise(with_prop, cfg, rays_o, rays_d,
                                         rays_d, occ=occ)
        cfg_gen = dataclasses.replace(
            cfg, proposal=dataclasses.replace(cfg.proposal,
                                              sigma_march=False))
        out_gen = render_rays_blockwise(with_prop, cfg_gen, rays_o, rays_d,
                                        rays_d, occ=occ)
        p = float(psnr(out_slim["fine"]["rgb"], out_gen["fine"]["rgb"]))
        assert p > 40.0, f"slim vs generic prop-driven render {p:.1f} dB"
        np.testing.assert_allclose(np.asarray(out_slim["coarse"]["acc"]),
                                   np.asarray(out_gen["coarse"]["acc"]),
                                   atol=5e-3)

    def test_shape_gate_falls_back(self):
        """eval_n > block_samples (NB > 1) must route the generic kernel —
        the slim kernel is single-block by design."""
        if not _HAS_ASSET:
            pytest.skip("trained flagship asset missing")
        from fashion_nerf.render.blockwise import render_rays_blockwise
        cfg = _cfg(ovr=("proposal.eval_n=64", "proposal.block_samples=32",
                        "proposal.distill_steps=60",
                        "proposal.distill_batch=1024"))
        params, _ = load_flagship()
        from fashion_nerf.models.proposal import attach_proposal
        with_prop = attach_proposal(cfg, dict(params), allow_distill=True,
                                    use_asset=False)
        rays_o, rays_d = _rays()
        out = render_rays_blockwise(with_prop, cfg, rays_o, rays_d, rays_d)
        assert out["coarse"]["weights"].shape[1] == 64


@pytest.mark.tpu
class TestSigmaMarchCompiledTPU:
    def test_matches_generic_compiled(self):
        cfg = _cfg(interpret=False)
        prop = init_proposal(jax.random.PRNGKey(3), cfg)
        rays_o, rays_d = _rays()
        slim, gen = _march_both(cfg, prop, rays_o, rays_d)
        np.testing.assert_allclose(np.asarray(slim["weights"]),
                                   np.asarray(gen["weights"]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(slim["acc"]),
                                   np.asarray(gen["acc"]), atol=2e-3)
