"""σ-only proposal field (models/proposal.py, r4 — VERDICT r3 #1): the tiny
distilled net that replaces the full-MLP coarse pass at render time. CPU
hermetic: distillation against the analytic procedural field, and — with the
committed flagship asset — PDF agreement + end-to-end blockwise equivalence
against the full coarse pass (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashion_nerf.assets import load_flagship
from fashion_nerf.config import load_config
from fashion_nerf.models.proposal import (attach_proposal, distill_proposal,
                                          init_proposal,
                                          proposal_model_config)


def _cfg(ovr=()):
    return load_config("blender_lego", [
        "kernels.use_pallas=true", "kernels.interpret=true",
        "sampling.n_coarse=32", "sampling.n_fine=32",
        "render.eval_n_coarse=0", "render.eval_n_fine=0",
        "kernels.fused_carry=false", "kernels.early_term_eps=0.0",
        # CPU-sized distillation budget (the production 600×8192 runs
        # on-chip at render setup)
        "proposal.distill_steps=120", "proposal.distill_batch=2048",
        "proposal.eval_n=32",
    ] + list(ovr))


def test_proposal_plan_is_kernel_compatible():
    """The proposal net must flow through the existing Pallas plan machinery
    unchanged: tiny trunk, no view branch, no cond rows."""
    cfg = _cfg()
    pm = proposal_model_config(cfg)
    params = init_proposal(jax.random.PRNGKey(0), cfg)
    from fashion_nerf.kernels.posenc_mlp_pallas import pack_params
    arrs, plan, dir_k, cond_k = pack_params(params, pm)
    assert plan == ("first", "plain", "heads_plain")
    assert dir_k is None and cond_k is None
    # first: Wx (3,W) + Wsc (2·3·L,W) + bias; plain: (W,W) + bias; head
    assert arrs[0].shape == (3, cfg.proposal.net_width)
    assert arrs[1].shape == (6 * cfg.proposal.posenc_xyz,
                             cfg.proposal.net_width)


def test_distill_fits_analytic_teacher():
    """Distillation must actually fit σ: log-density MSE on held-out points
    far below the teacher's own variance (an untrained net fails this)."""
    cfg = _cfg()
    from fashion_nerf.data.synthetic import field_jnp

    def teacher(pts, dirs, cond):
        rgb, sigma = field_jnp(pts, scale=0.5, sharp=25.0)
        return rgb, sigma          # relu convention: σ ≥ 0 is its own raw

    # tight sampling box, as production passes the occupancy AABB
    prop = distill_proposal(cfg, teacher, jax.random.PRNGKey(0),
                            box_min=-1.2 * np.ones(3),
                            box_max=1.2 * np.ones(3))

    from fashion_nerf.models.nerf_mlp import make_field
    _, pfield = make_field(proposal_model_config(cfg))
    k = jax.random.PRNGKey(99)
    pts = jax.random.uniform(k, (4096, 1, 3), minval=-1.2, maxval=1.2)
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (4096, 3))
    _, s_t = teacher(pts, dirs, None)
    _, s_p = pfield(prop, pts, dirs, None)
    y = np.log1p(np.maximum(np.asarray(s_t[:, 0]), 0.0))
    yp = np.log1p(np.maximum(np.asarray(s_p[:, 0]), 0.0))
    mse = float(np.mean((y - yp) ** 2))
    var = float(np.var(y))
    assert var > 0.01              # the teacher is not degenerate
    assert mse < 0.35 * var, (mse, var)


def test_asset_rejects_equal_mass_teacher(tmp_path, monkeypatch):
    """VERDICT r4 weak #2: the asset fingerprint must reject a retrained
    teacher even when its abs-weight-sum matches the committed one exactly
    (the old float signature accepted any tree within 1e-2 of the sum)."""
    import fashion_nerf.assets as assets_mod
    from fashion_nerf.models.proposal import (_teacher_signature,
                                              save_proposal_asset)

    cfg = _cfg(("proposal.distill_steps=1",))
    key = jax.random.PRNGKey(3)
    prop = init_proposal(key, cfg)
    from fashion_nerf.models.nerf_mlp import init_field
    fine = init_field(jax.random.PRNGKey(4), cfg.model)
    teacher = {"fine": fine}

    monkeypatch.setattr(assets_mod, "ASSETS_DIR", str(tmp_path))
    save_proposal_asset(cfg, prop, fine,
                        path=str(tmp_path / "proposal_synthetic.npz"))

    # exact teacher → asset accepted, no distillation
    out = attach_proposal(cfg, dict(teacher), allow_distill=False)
    assert "proposal" in out

    # perturb two weights by ±δ keeping both positive: abs-sum UNCHANGED,
    # content different — must be rejected
    k0 = np.asarray(fine["params"]["trunk_0"]["kernel"]).copy()
    pos = np.argwhere(k0 > 0.05)
    (i0, j0), (i1, j1) = pos[0], pos[1]
    delta = 0.01
    k1 = k0.copy()
    k1[i0, j0] += delta
    k1[i1, j1] -= delta
    assert abs(np.abs(k1).sum() - np.abs(k0).sum()) < 1e-6
    fine2 = jax.tree_util.tree_map(lambda x: x, fine)
    fine2["params"]["trunk_0"]["kernel"] = jnp.asarray(k1)
    assert _teacher_signature(fine2) != _teacher_signature(fine)
    out2 = attach_proposal(cfg, {"fine": fine2}, allow_distill=False)
    assert "proposal" not in out2


_HAS_ASSET = load_flagship() is not None


@functools.lru_cache(maxsize=1)
def _trained_setup():
    """One CPU distillation shared by every test in the class (module-level
    lru_cache: pytest makes a fresh instance per test, so a method-level
    cache would re-distill ~3×)."""
    cfg = _cfg(("occupancy.resolution=32",))
    params, _ = load_flagship()
    # production always distills inside the occupancy AABB (bench/CLI pass
    # occ): uniform sampling of the full ±2 world box would spend ~99% of
    # points where the teacher is empty and underfit the object
    from fashion_nerf.models.nerf_mlp import make_field
    from fashion_nerf.core.occupancy import build_from_config
    _, field = make_field(cfg.model)
    occ = build_from_config(cfg, functools.partial(field, params["fine"]))
    with_prop = attach_proposal(cfg, dict(params), occ=occ,
                                allow_distill=True)
    assert "proposal" in with_prop
    return cfg, params, with_prop


@pytest.mark.skipif(not _HAS_ASSET, reason="trained flagship asset missing")
class TestProposalBlockwise:
    """On the committed trained weights: the proposal-driven coarse pass must
    agree with the full-MLP coarse pass — PDF placement (VERDICT r3 #1's
    agreement gate) and the final fine render."""

    def _setup(self):
        return _trained_setup()

    def _rays(self, R=256):
        from fashion_nerf.core.cameras import generate_rays
        H = W = 16
        focal = 0.5 * W / np.tan(0.5 * 0.6911)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[2, 3] = 4.0
        ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
        return ro.reshape(-1, 3), rd.reshape(-1, 3)

    def test_pdf_agreement_and_render(self):
        from fashion_nerf.render.blockwise import render_rays_blockwise
        from fashion_nerf.metrics import psnr
        cfg, params, with_prop = self._setup()
        rays_o, rays_d = self._rays()

        out_full = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d)
        out_prop = render_rays_blockwise(with_prop, cfg, rays_o, rays_d,
                                         rays_d)
        # non-union: PDF samples + the thin stratified coverage set
        assert out_prop["fine"]["weights"].shape[1] == (
            cfg.sampling.n_fine + cfg.proposal.cov_n)
        assert out_full["fine"]["weights"].shape[1] == (
            cfg.sampling.n_coarse + cfg.sampling.n_fine)

        # PDF agreement: expected depth under the coarse weights must match
        # between the full coarse net and the distilled proposal on rays
        # that carry real mass (the surface-localization job)
        def exp_depth(out):
            w = np.asarray(out["coarse"]["weights"])
            S = w.shape[1]
            t = np.linspace(2.0, 6.0, S, dtype=np.float32)
            wsum = w.sum(1)
            return w @ t / np.maximum(wsum, 1e-8), wsum

        d_full, m_full = exp_depth(out_full)
        d_prop, _ = exp_depth(out_prop)
        solid = m_full > 0.5
        assert solid.sum() > 20      # the 16×16 crop sees the object
        err = np.abs(d_full[solid] - d_prop[solid])
        assert float(err.mean()) < 0.12, float(err.mean())

        # end-to-end: the fine render driven by the proposal PDF must
        # reproduce the full-coarse render (same fine net, same budget)
        p = float(psnr(out_prop["fine"]["rgb"], out_full["fine"]["rgb"]))
        assert p > 26.0, f"proposal vs full-coarse fine render {p:.1f} dB"

    def test_absent_key_is_exact_fallback(self):
        """Without params['proposal'] the renderer must run the unchanged
        full coarse pass — not crash, not silently change budgets."""
        from fashion_nerf.render.blockwise import render_rays_blockwise
        cfg, params, _ = self._setup()
        rays_o, rays_d = self._rays()
        out = render_rays_blockwise(params, cfg, rays_o, rays_d, rays_d)
        assert out["coarse"]["weights"].shape[1] == cfg.sampling.n_coarse
        assert out["fine"]["weights"].shape[1] == (
            cfg.sampling.n_coarse + cfg.sampling.n_fine)

    def test_union_mode(self):
        from fashion_nerf.render.blockwise import render_rays_blockwise
        cfg, _, with_prop = self._setup()
        import dataclasses
        cfg_u = dataclasses.replace(
            cfg, proposal=dataclasses.replace(cfg.proposal, union=True))
        rays_o, rays_d = self._rays()
        out = render_rays_blockwise(with_prop, cfg_u, rays_o, rays_d, rays_d)
        assert out["fine"]["weights"].shape[1] == (
            cfg.proposal.eval_n + cfg.sampling.n_fine)


@pytest.mark.skipif(not _HAS_ASSET, reason="trained flagship asset missing")
class TestProposalAccCull:
    """ProposalConfig.cull_acc (r4): rays whose proposal march finds an
    empty chord skip the full-MLP fine march and composite to background."""

    def _rays(self):
        from fashion_nerf.core.cameras import generate_rays
        H = W = 16
        focal = 0.5 * W / np.tan(0.5 * 0.6911)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[2, 3] = 4.0
        ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
        return ro.reshape(-1, 3), rd.reshape(-1, 3)

    def test_cull_all_is_background(self):
        import dataclasses
        from fashion_nerf.render.blockwise import render_rays_blockwise
        cfg, _, with_prop = _trained_setup()
        cfg_c = dataclasses.replace(
            cfg, proposal=dataclasses.replace(cfg.proposal, cull_acc=1e9))
        rays_o, rays_d = self._rays()
        out = render_rays_blockwise(with_prop, cfg_c, rays_o, rays_d,
                                    rays_d)
        bg = 1.0 if cfg.render.white_bkgd else 0.0
        np.testing.assert_allclose(np.asarray(out["fine"]["rgb"]), bg,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["fine"]["acc"]), 0.0,
                                   atol=1e-6)

    def test_small_threshold_matches_uncull(self):
        import dataclasses
        from fashion_nerf.metrics import psnr
        from fashion_nerf.render.blockwise import render_rays_blockwise
        cfg, _, with_prop = _trained_setup()
        rays_o, rays_d = self._rays()
        out0 = render_rays_blockwise(with_prop, cfg, rays_o, rays_d, rays_d)
        cfg_c = dataclasses.replace(
            cfg, proposal=dataclasses.replace(cfg.proposal, cull_acc=1e-3))
        out1 = render_rays_blockwise(with_prop, cfg_c, rays_o, rays_d,
                                     rays_d)
        # only ~zero-contribution rays differ: the render is unchanged at
        # far better than the production gate resolution
        p = float(psnr(out1["fine"]["rgb"], out0["fine"]["rgb"]))
        assert p > 45.0, f"cull_acc=1e-3 vs uncull {p:.1f} dB"
        # and something was actually cullable on this crop (object + bkgd)
        a0 = np.asarray(out0["coarse"]["acc"])
        assert (a0 <= 1e-3).sum() > 0
