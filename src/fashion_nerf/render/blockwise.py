"""Blockwise early-terminated rendering — the sample-work-reduction engine.

The physics (VERDICT r1, BASELINE.json:5): dense 256-eval/ray rendering caps
at ~650k rays/s on v5e even at perfect MFU; the 10M north star requires NOT
EVALUATING most samples. XLA cannot express that (static dense dataflow), so
this pipeline iterates sample-blocks inside one jit: each block runs the
fused posenc+MLP Pallas kernel with a per-tile ALIVE flag — tiles whose rays
are all terminated (transmittance < ε) or culled (missed the occupancy box)
skip their entire MXU workload via scalar predication — and a cheap XLA
transmittance-carry update runs between blocks. Marching is front-to-back,
so saturated tiles stop paying for the samples behind the surface; occupancy
culling (core/occupancy.py) zeroes the cost of background tiles outright and
concentrates each ray's static budget inside its occupied interval.

Design choice vs a monolithic megakernel: the MLP wants rows-of-features
layout, the transmittance scan wants rays×samples — fusing them in one
kernel forces an in-kernel relayout, while the HBM traffic between the two
stages is ~200 MB/frame ≈ 0.25 ms at v5e bandwidth, i.e. free. The win is
skipped FLOPs, not avoided traffic, and per-tile predication captures all of
it. (Long-ray/SP story: the same carry structure is what dist/segmented.py
rings across chips — SURVEY.md §5.7.)

Eval/render only (deterministic sampling, no σ-noise); training keeps the
dense differentiable path (train/loop.py). Reference@v1 ships no renderer at
all (/root/reference/README.md:1-2); the early-termination pattern follows
NerfAcc (PAPERS.md) re-thought for static shapes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from fashion_nerf.config import Config
from fashion_nerf.core.cameras import generate_rays, ndc_rays
from fashion_nerf.core.occupancy import ray_aabb_intersect
from fashion_nerf.core.sampling import sample_pdf, stratified_sample

_LOG_FLOOR = -23.025851   # log(1e-10): mirrors core.volrend's cumprod clamp
_INF_DIST = 1e10


def _pad_axis(x, mult: int, axis: int, value=0.0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pass_dists(t_vals, dnorm, t_end, SB, cap=None):
    """Per-sample integration widths (∞ or t_end on the last) padded to a
    block multiple with zero-width sentinels, plus padded t.

    cap: optional (R, S) occupied-run end per sample (core/sampling
    .delta_caps): widths are clamped so no interval spans a culled gap
    between occupied segments — without it, a sample at a run end
    overintegrates its σ across the (never-evaluated) gap to the next run."""
    R, S = t_vals.shape
    if t_end is None:
        upper_last = t_vals[:, -1:] + _INF_DIST
    else:
        upper_last = jnp.maximum(jnp.broadcast_to(
            jnp.asarray(t_end, t_vals.dtype), (R, 1)), t_vals[:, -1:])
    upper = jnp.concatenate([t_vals[:, 1:], upper_last], axis=1)
    if cap is not None:
        upper = jnp.minimum(upper, jnp.maximum(cap, t_vals))
    dists = (upper - t_vals) * dnorm
    return _pad_axis(t_vals, SB, 1, 0.0), _pad_axis(dists, SB, 1, 0.0)


def _block_hit_flags(t_pad, SB, seg, R, NB):
    """(R, NB) f32 macro-box block-interval flags (1 = block may contain
    occupied space) — all-ones when no macro grid is in play.

    Block t-range: start = first sample (pads only append, so it is real);
    end = MAX over the block — NOT the last slot, which is a 0.0-position
    pad sentinel when the budget doesn't divide SB (that bug culled every
    pad-ending block: measured −3.6 dB and a fake +65% at SB=64, r3)."""
    if seg is None:
        return jnp.ones((R, NB), jnp.float32)
    seg_lo, seg_hi, seg_hit = seg
    tb = t_pad.reshape(R, NB, SB)
    t_starts = tb[:, :, 0]                                       # (R, NB)
    t_ends = jnp.max(tb, axis=2)
    overlap = ((seg_lo[:, None, :] <= t_ends[..., None])
               & (seg_hi[:, None, :] >= t_starts[..., None])
               & seg_hit[:, None, :])
    return jnp.any(overlap, axis=-1).astype(jnp.float32)


def _marched_pass_carry(packed, dirpart, condpart, rays_o, rays_d, t_vals,
                        dnorm, alive0, cfg: Config, t_end, seg=None,
                        L=None, cap=None, sb=None):
    """Carry-in-VMEM variant of _marched_pass: one Pallas program per
    (ray tile, sample block), the transmittance carry and composited
    accumulators persisted in VMEM output windows across the tile's blocks
    (kernels/blockmarch_pallas.py — VERDICT r2 next #1b). Same outputs.

    L: posenc degree of the marched net (default the main model's; the
    σ-only proposal pass passes its own smaller L — r4). sb: per-march
    block-size override (ProposalConfig.block_samples rationale)."""
    import math as _math

    from fashion_nerf.kernels.blockmarch_pallas import _carry_eval

    R, S = t_vals.shape
    SB = sb or cfg.kernels.block_samples
    eps = cfg.kernels.early_term_eps
    arrs, plan = packed[0], packed[1]
    t_pad, d_pad = _pass_dists(t_vals, dnorm, t_end, SB, cap=cap)
    NB = t_pad.shape[1] // SB
    log_eps = _math.log(eps) if eps > 0 else -1e30
    hit = alive0.astype(jnp.float32).reshape(R, 1)
    block_hit = _block_hit_flags(t_pad, SB, seg, R, NB)

    rgb, depth, acc, w, _logT = _carry_eval(
        arrs, dirpart, condpart, rays_o, rays_d, hit, block_hit, t_pad,
        d_pad, plan, cfg.model.posenc_xyz if L is None else L, SB,
        cfg.model.sigma_activation == "softplus", log_eps,
        interpret=cfg.kernels.interpret)

    weights = w[:, :S]
    if cfg.render.white_bkgd:
        rgb = rgb + (1.0 - acc[:, None])
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    # executed-block diagnostic, reconstructed exactly: T at block start = 1 − Σ earlier weights, block launched
    # iff any ray had hit ∧ block_hit ∧ T > ε. The tile width must be the
    # one the kernel actually used — conditioned plans halve it (ADVICE r3:
    # _TILE//SB here made conditioned renders fail the reshape, or group
    # rays at the wrong width when R happened to divide)
    from fashion_nerf.kernels.posenc_mlp_pallas import _TILE
    has_cond = any(t.endswith("_c") for t in plan)
    rpt = (_TILE // 2 if has_cond else _TILE) // SB
    cum_w = jnp.cumsum(w, axis=1)
    t_start = 1.0 - jnp.concatenate(
        [jnp.zeros((R, 1), jnp.float32), cum_w[:, :-1]], axis=1)
    eps_f = eps if eps > 0 else 0.0
    ray_alive = (hit > 0) & (block_hit > 0) & (t_start[:, ::SB] > eps_f)
    tile_alive = jnp.max(
        ray_alive.reshape(R // rpt, rpt, NB).astype(jnp.float32), axis=1)
    return {"rgb": rgb, "depth": depth, "acc": acc,
            "weights": weights, "disp": disp,
            "alive_frac": jnp.mean(tile_alive),
            # per-RAY liveness at the same (block) granularity: what a
            # perfect ray-compaction scheme could execute. alive_frac /
            # ideal_frac is the tile-predication overhead a gather/scatter
            # compaction pass would have to beat (VERDICT r3 #2 —
            # scripts/evals_audit.py reports both per frame)
            "ideal_frac": jnp.mean(ray_alive.astype(jnp.float32))}


def _marched_pass_slim(packed, dirpart, condpart, rays_o, rays_d, t_vals,
                       dnorm, alive0, cfg: Config, t_end, seg=None,
                       L=None, cap=None, sb=None):
    """Slim variant of _marched_pass_carry (kernels/slimmarch_pallas.py,
    r5): per-row linear-in-t work (pts build, posenc prep, x@Wx, the t
    relayout) hoisted per ray to XLA, t/dists/weights re-laid block-major so
    the kernel's windows are full-width (no selector gather/scatter
    matmuls), depth/acc compositing hoisted onto the weights output.
    Conditioning folds into the hoisted intercepts — no condpart window.
    Same outputs as _marched_pass_carry."""
    import math as _math

    from fashion_nerf.kernels.slimmarch_pallas import (_slim_eval,
                                                       hoist_rays,
                                                       split_hoist)

    R, S = t_vals.shape
    SB = sb or cfg.kernels.block_samples
    eps = cfg.kernels.early_term_eps
    plan = packed[1]
    t_pad, d_pad = _pass_dists(t_vals, dnorm, t_end, SB, cap=cap)
    NB = t_pad.shape[1] // SB
    log_eps = _math.log(eps) if eps > 0 else -1e30
    hit = alive0.astype(jnp.float32).reshape(R, 1)
    block_hit = _block_hit_flags(t_pad, SB, seg, R, NB)

    kernel_arrs, x_kernels = split_hoist(packed)
    Lm = cfg.model.posenc_xyz if L is None else L
    oF, dF, oX, dX = hoist_rays(x_kernels, Lm, rays_o, rays_d,
                                condpart=condpart)
    # block-major relayouts (~free in HBM; they buy full-width kernel
    # windows in place of three HIGHEST-precision selector matmuls)
    t_bm = t_pad.reshape(R, NB, SB).transpose(1, 0, 2).reshape(
        NB * R * SB, 1)
    d_bm = d_pad.reshape(R, NB, SB).transpose(1, 0, 2).reshape(NB * R, SB)
    has_vd = plan[-1] == "heads_vd"

    rgb, w_bm, _logT = _slim_eval(
        kernel_arrs, oX, dX, oF, dF, dirpart if has_vd else None, hit,
        block_hit, t_bm, d_bm, plan, SB,
        cfg.model.sigma_activation == "softplus", log_eps,
        interpret=cfg.kernels.interpret)

    w = w_bm.reshape(NB, R, SB).transpose(1, 0, 2).reshape(R, NB * SB)
    acc = jnp.sum(w, axis=1)
    depth = jnp.sum(w * t_pad, axis=1)
    weights = w[:, :S]
    if cfg.render.white_bkgd:
        rgb = rgb + (1.0 - acc[:, None])
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    # executed-block diagnostics: identical reconstruction to
    # _marched_pass_carry (same tile rule — slim keeps the halved
    # conditioned tile for the caller's R-divisibility contract)
    from fashion_nerf.kernels.posenc_mlp_pallas import _TILE
    has_cond = any(t.endswith("_c") for t in plan)
    rpt = (_TILE // 2 if has_cond else _TILE) // SB
    cum_w = jnp.cumsum(w, axis=1)
    t_start = 1.0 - jnp.concatenate(
        [jnp.zeros((R, 1), jnp.float32), cum_w[:, :-1]], axis=1)
    eps_f = eps if eps > 0 else 0.0
    ray_alive = (hit > 0) & (block_hit > 0) & (t_start[:, ::SB] > eps_f)
    tile_alive = jnp.max(
        ray_alive.reshape(R // rpt, rpt, NB).astype(jnp.float32), axis=1)
    return {"rgb": rgb, "depth": depth, "acc": acc,
            "weights": weights, "disp": disp,
            "alive_frac": jnp.mean(tile_alive),
            "ideal_frac": jnp.mean(ray_alive.astype(jnp.float32))}


def _sigma_march_pass(packed_sig, rays_o, rays_d, t_vals, dnorm, alive0,
                      cfg: Config, t_end, seg=None, L=None, sb=None,
                      cap=None):
    """σ-only single-block march (kernels/sigmamarch_pallas.py, r4): the
    proposal pass through the slim kernel. Same dict shape as the other
    marches, but rgb/depth are not composited (the PDF consumes weights,
    culling consumes acc): rgb is the background the zero-radiance march
    converges to, depth is 0."""
    from fashion_nerf.kernels.sigmamarch_pallas import _sigma_march_eval

    R, S = t_vals.shape
    SB = sb or cfg.kernels.block_samples
    t_pad, d_pad = _pass_dists(t_vals, dnorm, t_end, SB, cap=cap)
    assert t_pad.shape[1] == SB, (t_pad.shape, SB)     # caller gates NB==1
    hit = alive0.astype(jnp.float32).reshape(R, 1)
    block_hit = _block_hit_flags(t_pad, SB, seg, R, 1)
    alive = hit * block_hit                            # (R, 1)

    Wx, b0, kernel_arrs, n_plain, (oF, dF, oWx, dWx) = packed_sig
    w, acc, _logT = _sigma_march_eval(
        kernel_arrs, oWx, dWx, oF, dF, alive, t_pad.reshape(R * SB, 1),
        d_pad, n_plain, SB, cfg.model.sigma_activation == "softplus",
        interpret=cfg.kernels.interpret)

    weights = w[:, :S]
    rgb = jnp.zeros((R, 3), jnp.float32)
    if cfg.render.white_bkgd:
        rgb = rgb + (1.0 - acc[:, None])
    depth = jnp.zeros((R,), jnp.float32)
    from fashion_nerf.kernels.posenc_mlp_pallas import _TILE
    rpt = _TILE // SB
    tile_alive = jnp.max(
        (alive > 0).reshape(R // rpt, rpt).astype(jnp.float32), axis=1)
    return {"rgb": rgb, "depth": depth, "acc": acc,
            "weights": weights,
            "disp": 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc,
                                                                 1e-10)),
            "alive_frac": jnp.mean(tile_alive),
            "ideal_frac": jnp.mean((alive > 0).astype(jnp.float32))}


def _marched_pass(eval_block, packed, dirpart, condpart, rays_o, rays_d,
                  t_vals, dnorm, alive0, cfg: Config, rpt: int, t_end,
                  seg=None, cap=None, sb=None):
    """March one field pass over sample blocks with a transmittance carry.

    t_vals: (R, S) ascending. alive0: (R,) bool — rays worth marching (AABB
    hits). t_end: scalar integration bound, or None for the canonical
    infinite last interval. seg: optional (seg_lo, seg_hi, seg_hit) (R, K)
    macro-box intervals (core/occupancy.ray_multi_aabb) — blocks whose
    t-range overlaps no occupied box are culled like terminated ones
    (VERDICT r2 #2: interior empty space dies too, not just pre/post-box).
    Returns the volume_render-shaped dict.
    """
    R, S = t_vals.shape
    SB = sb or cfg.kernels.block_samples
    eps = cfg.kernels.early_term_eps
    softplus = cfg.model.sigma_activation == "softplus"
    n_tiles = R // rpt
    log_eps = math.log(eps) if eps > 0 else -jnp.inf

    # per-sample intervals, ∞ (or t_end) on the last — precomputed so block
    # padding can carry zero-width sentinels (α = 0 regardless of σ)
    t_pad, d_pad = _pass_dists(t_vals, dnorm, t_end, SB, cap=cap)
    NB = t_pad.shape[1] // SB

    block_hit = (None if seg is None
                 else _block_hit_flags(t_pad, SB, seg, R, NB) > 0)

    acc_rgb = jnp.zeros((R, 3), jnp.float32)
    depth = jnp.zeros((R,), jnp.float32)
    acc = jnp.zeros((R,), jnp.float32)
    log_T = jnp.zeros((R,), jnp.float32)
    w_blocks, alive_fracs = [], []

    for b in range(NB):     # static unroll: NB is 2-8 at production shapes
        with jax.named_scope(f"block_{b}"):
            alive_ray = alive0 & (log_T > log_eps)
            if block_hit is not None:
                alive_ray = alive_ray & block_hit[:, b]
            alive_tile = jnp.max(
                alive_ray.reshape(n_tiles, rpt).astype(jnp.float32),
                axis=1, keepdims=True)                       # (n_tiles, 1)
            t_b = jax.lax.dynamic_slice_in_dim(t_pad, b * SB, SB, 1)
            d_b = jax.lax.dynamic_slice_in_dim(d_pad, b * SB, SB, 1)
            pts_b = rays_o[:, None, :] + rays_d[:, None, :] * t_b[..., None]
            rgb_b, sigma_b = eval_block(packed, dirpart, condpart, pts_b,
                                        alive_tile)

            density = (jax.nn.softplus(sigma_b) if softplus
                       else jnp.maximum(sigma_b, 0.0))
            x = density * d_b
            log_om = jnp.maximum(-x, _LOG_FLOOR)             # log(1-α)
            csum = jnp.cumsum(log_om, axis=1)
            log_T_in = log_T[:, None] + jnp.concatenate(
                [jnp.zeros((R, 1), jnp.float32), csum[:, :-1]], axis=1)
            alpha = 1.0 - jnp.exp(-x)
            w_b = alpha * jnp.exp(log_T_in)                  # (R, SB)
            acc_rgb += jnp.sum(w_b[..., None] * rgb_b, axis=1)
            depth += jnp.sum(w_b * t_b, axis=1)
            acc += jnp.sum(w_b, axis=1)
            w_blocks.append(w_b)
            alive_fracs.append(jnp.mean(alive_tile))
            log_T = log_T + csum[:, -1]

    weights = jnp.concatenate(w_blocks, axis=1)[:, :S]
    if cfg.render.white_bkgd:
        acc_rgb = acc_rgb + (1.0 - acc[:, None])
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    return {"rgb": acc_rgb, "depth": depth, "acc": acc,
            "weights": weights, "disp": disp,
            # fraction of (tile, block) field launches actually executed —
            # the skip diagnostic (1.0 = dense; bench reports it)
            "alive_frac": jnp.mean(jnp.stack(alive_fracs))}


def render_rays_blockwise(params, cfg: Config, rays_o, rays_d, viewdirs,
                          occ=None, cond=None):
    """Coarse+fine hierarchical render of (R,) rays, eval-mode, blockwise.

    Numerically equivalent to render/renderer.render_rays(train=False) up to
    the termination threshold ε (exact at ε=0) — tested in
    tests/kernels/test_blockwise.py. R must be a multiple of the ray tile
    (callers pad; render_image_blockwise does). cond (R,Cc): per-ray
    conditioning features — hoisted per chunk and expanded in-kernel
    (VERDICT r2 #4; the megakernel variant stays unconditioned-only)."""
    from fashion_nerf.kernels.posenc_mlp_pallas import make_block_evaluator

    scfg, rcfg = cfg.sampling, cfg.render
    if occ is not None and (rcfg.eval_n_coarse > 0 or rcfg.eval_n_fine > 0):
        # render-time budget override (RenderConfig.eval_n_*): the reduced
        # budget reproduces the dense render ONLY because culling
        # concentrates it inside per-ray occupied ranges (quality_check
        # gate). Without occ (e.g. occupancy.enabled=false for
        # non-sparsity checkpoints) the full sampling.* budget applies —
        # halving samples over the whole [near, far] range is a real
        # quality loss outside the measured gate (ADVICE r3).
        import dataclasses
        scfg = dataclasses.replace(
            scfg,
            n_coarse=rcfg.eval_n_coarse or scfg.n_coarse,
            n_fine=(rcfg.eval_n_fine or scfg.n_fine) if scfg.n_fine > 0
            else 0)
    R = rays_o.shape[0]
    pack, hoist_dirs, hoist_cond, eval_block, rays_per_tile = \
        make_block_evaluator(cfg)
    rpt = rays_per_tile(cfg.kernels.block_samples)
    assert R % rpt == 0, (R, rpt)

    # σ-only proposal coarse pass (r4, VERDICT r3 #1): when the render-time
    # params carry a distilled proposal net (models/proposal.py), the coarse
    # march — whose only consumer at eval time is the fine PDF — runs the
    # tiny net through the identical machinery instead of the full MLP.
    use_prop = (cfg.proposal.enabled and scfg.n_fine > 0
                and isinstance(params, dict) and "proposal" in params)
    if use_prop:
        from fashion_nerf.models.proposal import proposal_model_config
        prop_m = proposal_model_config(cfg)
        p_sb = cfg.proposal.block_samples or cfg.kernels.block_samples
        n_prop = cfg.proposal.eval_n or scfg.n_coarse
        # slim σ-only march (kernels/sigmamarch_pallas.py, r4): single-block
        # shape + carry path ⇒ the PDF pass skips the generic kernel's
        # rgb/dirpart/relayout body entirely
        use_slim = (cfg.proposal.sigma_march and cfg.kernels.fused_carry
                    and n_prop <= p_sb)
        if not use_slim:
            (p_pack, p_hoist_dirs, _p_hc, p_eval_block, p_rays_per_tile) = \
                make_block_evaluator(cfg, mcfg=prop_m)
            p_rpt = p_rays_per_tile(p_sb)
            assert R % p_rpt == 0, (R, p_rpt)

    seg = None
    near, far, hit = rcfg.near, rcfg.far, None
    t_end = None
    if occ is not None:
        if cfg.occupancy.macro > 1:
            # macro-box culling (r3): per-ray sample budget concentrates on
            # the UNION of occupied macro-box intervals (tighter than the
            # global AABB), and per-(ray, block) interval tests kill
            # interior empty blocks in _marched_pass
            from fashion_nerf.core.occupancy import ray_multi_aabb
            near, far, hit, s_lo, s_hi, s_hit = ray_multi_aabb(
                rays_o, rays_d, occ, rcfg.near, rcfg.far)
            seg = (s_lo, s_hi, s_hit)
        else:
            near, far, hit = ray_aabb_intersect(
                rays_o, rays_d, occ.box_min, occ.box_max,
                rcfg.near, rcfg.far)
        t_end = rcfg.far          # σ beyond the box ≤ grid threshold
    alive0 = hit if hit is not None else jnp.ones((R,), bool)

    # occupancy-warped sampling (r4): with macro segments available, place
    # the stratified budget only in union-interval bins that overlap an
    # occupied box, and cap per-sample integration widths at occupied-run
    # ends so no interval spans a culled gap (core/sampling docstrings —
    # gap samples were pure budget loss: their blocks are culled anyway,
    # and margin halos diluted the fixed budget below the 5-pose gate).
    warp = (cfg.occupancy.sample_warp and seg is not None
            and not scfg.lindisp)
    bins_occ = gap_idx = None
    if warp:
        from fashion_nerf.core.sampling import (delta_caps, occupancy_bins,
                                                warp_stratified)
        bins_occ, gap_idx = occupancy_bins(seg, near, far,
                                           cfg.occupancy.warp_bins)

    def _strat(n):
        if warp:
            return warp_stratified(bins_occ, near, far, n)
        return stratified_sample(key, near, far, R, n, perturb=False,
                                 lindisp=scfg.lindisp)

    def _caps(t_vals):
        return delta_caps(gap_idx, near, far, t_vals) if warp else None

    if cfg.kernels.fused_carry:
        carry_fn = (_marched_pass_slim if cfg.kernels.carry_hoist
                    else _marched_pass_carry)

        def march(packed, dirpart, condpart, t_vals, dnorm, alive0, t_end,
                  L=None, rpt_=None, eval_block_=None, sb=None):
            return carry_fn(packed, dirpart, condpart, rays_o,
                            rays_d, t_vals, dnorm, alive0, cfg,
                            t_end, seg=seg, L=L,
                            cap=_caps(t_vals), sb=sb)
    else:
        def march(packed, dirpart, condpart, t_vals, dnorm, alive0, t_end,
                  L=None, rpt_=None, eval_block_=None, sb=None):
            return _marched_pass(eval_block_ or eval_block, packed, dirpart,
                                 condpart, rays_o, rays_d, t_vals, dnorm,
                                 alive0, cfg, rpt_ or rpt, t_end, seg=seg,
                                 cap=_caps(t_vals), sb=sb)

    packed_f = pack(params["fine"]) if scfg.n_fine > 0 else None
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(0)   # unused: eval-mode deterministic sampling

    if use_prop and use_slim:
        from fashion_nerf.kernels.sigmamarch_pallas import (hoist_rays,
                                                            pack_sigma)
        Wx, b0, kernel_arrs, n_plain = pack_sigma(params["proposal"],
                                                  prop_m)
        hoists = hoist_rays(Wx, b0, rays_o, rays_d, prop_m.posenc_xyz)
        t_c = _strat(n_prop)
        out_c = _sigma_march_pass(
            (Wx, b0, kernel_arrs, n_plain, hoists), rays_o, rays_d, t_c,
            dnorm, alive0, cfg, t_end, seg=seg, L=prop_m.posenc_xyz,
            sb=p_sb, cap=_caps(t_c))
    elif use_prop:
        packed_c = p_pack(params["proposal"])
        dirpart_c = p_hoist_dirs(packed_c, viewdirs)   # zeros: σ-only net
        t_c = _strat(n_prop)
        out_c = march(packed_c, dirpart_c, None, t_c, dnorm, alive0, t_end,
                      L=prop_m.posenc_xyz, rpt_=p_rpt,
                      eval_block_=p_eval_block, sb=p_sb)
    else:
        packed_c = pack(params["coarse"])
        dirpart_c = hoist_dirs(packed_c, viewdirs)
        condpart_c = hoist_cond(packed_c, cond)
        t_c = _strat(scfg.n_coarse)
        out_c = march(packed_c, dirpart_c, condpart_c, t_c, dnorm, alive0,
                      t_end)

    if scfg.n_fine <= 0:
        return {"coarse": out_c, "fine": None}

    pdf_bins, w_mid = _pdf_bins(t_c, out_c["weights"],
                                use_prop and cfg.proposal.edge_bins)
    if use_prop and cfg.proposal.dilate > 0:
        # conservative PDF (mip-NeRF-360 dilation): each bin takes the max
        # over ±dilate neighbors so the blurrier proposal σ cannot starve
        # thin structures of fine samples
        k = cfg.proposal.dilate
        B = w_mid.shape[1]
        w_pad = jnp.pad(w_mid, ((0, 0), (k, k)), mode="edge")
        w_mid = jnp.max(jnp.stack(
            [w_pad[:, i:i + B] for i in range(2 * k + 1)], 0), 0)
    if use_prop and cfg.proposal.uniform_mix > 0.0:
        # defensive importance sampling: a uniform floor on the PDF spends a
        # fraction of the SAME fine budget on coverage — cheaper than extra
        # coverage samples, which cost whole block-programs
        a = cfg.proposal.uniform_mix
        w_mid = ((1.0 - a) * w_mid
                 + a * jnp.mean(w_mid, axis=-1, keepdims=True))
    t_f = sample_pdf(key, pdf_bins, w_mid, scfg.n_fine, det=True)
    if use_prop and not cfg.proposal.union:
        # mip-NeRF-360 style: proposal samples never touch the big MLP
        # (union would make every proposal bin cost a full fine eval). The
        # PDF set alone under-integrates low-σ tails the proposal ranks
        # below its quantiles (measured −2.9 dB) — a thin stratified
        # coverage net (cov_n ≈ 16) restores the dense render.
        if cfg.proposal.cov_n > 0:
            t_cov = _strat(cfg.proposal.cov_n)
            t_all = jnp.sort(jnp.concatenate([t_cov, t_f], axis=-1), axis=-1)
        else:
            t_all = jnp.sort(t_f, axis=-1)
    else:
        t_all = jnp.sort(jnp.concatenate([t_c, t_f], axis=-1), axis=-1)

    dirpart_f = hoist_dirs(packed_f, viewdirs)
    condpart_f = hoist_cond(packed_f, cond)
    alive_f = alive0
    if use_prop and cfg.proposal.cull_acc > 0.0:
        # proposal-acc ray culling (ProposalConfig.cull_acc): the σ-only
        # march just measured each ray's chord opacity — rays it found
        # empty (silhouette grazers in the occupancy halo, the measured
        # cost peak of the frame) skip the full-MLP march and composite to
        # the background they converge to anyway
        alive_f = alive_f & (out_c["acc"] > cfg.proposal.cull_acc)
    out_f = march(packed_f, dirpart_f, condpart_f, t_all, dnorm, alive_f,
                  t_end)
    return {"coarse": out_c, "fine": out_f}


def _pdf_bins(t_c, weights, edge_bins: bool):
    """Hierarchical-PDF bin edges + per-bin mass from the coarse pass.

    edge_bins=False: the canonical mid-bin form (edges = sample midpoints,
    weights[1:-1]) — fine samples are confined to [mid_0, mid_{-1}] and the
    first/last sample's mass is DROPPED. The non-proposal path never
    notices: it unions t_c into the fine integration. edge_bins=True (r5,
    ProposalConfig.edge_bins): edges span the full sampled range
    [t_c[0], t_c[-1]] with ALL S weights — the union=False proposal path
    has no other coverage at the boundary, and at the 7-pose gate's close
    pose (near plane clipping INTO real density ⇒ the first bin carries
    real mass) the mid-bin form lost −0.328 dB that no mix/dilate/margin/
    budget knob could recover (r5 triage; union=true and edge_bins both
    fix it). On ring poses the boundary half-bins sit in the σ≈0 occupancy
    halo, which is why r4 never saw this."""
    t_mid = 0.5 * (t_c[:, 1:] + t_c[:, :-1])
    if edge_bins:
        return (jnp.concatenate([t_c[:, :1], t_mid, t_c[:, -1:]], axis=1),
                weights)
    return t_mid, weights[:, 1:-1]


def _tile_order(H: int, W: int, th: int = 8, tw: int = 8):
    """Row-major ray index permutation that makes each run of th·tw
    consecutive rays an (th × tw) PIXEL BLOCK instead of a scanline run.

    Early termination and culling predicate whole 64-ray tiles — in
    scanline order a tile spans 64 pixels of one row, mixing background
    with surface at every object edge (measured alive_frac 0.76 at 36%
    box-hit). Square pixel blocks are spatially coherent: background
    blocks die at block 0, interior blocks saturate together."""
    import numpy as _np
    ys = _np.arange(H)
    xs = _np.arange(W)
    yy, xx = _np.meshgrid(ys, xs, indexing="ij")
    key = ((yy // th) * ((W + tw - 1) // tw) + (xx // tw)) * (th * tw) \
        + (yy % th) * tw + (xx % tw)
    order = _np.argsort(key.reshape(-1), kind="stable")
    inv = _np.argsort(order, kind="stable")
    return order, inv


def render_image_blockwise(params, cfg: Config, H: int, W: int, focal, c2w,
                           occ=None, cond=None):
    """Whole-image blockwise render under ONE jit — the production render
    path when cfg.kernels.use_pallas & blockwise (bench.py headline). Mirrors
    renderer.render_image's pad/chunk/unchunk contract. Rays are permuted
    into 8×8 pixel blocks (one termination tile each) and the outputs
    inverse-permuted — see _tile_order. cond: per-scene (Cc,) conditioning
    vector (garment code ⊕ latent), broadcast per chunk."""
    rays_o, rays_d = generate_rays(H, W, focal, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    viewdirs = rays_d
    if cfg.render.ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    n = rays_o.shape[0]

    tiled = (H % 8 == 0 and W % 8 == 0)
    if not tiled:
        import sys
        print(f"fashion-nerf: blockwise render at {H}x{W} falls back to "
              "scanline ray order (H, W not multiples of 8) — ~5% slower "
              "termination tiles", file=sys.stderr)
    if tiled:
        order, inv = _tile_order(H, W)
        order_j = jnp.asarray(order)
        rays_o = rays_o[order_j]
        rays_d = rays_d[order_j]
        viewdirs = viewdirs[order_j]

    from fashion_nerf.kernels.posenc_mlp_pallas import make_block_evaluator
    rays_per_tile = make_block_evaluator(cfg)[-1]
    rpt = rays_per_tile(cfg.kernels.block_samples)
    if (cfg.proposal.enabled and cfg.sampling.n_fine > 0
            and isinstance(params, dict) and "proposal" in params):
        # the proposal net is unconditioned → full tile; conditioned main
        # models halve theirs — chunks must divide the LARGER of the two
        from fashion_nerf.models.proposal import proposal_model_config
        p_rpt = make_block_evaluator(
            cfg, mcfg=proposal_model_config(cfg))[-1](
                cfg.proposal.block_samples or cfg.kernels.block_samples)
        rpt = max(rpt, p_rpt)
    chunk = max(rpt, (min(cfg.render.chunk, n) // rpt) * rpt)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def _pad_rays(x, unit_fill: bool):
        if pad == 0:
            return x.reshape(n_chunks, chunk, 3)
        if unit_fill:     # zero dirs NaN under --sanitize (renderer.py)
            fill = jnp.zeros((pad, 3), x.dtype).at[:, 2].set(-1.0)
        else:
            # pad-ray ORIGINS sit far outside any scene AABB so padding
            # joins the dead-chunk/dead-tile skip instead of marching all
            # blocks at full field cost (ADVICE r2 — (0,0,0) origins sat
            # inside the box of every object-centric scene)
            fill = jnp.full((pad, 3), 1e6, x.dtype)
        return jnp.concatenate([x, fill], 0).reshape(n_chunks, chunk, 3)

    ro = _pad_rays(rays_o, unit_fill=False)
    rd = _pad_rays(rays_d, unit_fill=True)
    vd = _pad_rays(viewdirs, unit_fill=True)

    def _live_chunk(o, d, v):
        cond_rays = (None if cond is None else
                     jnp.broadcast_to(cond, (o.shape[0], cond.shape[-1])))
        out = render_rays_blockwise(params, cfg, o, d, v, occ=occ,
                                    cond=cond_rays)
        head = out["fine"] if out["fine"] is not None else out["coarse"]
        return {k: head[k] for k in ("rgb", "depth", "acc", "disp")}

    def _dead_chunk(o, d, v):
        # whole chunk misses the box: the exact output every miss ray
        # converges to (zero-width intervals → α = 0 → background)
        bg = 1.0 if cfg.render.white_bkgd else 0.0
        n_r = o.shape[0]
        return {"rgb": jnp.full((n_r, 3), bg, jnp.float32),
                "depth": jnp.zeros((n_r,), jnp.float32),
                "acc": jnp.zeros((n_r,), jnp.float32),
                "disp": jnp.full((n_r,), 1e10, jnp.float32)}

    def render_chunk(args):
        o, d, v = args
        if occ is None:
            return _live_chunk(o, d, v)
        # Whole-chunk skip: a fully-culled chunk still paid ~2/3 of a live
        # chunk's wall time through per-tile predication alone (measured 84
        # vs 131 ms at 32k rays) — the input DMAs and the XLA carry/resample
        # glue run regardless. Inside lax.map's scan body this lax.cond is a
        # real branch (not a select), so background chunks cost only the
        # slab test. At the bench framing ~13 of 20 chunks die here.
        _, _, hit = ray_aabb_intersect(
            o, d, occ.box_min, occ.box_max, cfg.render.near, cfg.render.far)
        return jax.lax.cond(jnp.any(hit), _live_chunk, _dead_chunk, o, d, v)

    out = jax.lax.map(render_chunk, (ro, rd, vd))

    inv_j = jnp.asarray(inv) if tiled else None

    def unchunk(x):
        flat = x.reshape((n_chunks * chunk,) + x.shape[2:])[:n]
        if tiled:
            flat = flat[inv_j]
        return flat.reshape((H, W) + x.shape[2:])

    return {k: unchunk(v) for k, v in out.items()}
