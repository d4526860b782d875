"""L3 — the full rendering pipeline (SURVEY.md §3.1/3.2, BASELINE.json:5).

rays → stratified → coarse field → volume render → importance resample →
fine field → volume render. Entirely shape-static; one jit encloses whole
images via lax.map over fixed-size chunks (no host-side Python loop —
BASELINE.json:5). Fields follow the convention in models/__init__.py, so the
Pallas substrate (kernels/) slots in without renderer changes.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from fashion_nerf.config import Config
from fashion_nerf.core.cameras import generate_rays, ndc_rays
from fashion_nerf.core.sampling import sample_pdf, stratified_sample
from fashion_nerf.core.volrend import volume_render


def render_rays(field_coarse: Callable, field_fine: Optional[Callable],
                rays_o, rays_d, key, cfg: Config, train: bool,
                cond=None, use_pallas_render: bool = False, occ=None):
    """Render a batch of rays.

    Args:
      field_coarse/field_fine: bound field fns (pts, viewdirs, cond)->(rgb,σ);
        field_fine None ⇒ coarse-only (tiny_lego config, BASELINE.json:7).
      rays_o, rays_d: (R, 3). In NDC configs these are already NDC rays.
      key: PRNG key (consumed only when train=True).
      cfg: full Config (static under jit).
      train: stratified jitter + σ-noise on; eval is fully deterministic.
      cond: optional (R, Cc) conditioning features.
      occ: optional core.occupancy.OccupancyState — concentrates the whole
        static sample budget inside each ray's occupied interval and
        composites box-missing rays straight to background (the sample-work
        reduction mandated by BASELINE.json:5's throughput target).

    Returns {"coarse": {...}, "fine": {...}|None}; each inner dict is a
    volume_render output.
    """
    R = rays_o.shape[0]
    scfg, rcfg = cfg.sampling, cfg.render
    k_strat, k_pdf, k_noise_c, k_noise_f = jax.random.split(key, 4)

    if use_pallas_render and occ is None:
        from fashion_nerf.kernels.render_pallas import fused_render_rays as _vr
        vr = functools.partial(_vr, interpret=cfg.kernels.interpret)
    else:
        # the culled path needs volume_render's finite t_end (the standalone
        # fused-volrend kernel keeps canonical ∞-last-interval semantics; the
        # Pallas home of culling + early termination is the blockwise march)
        vr = volume_render

    near, far, hit = rcfg.near, rcfg.far, None
    if occ is not None:
        from fashion_nerf.core.occupancy import ray_aabb_intersect
        with jax.named_scope("aabb_cull"):
            near, far, hit = ray_aabb_intersect(
                rays_o, rays_d, occ.box_min, occ.box_max,
                rcfg.near, rcfg.far)
        # finite integration bound: σ beyond the box is ≤ the grid threshold
        # by construction, so absorb over the true leftover, not ∞
        vr = functools.partial(vr, t_end=rcfg.far)

    def _cull(out):
        if hit is None:
            return out
        from fashion_nerf.core.occupancy import cull_background
        return cull_background(out, hit, rcfg.white_bkgd)

    # jax.profiler.annotate_* names make each stage attributable in traces
    # (SURVEY.md §5.1); they are no-ops outside a profiling session
    with jax.named_scope("stratified_sample"):
        t_c = stratified_sample(k_strat, near, far, R,
                                scfg.n_coarse,
                                perturb=train and scfg.perturb,
                                lindisp=scfg.lindisp)
    pts_c = rays_o[:, None, :] + rays_d[:, None, :] * t_c[..., None]
    with jax.named_scope("coarse_field"):
        rgb_c, sigma_c = field_coarse(pts_c, rays_d, cond)
    noise = scfg.raw_noise_std if train else 0.0
    with jax.named_scope("coarse_volrend"):
        out_c = vr(rgb_c, sigma_c, t_c, rays_d, white_bkgd=rcfg.white_bkgd,
                   raw_noise_std=noise, key=k_noise_c,
                   sigma_activation=cfg.model.sigma_activation)
    out_c = _cull(out_c)

    if scfg.n_fine <= 0 or field_fine is None:
        return {"coarse": out_c, "fine": None}

    # hierarchical: PDF over coarse intervals, union-sort with coarse samples
    t_mid = 0.5 * (t_c[:, 1:] + t_c[:, :-1])
    w_mid = jax.lax.stop_gradient(out_c["weights"][:, 1:-1])
    # Inverse-CDF resampling is the gather-free XLA masked-reduce
    # (core/sampling.py) on every path: it measures 26 ms/frame at 800×800
    # (~1% of even the accelerated frame), and the retired Pallas twin
    # (round 1) was ~10× slower — its only viable redesign was this same
    # masked-reduce, which XLA already fuses optimally (VERDICT r1 #7:
    # win or retire → retired; BASELINE.md measured row).
    with jax.named_scope("resample_cdf"):
        t_f = sample_pdf(k_pdf, t_mid, w_mid, scfg.n_fine,
                         det=not (train and scfg.perturb))
        t_all = jnp.sort(jnp.concatenate([t_c, t_f], axis=-1), axis=-1)

    pts_f = rays_o[:, None, :] + rays_d[:, None, :] * t_all[..., None]
    with jax.named_scope("fine_field"):
        rgb_f, sigma_f = field_fine(pts_f, rays_d, cond)
    with jax.named_scope("fine_volrend"):
        out_f = vr(rgb_f, sigma_f, t_all, rays_d,
                   white_bkgd=rcfg.white_bkgd,
                   raw_noise_std=noise, key=k_noise_f,
                   sigma_activation=cfg.model.sigma_activation)
    return {"coarse": out_c, "fine": _cull(out_f)}


def _rays_for_pose(H: int, W: int, focal, c2w, cfg: Config):
    rays_o, rays_d = generate_rays(H, W, focal, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    viewdirs = rays_d  # keep pre-NDC dirs for view-dependence
    if cfg.render.ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    return rays_o, rays_d, viewdirs


def render_image(field_coarse, field_fine, H: int, W: int, focal, c2w,
                 cfg: Config, key=None, cond=None,
                 use_pallas_render: bool = False, mesh=None, occ=None):
    """Render a full H×W image under ONE jit: rays are padded to a multiple
    of cfg.render.chunk and mapped with lax.map, bounding device memory while
    keeping the host out of the loop.

    With a mesh, the chunk axis shards over "dp" (shard_map): each chip
    renders its own chunk run — rays are embarrassingly parallel at render
    time too (SURVEY.md §2.4; eval-image assembly is the all_gather row)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    rays_o, rays_d, viewdirs = _rays_for_pose(H, W, focal, c2w, cfg)
    n = rays_o.shape[0]
    chunk = min(cfg.render.chunk, n)
    n_chunks = -(-n // chunk)
    if mesh is not None:
        ndev = mesh.shape["dp"]
        n_chunks = -(-n_chunks // ndev) * ndev   # chunk rows divide over dp
    pad = n_chunks * chunk - n

    def _pad(x, unit_fill: bool):
        # padded DIRECTION rows must be unit vectors, not zeros: the field
        # normalizes d/||d|| and 0/0 NaNs abort under --sanitize
        # (jax_debug_nans) even though the rows are sliced off (ADVICE r1)
        if pad == 0:
            return x.reshape(n_chunks, chunk, 3)
        fill = jnp.zeros((pad, 3), x.dtype)
        if unit_fill:
            fill = fill.at[:, 2].set(-1.0)
        return jnp.concatenate([x, fill], 0).reshape(n_chunks, chunk, 3)

    ro = _pad(rays_o, unit_fill=False)
    rd = _pad(rays_d, unit_fill=True)
    vd = _pad(viewdirs, unit_fill=True)
    # NDC: field sees NDC-space points but view-dependence uses world dirs.
    # For the non-NDC case rays_d == viewdirs, so one code path suffices: the
    # field closure receives viewdirs separately.

    # cond: per-scene vector (Cc,) broadcast to each chunk's rays
    cond_chunk = (jnp.broadcast_to(cond, (chunk, cond.shape[-1]))
                  if cond is not None else None)

    def render_chunk(args):
        o, d, v = args
        def fc(pts, _rd, cnd):
            return field_coarse(pts, v, cnd)
        ff = None
        if field_fine is not None:
            def ff(pts, _rd, cnd):
                return field_fine(pts, v, cnd)
        return render_rays(fc, ff, o, d, key, cfg, train=False,
                           cond=cond_chunk,
                           use_pallas_render=use_pallas_render, occ=occ)

    if mesh is None:
        out = jax.lax.map(render_chunk, (ro, rd, vd))
    else:
        from jax.sharding import PartitionSpec as P

        def per_device(ro_l, rd_l, vd_l):
            return jax.lax.map(render_chunk, (ro_l, rd_l, vd_l))

        out = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=P("dp"), out_specs=P("dp"))(ro, rd, vd)
    head = out["fine"] if out["fine"] is not None else out["coarse"]

    def unchunk(x):
        flat = x.reshape((n_chunks * chunk,) + x.shape[2:])[:n]
        return flat.reshape((H, W) + x.shape[2:])

    return {
        "rgb": unchunk(head["rgb"]),
        "depth": unchunk(head["depth"]),
        "acc": unchunk(head["acc"]),
        "disp": unchunk(head["disp"]),
    }


def render_path(field_coarse, field_fine, poses, H: int, W: int, focal,
                cfg: Config, cond=None, use_pallas_render: bool = False,
                occ=None):
    """Render a camera path (test poses / spiral / rotation video,
    BASELINE.json:11). Host loop over poses; the per-image renderer is jitted
    ONCE (c2w is the only traced argument) so frames reuse the executable."""
    def _render(c2w):
        return render_image(field_coarse, field_fine, H, W, focal, c2w, cfg,
                            cond=cond, use_pallas_render=use_pallas_render,
                            occ=occ)
    render = jax.jit(_render)
    frames = [render(jnp.asarray(c2w))["rgb"] for c2w in poses]
    return jnp.stack(frames)
