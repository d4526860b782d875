"""Stratified + hierarchical importance sampling along rays (BASELINE.json:5,8).

Reference@v1 ships no code (/root/reference/README.md:1-2); algorithms follow
the canonical NeRF formulation. All functions are shape-static and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_sample(key, near, far, n_rays: int, n_samples: int,
                      perturb: bool = True, lindisp: bool = False):
    """N bins over [near, far], one uniform jitter per bin.

    Args:
      key: PRNG key (ignored when perturb=False → deterministic bin midpoints
           ... actually deterministic linspace endpoints, matching eval mode).
      near, far: scalars or (n_rays,) per-ray bounds.
      n_rays, n_samples: static ints.
      perturb: jitter within bins (training); False → fixed linspace (eval).
      lindisp: sample linearly in inverse depth (disparity).

    Returns:
      t_vals: (n_rays, n_samples) monotone increasing sample depths.
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)     # (S,)
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (n_rays,))
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (n_rays,))
    if lindisp:
        z = 1.0 / (1.0 / near[:, None] * (1.0 - t) + 1.0 / far[:, None] * t)
    else:
        z = near[:, None] * (1.0 - t) + far[:, None] * t          # (R, S)
    if perturb:
        mids = 0.5 * (z[:, 1:] + z[:, :-1])
        upper = jnp.concatenate([mids, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mids], axis=-1)
        u = jax.random.uniform(key, z.shape, dtype=jnp.float32)
        z = lower + (upper - lower) * u
    return z


def occupancy_bins(seg, t_lo, t_hi, nbins: int):
    """Per-ray occupancy indicator on a fixed t-bin grid (r4 sample warping).

    The macro-box culling state (core/occupancy.ray_multi_aabb) gives each
    ray K interval segments; a stratified budget over the UNION interval
    [t_lo, t_hi] wastes samples in the gaps BETWEEN segments — the march
    culls those blocks, so gap samples are pure budget loss, and margin
    fixes for box clipping dilute the budget further (measured r4: the
    5-pose gate's pose1 lost 0.137 dB at margin_world=0.25 from dilution
    alone). This grid is the static-shape substrate for placing samples
    only in occupied space (NerfAcc's skip-sampling idea, PAPERS.md,
    re-thought without gathers).

    Args:
      seg: (seg_lo, seg_hi, seg_hit) (R, K) from ray_multi_aabb.
      t_lo, t_hi: (R,) union interval (same values the segs were clipped to).
      nbins: static bin count over [t_lo, t_hi].

    Returns:
      occ: (R, nbins) f32 — 1 where the bin overlaps any occupied segment.
      gap_idx: (R, nbins) f32 — index of the first UNOCCUPIED bin ≥ i (the
        end edge of the contiguous occupied run containing bin i; == i for
        unoccupied bins; == nbins when the run reaches t_hi). Edges are
        affine in the index, so consumers reconstruct the world-space run
        end as t_lo + gap_idx·(t_hi−t_lo)/nbins — no gather.
    """
    seg_lo, seg_hi, seg_hit = seg
    R = seg_lo.shape[0]
    t_lo = jnp.broadcast_to(jnp.asarray(t_lo, jnp.float32), (R,))
    t_hi = jnp.broadcast_to(jnp.asarray(t_hi, jnp.float32), (R,))
    step = (t_hi - t_lo)[:, None] / nbins                        # (R, 1)
    i = jnp.arange(nbins, dtype=jnp.float32)
    e0 = t_lo[:, None] + step * i                                # (R, NB)
    e1 = e0 + step
    overlap = ((seg_lo[:, None, :] < e1[..., None])
               & (seg_hi[:, None, :] > e0[..., None])
               & seg_hit[:, None, :])                            # (R, NB, K)
    occ = jnp.any(overlap, axis=-1)                              # (R, NB)
    # first unoccupied bin at or after i: reverse cumulative min over the
    # per-bin "own index if gap else +big" — associative, no scan loop
    own = jnp.where(occ, jnp.float32(nbins),
                    jnp.arange(nbins, dtype=jnp.float32))
    gap_idx = jnp.flip(jax.lax.associative_scan(
        jnp.minimum, jnp.flip(own, axis=1), axis=1), axis=1)
    return occ.astype(jnp.float32), gap_idx


def warp_stratified(occ, t_lo, t_hi, n_samples: int):
    """Deterministic stratified samples warped onto the occupied bins.

    Places n_samples at the MIDPOINT quantiles (k+0.5)/n of the bin-mass
    CDF, so equal occupied length sits between consecutive samples and no
    sample lands exactly on a run-end edge (which would zero its capped
    integration width — see delta_caps). With every bin occupied this
    reduces to (midpoint-offset) uniform placement over [t_lo, t_hi].

    Returns (R, n_samples) monotone t.
    """
    R, nbins = occ.shape
    t_lo = jnp.broadcast_to(jnp.asarray(t_lo, jnp.float32), (R,))
    t_hi = jnp.broadcast_to(jnp.asarray(t_hi, jnp.float32), (R,))
    step = (t_hi - t_lo)[:, None] / nbins
    edges = t_lo[:, None] + step * jnp.arange(nbins + 1, dtype=jnp.float32)
    u = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
    u = jnp.broadcast_to(u, (R, n_samples))
    return sample_pdf(None, edges, occ, n_samples, quantiles=u)


def delta_caps(gap_idx, t_lo, t_hi, t_vals):
    """Per-sample integration-width cap at the occupied-run end (r4).

    Without caps, the interval width δᵢ = tᵢ₊₁ − tᵢ of a sample at the end
    of one occupied run spans the (culled, never-evaluated) gap to the next
    run, so its α = 1 − exp(−σδ) overintegrates by the gap length — the
    same artifact NerfAcc clamps per segment. cap = world-space end edge of
    the contiguous occupied run containing each sample (reconstructed
    affinely from gap_idx — no gather); callers take
    δᵢ = min(tᵢ₊₁, capᵢ) − tᵢ. Samples in unoccupied bins get cap = their
    bin's end… == gap start ⇒ δ ≤ one bin; their σ is sub-threshold by the
    culling soundness argument, so the residual is bounded by it.

    Returns cap: (R, S) world-space t, ≥ t_vals where t_vals is in an
    occupied bin's run.
    """
    R, nbins = gap_idx.shape
    t_lo = jnp.broadcast_to(jnp.asarray(t_lo, jnp.float32), (R,))
    t_hi = jnp.broadcast_to(jnp.asarray(t_hi, jnp.float32), (R,))
    step = ((t_hi - t_lo) / nbins)[:, None]                     # (R, 1)
    denom = jnp.where(step > 0, step, 1.0)
    bi = jnp.clip(jnp.floor((t_vals - t_lo[:, None]) / denom),
                  0, nbins - 1)                                  # (R, S)
    # gap_idx at each sample's bin, by masked reduce (no per-row gather)
    ib = jnp.arange(nbins, dtype=jnp.float32)
    sel = bi[:, :, None] == ib[None, None, :]                    # (R, S, NB)
    g = jnp.max(jnp.where(sel, gap_idx[:, None, :], 0.0), axis=-1)
    return t_lo[:, None] + g * step


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False,
               eps: float = 1e-5, quantiles=None):
    """Inverse-CDF importance sampling from a piecewise-constant PDF.

    Args:
      bins: (R, B+1) bin edges (coarse sample midpoints in hierarchical NeRF).
      weights: (R, B) unnormalized per-bin mass (coarse volume-render weights).
      n_samples: number of fine samples to draw (static).
      det: deterministic mode — evenly spaced CDF quantiles (eval); else
           uniform random quantiles.
      quantiles: optional explicit (R, n_samples) quantiles in [0, 1]
           (overrides det/key — warp_stratified passes midpoint strata).

    Returns:
      samples: (R, n_samples) NOT sorted; callers union-sort with the coarse
      set (see render/renderer.py). This masked-reduce formulation IS the
      canonical TPU implementation: the round-1 Pallas twin measured ~10×
      slower and was retired (VERDICT r1 #7), since its only viable redesign
      was this same reduce, which XLA already fuses without materializing
      the (R, N, B+1) broadcast.
    """
    weights = weights + eps                                       # avoid nans
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)      # (R, B)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, B+1)

    R = cdf.shape[0]
    if quantiles is not None:
        u = quantiles
    elif det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
        u = jnp.broadcast_to(u, (R, n_samples))
    else:
        u = jax.random.uniform(key, (R, n_samples), dtype=jnp.float32)

    # Inverse CDF WITHOUT searchsorted/gather: both cdf and bins are monotone
    # in the bin index, so cdf[below]/bins[below] (= values at the last edge
    # with cdf ≤ u) are masked MAX reductions over the bin axis, and the
    # [above] values (first edge with cdf > u) are masked MIN reductions.
    # XLA fuses compare+select+reduce without materializing (R, N, B+1);
    # a vmapped searchsorted + take_along_axis lowers to per-row dynamic
    # gathers costing ~6 s per 800×800 frame on TPU (measured) vs ~30 ms
    # for this formulation.
    below_mask = cdf[:, None, :] <= u[:, :, None]               # (R, N, B+1)
    _NEG, _POS = -1e10, 1e10
    cdf_below = jnp.max(jnp.where(below_mask, cdf[:, None, :], _NEG), -1)
    bin_below = jnp.max(jnp.where(below_mask, bins[:, None, :], _NEG), -1)
    cdf_above = jnp.min(jnp.where(below_mask, _POS, cdf[:, None, :]), -1)
    bin_above = jnp.min(jnp.where(below_mask, _POS, bins[:, None, :]), -1)
    # u below cdf[0]=0 cannot happen (u ≥ 0); u ≥ cdf[-1] leaves the "above"
    # reductions empty (+inf) — clamp to the last edge.
    empty_above = cdf_above >= _POS * 0.5
    cdf_above = jnp.where(empty_above, cdf[:, -1:], cdf_above)
    bin_above = jnp.where(empty_above, bins[:, -1:], bin_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    frac = (u - cdf_below) / denom
    samples = bin_below + frac * (bin_above - bin_below)
    return samples
