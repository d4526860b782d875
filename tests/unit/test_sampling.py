import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.core.sampling import sample_pdf, stratified_sample
from oracle import oracle_sample_pdf


def test_stratified_inside_bounds_and_monotone():
    key = jax.random.PRNGKey(0)
    z = stratified_sample(key, 2.0, 6.0, n_rays=16, n_samples=64, perturb=True)
    z = np.asarray(z)
    assert z.shape == (16, 64)
    assert (z >= 2.0 - 1e-6).all() and (z <= 6.0 + 1e-6).all()
    assert (np.diff(z, axis=-1) >= 0).all()


def test_stratified_deterministic_eval():
    key = jax.random.PRNGKey(0)
    z = stratified_sample(key, 2.0, 6.0, n_rays=3, n_samples=5, perturb=False)
    want = np.linspace(2.0, 6.0, 5)
    np.testing.assert_allclose(np.asarray(z), np.tile(want, (3, 1)), atol=1e-6)


def test_stratified_lindisp():
    key = jax.random.PRNGKey(0)
    z = stratified_sample(key, 1.0, 4.0, n_rays=1, n_samples=3, perturb=False,
                          lindisp=True)
    # inverse-depth linspace: 1/z in linspace(1, 0.25, 3)
    want = 1.0 / np.linspace(1.0, 0.25, 3)
    np.testing.assert_allclose(np.asarray(z)[0], want, atol=1e-6)


def test_sample_pdf_deterministic_matches_oracle():
    rng = np.random.default_rng(2)
    R, B, N = 4, 8, 16
    bins = np.sort(rng.uniform(0, 10, size=(R, B + 1)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(R, B)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    got = np.asarray(sample_pdf(key, jnp.asarray(bins), jnp.asarray(weights),
                                N, det=True))
    u = np.tile(np.linspace(0, 1, N, dtype=np.float32), (R, 1))
    want = oracle_sample_pdf(bins, weights, u)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sample_pdf_concentrates_mass():
    # all mass in one bin → all samples land in that bin
    R, B, N = 2, 10, 32
    bins = np.tile(np.linspace(0.0, 1.0, B + 1, dtype=np.float32), (R, 1))
    weights = np.zeros((R, B), np.float32)
    weights[:, 3] = 1.0
    key = jax.random.PRNGKey(1)
    s = np.asarray(sample_pdf(key, jnp.asarray(bins), jnp.asarray(weights),
                              N, det=False))
    lo, hi = bins[0, 3], bins[0, 4]
    # ~eps leakage into other bins is allowed; the bulk must be inside
    frac_inside = ((s >= lo - 1e-3) & (s <= hi + 1e-3)).mean()
    assert frac_inside > 0.95


def test_pdf_edge_bins_cover_boundary_mass():
    """Full-range PDF bins (r5, ProposalConfig.edge_bins / render.blockwise
    ._pdf_bins): when the FIRST coarse sample carries the mass (the 7-pose
    gate's close pose — the near plane clips into real density), the
    canonical mid-bin form structurally cannot place fine samples below the
    first midpoint (it drops weights[0] and its edges start at mid_0; the
    shipped config lost −0.328 dB there, r5 triage). Edge bins must place
    most samples in the first half-bin; both forms stay inside [t0, t-1]."""
    from fashion_nerf.render.blockwise import _pdf_bins

    R, S, N = 2, 16, 32
    t_c = np.tile(np.linspace(2.0, 6.0, S, dtype=np.float32), (R, 1))
    w = np.zeros((R, S), np.float32)
    w[:, 0] = 1.0                      # all real mass at the clipped front
    mid0 = 0.5 * (t_c[0, 0] + t_c[0, 1])
    key = jax.random.PRNGKey(3)

    bins_new, w_new = _pdf_bins(jnp.asarray(t_c), jnp.asarray(w), True)
    assert bins_new.shape == (R, S + 1) and w_new.shape == (R, S)
    s_new = np.asarray(sample_pdf(key, bins_new, w_new, N, det=True))
    frac_front = (s_new <= mid0 + 1e-6).mean()
    assert frac_front > 0.9, frac_front
    assert s_new.min() >= t_c[0, 0] - 1e-6
    assert s_new.max() <= t_c[0, -1] + 1e-6

    bins_old, w_old = _pdf_bins(jnp.asarray(t_c), jnp.asarray(w), False)
    assert bins_old.shape == (R, S - 1) and w_old.shape == (R, S - 2)
    s_old = np.asarray(sample_pdf(key, bins_old, w_old, N, det=True))
    # the r4 form cannot reach below mid_0 even with all mass there
    assert s_old.min() >= mid0 - 1e-6


def test_sample_pdf_inside_range():
    rng = np.random.default_rng(3)
    R, B, N = 3, 6, 20
    bins = np.sort(rng.uniform(-5, 5, size=(R, B + 1)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(R, B)).astype(np.float32)
    key = jax.random.PRNGKey(2)
    s = np.asarray(sample_pdf(key, jnp.asarray(bins), jnp.asarray(weights), N))
    assert (s >= bins[:, :1] - 1e-5).all() and (s <= bins[:, -1:] + 1e-5).all()


# ---- occupancy-warped sampling (r4) --------------------------------------

def _np_occupancy_bins(seg_lo, seg_hi, seg_hit, t_lo, t_hi, nbins):
    """Loop reference for occupancy_bins."""
    R, K = seg_lo.shape
    occ = np.zeros((R, nbins), np.float32)
    gap = np.zeros((R, nbins), np.float32)
    for r in range(R):
        step = (t_hi[r] - t_lo[r]) / nbins
        for i in range(nbins):
            e0, e1 = t_lo[r] + i * step, t_lo[r] + (i + 1) * step
            for k in range(K):
                if seg_hit[r, k] and seg_lo[r, k] < e1 and seg_hi[r, k] > e0:
                    occ[r, i] = 1.0
                    break
        for i in range(nbins):
            g = nbins
            for j in range(i, nbins):
                if occ[r, j] == 0.0:
                    g = j
                    break
            gap[r, i] = g
    return occ, gap


def _rand_segs(rng, R=4, K=5, t_lo=2.0, t_hi=6.0):
    lo = rng.uniform(t_lo, t_hi, size=(R, K)).astype(np.float32)
    hi = (lo + rng.uniform(0.05, 1.2, size=(R, K))).astype(np.float32)
    hi = np.minimum(hi, t_hi).astype(np.float32)
    hit = rng.uniform(size=(R, K)) > 0.3
    hit[:, 0] = True     # every ray keeps at least one segment
    return lo, hi, hit


def test_occupancy_bins_matches_loop_reference():
    from fashion_nerf.core.sampling import occupancy_bins
    rng = np.random.default_rng(11)
    lo, hi, hit = _rand_segs(rng)
    R = lo.shape[0]
    t_lo = np.full((R,), 2.0, np.float32)
    t_hi = np.full((R,), 6.0, np.float32)
    occ, gap = occupancy_bins(
        (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(hit)),
        jnp.asarray(t_lo), jnp.asarray(t_hi), 16)
    occ_ref, gap_ref = _np_occupancy_bins(lo, hi, hit, t_lo, t_hi, 16)
    np.testing.assert_array_equal(np.asarray(occ), occ_ref)
    np.testing.assert_array_equal(np.asarray(gap), gap_ref)


def test_occupancy_bins_hand_case():
    from fashion_nerf.core.sampling import occupancy_bins
    # one ray, two segments [2.5, 3.0] and [4.0, 4.5] in [2, 6], 8 bins of
    # width 0.5 → occupied bins 1 and 4; run ends at bins 2 and 5
    lo = np.array([[2.5, 4.0]], np.float32)
    hi = np.array([[3.0, 4.5]], np.float32)
    hit = np.ones((1, 2), bool)
    occ, gap = occupancy_bins(
        (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(hit)),
        jnp.asarray([2.0]), jnp.asarray([6.0]), 8)
    np.testing.assert_array_equal(
        np.asarray(occ)[0], [0, 1, 0, 0, 1, 0, 0, 0])
    np.testing.assert_array_equal(
        np.asarray(gap)[0], [0, 2, 2, 3, 5, 5, 6, 7])


def test_warp_stratified_full_occupancy_is_midpoint_strata():
    from fashion_nerf.core.sampling import warp_stratified
    R, NB, N = 3, 16, 24
    occ = jnp.ones((R, NB), jnp.float32)
    t_lo = jnp.asarray([2.0, 2.5, 3.0])
    t_hi = jnp.asarray([6.0, 5.5, 5.0])
    t = np.asarray(warp_stratified(occ, t_lo, t_hi, N))
    u = (np.arange(N, dtype=np.float32) + 0.5) / N
    want = np.asarray(t_lo)[:, None] + u[None, :] * (
        np.asarray(t_hi) - np.asarray(t_lo))[:, None]
    np.testing.assert_allclose(t, want, atol=2e-3)


def test_warp_stratified_avoids_gaps_and_is_monotone():
    from fashion_nerf.core.sampling import occupancy_bins, warp_stratified
    rng = np.random.default_rng(7)
    lo, hi, hit = _rand_segs(rng)
    R = lo.shape[0]
    t_lo = np.full((R,), 2.0, np.float32)
    t_hi = np.full((R,), 6.0, np.float32)
    nbins = 32
    occ, _ = occupancy_bins(
        (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(hit)),
        jnp.asarray(t_lo), jnp.asarray(t_hi), nbins)
    t = np.asarray(warp_stratified(occ, jnp.asarray(t_lo),
                                   jnp.asarray(t_hi), 48))
    assert (np.diff(t, axis=1) >= -1e-5).all()
    # every sample lies in an occupied bin (boundary tolerance half a ulp
    # of the bin width)
    step = (t_hi - t_lo)[:, None] / nbins
    bi = np.clip(((t - t_lo[:, None]) / step).astype(int), 0, nbins - 1)
    occ_np = np.asarray(occ)
    in_occ = np.take_along_axis(occ_np, bi, axis=1) > 0
    # samples exactly at a bin edge may floor into the neighbor — allow it
    at_edge = np.abs((t - t_lo[:, None]) / step
                     - np.round((t - t_lo[:, None]) / step)) < 1e-4
    assert (in_occ | at_edge).all()


def test_delta_caps_match_loop_reference():
    from fashion_nerf.core.sampling import (delta_caps, occupancy_bins,
                                            warp_stratified)
    rng = np.random.default_rng(13)
    lo, hi, hit = _rand_segs(rng)
    R = lo.shape[0]
    t_lo = np.full((R,), 2.0, np.float32)
    t_hi = np.full((R,), 6.0, np.float32)
    nbins = 16
    occ, gap = occupancy_bins(
        (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(hit)),
        jnp.asarray(t_lo), jnp.asarray(t_hi), nbins)
    t = warp_stratified(occ, jnp.asarray(t_lo), jnp.asarray(t_hi), 20)
    cap = np.asarray(delta_caps(gap, jnp.asarray(t_lo), jnp.asarray(t_hi),
                                t))
    t_np, gap_np = np.asarray(t), np.asarray(gap)
    step = (t_hi - t_lo) / nbins
    for r in range(R):
        for s in range(t_np.shape[1]):
            bi = int(np.clip((t_np[r, s] - t_lo[r]) // step[r],
                             0, nbins - 1))
            want = t_lo[r] + gap_np[r, bi] * step[r]
            np.testing.assert_allclose(cap[r, s], want, atol=1e-5)
    # caps never precede their sample when the sample is in an occupied run
    bi = np.clip(((t_np - t_lo[:, None]) / step[:, None]).astype(int),
                 0, nbins - 1)
    occ_at = np.take_along_axis(np.asarray(occ), bi, axis=1) > 0
    assert (cap[occ_at] >= t_np[occ_at] - 1e-4).all()


def test_warp_budget_win_on_fragmented_scene():
    """The OccupancyConfig.sample_warp activation-trigger fixture (VERDICT r4
    weak #4): on a FRAGMENTED union (per-ray occupied runs >= 2 with real
    gaps between them — multi-object / room-scale scenes), warped sampling
    places the entire budget in occupied bins, while plain stratified
    sampling over the union interval wastes the gap fraction of its budget
    on samples whose blocks the march culls anyway. This is the measured win
    mechanism; on single-run scenes (the flagship lego) the warp is neutral
    by construction (test_warp_stratified_full_occupancy_is_midpoint_strata)
    and ships OFF."""
    from fashion_nerf.core.sampling import occupancy_bins, warp_stratified

    # two occupied runs covering 30% of [2, 6]: [2.4, 3.0] and [4.4, 5.0]
    lo = np.array([[2.4, 4.4]], np.float32)
    hi = np.array([[3.0, 5.0]], np.float32)
    hit = np.ones((1, 2), bool)
    t_lo = jnp.asarray([2.0])
    t_hi = jnp.asarray([6.0])
    nbins, N = 40, 64
    occ, _ = occupancy_bins(
        (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(hit)), t_lo, t_hi,
        nbins)
    assert 0.25 < float(np.asarray(occ).mean()) < 0.35  # genuinely gappy
    # mean occupied-run count = 2 >= the documented trigger threshold
    occ_np = np.asarray(occ)[0]
    runs = int(((occ_np[1:] > 0) & (occ_np[:-1] == 0)).sum()
               + (occ_np[0] > 0))
    assert runs == 2

    def frac_in_runs(t):
        t = np.asarray(t)
        in_run = ((t >= lo[0, 0]) & (t <= hi[0, 0])) | (
            (t >= lo[0, 1]) & (t <= hi[0, 1]))
        return float(in_run.mean())

    t_warp = warp_stratified(occ, t_lo, t_hi, N)
    t_plain = stratified_sample(jax.random.PRNGKey(0), t_lo, t_hi, 1, N,
                                perturb=False)
    # warp: every sample useful; plain: ~70% of the budget lands in gaps
    assert frac_in_runs(t_warp) > 0.95, frac_in_runs(t_warp)
    assert frac_in_runs(t_plain) < 0.45, frac_in_runs(t_plain)
