"""Learned garment-correspondence matcher (tryon/matcher.py, VERDICT r2
#8): trained on the randomized procedural pair distribution, it must beat
the keypoint-grid TPS baseline on held-out pairs (warped-mask IoU)."""

import jax
import numpy as np

from fashion_nerf.tryon.matcher import (GarmentMatcher, eval_iou,
                                        matched_warp, train_matcher)


def test_zero_params_is_procedural_baseline():
    """Residual design: a zero-output matcher reproduces the keypoint-grid
    warp exactly (the graceful fallback)."""
    import jax.numpy as jnp
    from fashion_nerf.data.viton import synth_viton_pair
    from fashion_nerf.tryon.matcher import _device_pair

    module = GarmentMatcher()
    pair = synth_viton_pair(48, 48, seed=7)
    pre = _device_pair(pair, 48, 48)
    cloth = jnp.asarray(pair["cloth"])
    cm = jnp.asarray(pair["cloth_mask"])
    kp = jnp.asarray(pair["keypoints"])
    # freshly-initialized head1 has zero kernel → zero residual
    from fashion_nerf.tryon.matcher import _pair_features
    person, cl = _pair_features(pre, cloth, cm)
    params = module.init(jax.random.PRNGKey(0), person, cl)
    w_l, m_l, dst_l = matched_warp(params, module, pre, cloth, cm, kp,
                                   48, 48)
    w_b, m_b, dst_b = matched_warp(None, module, pre, cloth, cm, kp,
                                   48, 48)
    np.testing.assert_allclose(np.asarray(dst_l), np.asarray(dst_b),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_l), np.asarray(m_b), atol=1e-5)


def test_trained_matcher_beats_keypoint_grid_baseline():
    params, module, hist = train_matcher(jax.random.PRNGKey(0), steps=60,
                                         batch=6, H=48, W=48)
    assert np.isfinite([h["loss"] for h in hist]).all()
    learned, baseline = eval_iou(params, module,
                                 seeds=range(3_000_001, 3_000_011),
                                 H=48, W=48)
    # measured: ~0.93 learned vs ~0.65 baseline at 64px/120 steps; the
    # short-train bar still requires a decisive win
    assert learned > baseline + 0.05, (learned, baseline)
