"""Bench weight-loading guards (ADVICE r2): the committed flagship asset
must only be treated as a trained checkpoint for the config it was trained
under — structure mismatches fall back to random init instead of crashing."""

from fashion_nerf.bench import _bench_params
from fashion_nerf.config import load_config


def test_structure_mismatch_falls_back_to_random_init():
    # tiny_lego has no fine net; the try-on presets add encoder/latents —
    # all three crashed tree_map before the guard (ADVICE r2 medium)
    for name in ("tiny_lego", "viton_tryon", "dynamic_tryon"):
        params, trained = _bench_params(load_config(name))
        assert trained is False
        assert "coarse" in params


def test_llff_rejects_blender_trained_weights():
    # identical tree structure, but the asset's __meta__/config says
    # blender_lego — NDC-space llff must not advertise trained_ckpt
    params, trained = _bench_params(load_config("llff_fern"))
    assert trained is False


def test_flagship_config_loads_trained_when_asset_present():
    import os
    from fashion_nerf.assets import FLAGSHIP_CKPT
    params, trained = _bench_params(load_config("blender_lego"))
    assert trained is (os.path.exists(FLAGSHIP_CKPT))
