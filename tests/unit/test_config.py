import pytest

from fashion_nerf.config import PRESETS, Config, load_config


def test_five_presets_exist():
    # the five acceptance configs of BASELINE.json:7-11
    for name in ["tiny_lego", "blender_lego", "llff_fern", "viton_tryon",
                 "dynamic_tryon"]:
        assert name in PRESETS


def test_presets_hashable():
    # frozen dataclasses must be usable as jit static args
    for cfg in PRESETS.values():
        hash(cfg)


def test_overrides():
    cfg = load_config("tiny_lego", ["train.iters=42", "render.white_bkgd=true",
                                    "sampling.n_fine=8", "train.lr_init=0.001"])
    assert cfg.train.iters == 42
    assert cfg.render.white_bkgd is True
    assert cfg.sampling.n_fine == 8
    assert cfg.train.lr_init == pytest.approx(1e-3)
    # original preset untouched
    assert PRESETS["tiny_lego"].train.iters != 42


def test_unknown_preset():
    with pytest.raises(KeyError):
        load_config("nope")


def test_unknown_field():
    with pytest.raises(KeyError):
        load_config("tiny_lego", ["train.nope=1"])


def test_llff_is_ndc():
    cfg = load_config("llff_fern")
    assert cfg.render.ndc and cfg.render.near == 0.0 and cfg.render.far == 1.0


def test_dynamic_has_latents():
    cfg = load_config("dynamic_tryon")
    assert cfg.model.n_latents > 0 and cfg.model.latent_dim > 0
