"""Try-on preprocessing tests (SURVEY.md §4.1: TPS interpolates control
points exactly; identity warp is identity; heatmap argmax = keypoint)."""

import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.tryon.flow import flow_warp
from fashion_nerf.tryon.pose import limb_maps, rasterize_keypoints
from fashion_nerf.tryon.segmentation import (dilate, erode, make_agnostic,
                                             parse_to_masks)
from fashion_nerf.tryon.tps import (fit_tps, grid_sample, tps_apply,
                                    tps_grid, tps_warp)


def test_tps_interpolates_control_points():
    rng = np.random.default_rng(0)
    src = rng.uniform(-0.8, 0.8, (8, 2)).astype(np.float32)
    dst = rng.uniform(-0.8, 0.8, (8, 2)).astype(np.float32)
    params = fit_tps(jnp.asarray(src), jnp.asarray(dst), reg=0.0)
    got = np.asarray(tps_apply(params, jnp.asarray(src)))
    np.testing.assert_allclose(got, dst, atol=1e-3)


def test_tps_identity():
    src = jnp.asarray(np.random.default_rng(1)
                      .uniform(-0.9, 0.9, (6, 2)).astype(np.float32))
    params = fit_tps(src, src)
    grid = tps_grid(params, 9, 9)
    ys = jnp.linspace(-1, 1, 9)
    xs = jnp.linspace(-1, 1, 9)
    gx, gy = jnp.meshgrid(xs, ys)
    want = jnp.stack([gx, gy], -1)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(want), atol=1e-3)


def test_grid_sample_identity_and_shift():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(size=(8, 8, 3)).astype(np.float32))
    ys = jnp.linspace(-1, 1, 8)
    gx, gy = jnp.meshgrid(ys, ys)
    grid = jnp.stack([gx, gy], -1)
    out = grid_sample(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # shift one pixel right in source coords: out[:, j] = img[:, j+1]
    grid_shift = grid.at[..., 0].add(2.0 / 7.0)
    out2 = np.asarray(grid_sample(img, grid_shift))
    np.testing.assert_allclose(out2[:, :-1], np.asarray(img)[:, 1:],
                               atol=1e-4)


def test_grid_sample_padding():
    img = jnp.ones((4, 4, 1))
    grid = jnp.full((2, 2, 2), 5.0)       # far out of bounds
    out = grid_sample(img, grid, padding_value=0.25)
    np.testing.assert_allclose(np.asarray(out), 0.25)


def test_tps_warp_identity_correspondences():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(size=(10, 10, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.7, 0.7, (6, 2)).astype(np.float32))
    out = tps_warp(img, pts, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_flow_warp_zero_flow():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(6, 6, 2)).astype(np.float32))
    out = flow_warp(img, jnp.zeros((6, 6, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_heatmap_argmax_at_keypoint():
    kpts = jnp.asarray([[10.0, 20.0, 1.0], [3.0, 4.0, 1.0],
                        [50.0, 50.0, 0.0]])
    heat = np.asarray(rasterize_keypoints(kpts, 32, 32, sigma=2.0))
    j0 = np.unravel_index(heat[..., 0].argmax(), (32, 32))
    assert j0 == (20, 10)        # (y, x)
    j1 = np.unravel_index(heat[..., 1].argmax(), (32, 32))
    assert j1 == (4, 3)
    assert heat[..., 2].max() == 0.0      # zero-confidence joint


def test_limb_maps():
    kpts = np.zeros((18, 3), np.float32)
    kpts[0] = [16, 4, 1]
    kpts[1] = [16, 28, 1]
    m = np.asarray(limb_maps(jnp.asarray(kpts), 32, 32, limbs=((0, 1),),
                             width=2.0))
    assert m[16, 16, 0] == 1.0          # on the segment
    assert m[16, 2, 0] == 0.0           # far from it
    assert m[2, 16, 0] == 1.0           # exactly `width` beyond the endpoint
    assert m[0, 16, 0] == 0.0           # clearly beyond


def test_parse_masks_and_agnostic():
    parse = np.zeros((16, 16), np.int32)
    parse[4:8, 4:12] = 5                 # upper garment
    parse[8:14, 5:11] = 9                # pants
    parse[2:4, 7:9] = 13                 # face
    masks = parse_to_masks(jnp.asarray(parse))
    assert np.asarray(masks["garment"]).sum() == 4 * 8
    assert np.asarray(masks["head"]).sum() == 2 * 2
    img = jnp.ones((16, 16, 3)) * 0.8
    agn, _ = make_agnostic(img, jnp.asarray(parse), dilate_radius=1,
                           fill_value=0.5)
    agn = np.asarray(agn)
    assert np.allclose(agn[5, 6], 0.5)          # garment region greyed
    assert np.allclose(agn[15, 15], 0.8)        # background untouched


def test_morphology():
    m = jnp.zeros((9, 9)).at[4, 4].set(1.0)
    d = np.asarray(dilate(m, 1))
    assert d[3:6, 3:6].min() == 1.0 and d.sum() == 9
    e = np.asarray(erode(jnp.asarray(d), 1))
    assert e[4, 4] == 1.0 and e.sum() == 1.0


def test_pipeline_and_encoder():
    from fashion_nerf.data.viton import synth_viton_pair
    from fashion_nerf.tryon.pipeline import build_conditioning
    from fashion_nerf.models.conditioned import GarmentEncoder, \
        encode_garment
    pair = synth_viton_pair(32, 32)
    cond = build_conditioning(pair, 32, 32)
    assert cond.shape == (32, 32, 7)
    assert bool(jnp.isfinite(cond).all())
    # warped cloth channel should land some cloth inside the torso region
    assert float(cond[..., 3].sum()) > 0   # warped mask nonzero
    enc = GarmentEncoder(out_dim=16)
    params = enc.init(jax.random.PRNGKey(0), cond[None])
    code = encode_garment(params, cond, enc)
    assert code.shape == (16,)
    assert bool(jnp.isfinite(code).all())
