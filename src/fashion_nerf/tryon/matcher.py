"""Learned garment-correspondence matcher (VERDICT r2 #8; BASELINE.json:10).

CP-VTON's GMM [EXT] learns the cloth→person geometric map end-to-end; the
procedural stand-ins here (tryon/pipeline.py: bbox→torso, then the r2
keypoint-grid silhouette correspondences) approximate it with hand rules.
This module closes the remaining gap TPU-natively: a small two-tower conv
matcher predicts RESIDUAL offsets to the keypoint-grid TPS target points
from (agnostic person stack, cloth stack) — zero output = the procedural
baseline, so the fallback is graceful — and trains directly on warp
quality (soft-IoU of the TPS-warped cloth mask against the person's
garment-parse region) through the differentiable TPS solve + grid sample.

Everything is static-shape and jit-compiled: conv towers on the MXU, one
(K+3) TPS solve per pair, batch via vmap. Trained hermetically on the
randomized procedural pair distribution (data/viton.py synth_viton_pair
seed≠0); tests hold out unseen seeds and require the learned warp to beat
the keypoint-grid baseline on IoU.

Reference@v1 ships no try-on code (/root/reference/README.md:1-2).
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fashion_nerf.tryon.pipeline import keypoint_grid_correspondences
from fashion_nerf.tryon.tps import fit_tps, grid_sample, tps_grid

K_ROWS = 6                      # matches keypoint_grid_correspondences
N_PTS = 3 * K_ROWS
RESIDUAL_SCALE = 0.25           # max |offset| in normalized [-1, 1] coords

# committed trained weights (scripts/make_matcher_asset.py); production
# preprocessing picks these up by default (cfg.tryon.use_matcher)
import os as _os

from fashion_nerf.assets import ASSETS_DIR

MATCHER_CKPT = _os.path.join(ASSETS_DIR, "matcher_synthetic.npz")


def save_matcher(params, path: str = MATCHER_CKPT, meta: dict = None):
    from fashion_nerf.assets import save_params
    save_params(path, params, meta=meta)


@functools.lru_cache(maxsize=4)
def _load_matcher_cached(path: str, mtime: float):
    from fashion_nerf.assets import load_params
    params, _meta = load_params(path)
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_matcher(path: str = ""):
    """The committed matcher weights as a device pytree, or None when the
    asset is absent (procedural keypoint-grid fallback — the exact
    zero-residual limit of the matcher). Cached per (path, mtime)."""
    path = path or MATCHER_CKPT
    if not _os.path.exists(path):
        return None
    return _load_matcher_cached(path, _os.path.getmtime(path))


class GarmentMatcher(nn.Module):
    """Two-tower conv matcher → (N_PTS, 2) residual target offsets."""

    width: int = 32

    @nn.compact
    def __call__(self, person_feats, cloth_feats):
        """person_feats (H, W, 5): agnostic rgb ⊕ garment_mask ⊕ pose_map;
        cloth_feats (H, W, 4): cloth rgb ⊕ cloth_mask.
        → (N_PTS, 2) residual offsets in normalized coords."""
        def tower(x, name):
            for i, ch in enumerate((self.width, self.width, 2 * self.width)):
                x = nn.Conv(ch, (3, 3), strides=(2, 2),
                            name=f"{name}_conv{i}")(x)
                x = nn.relu(x)
            return x

        p = tower(person_feats[None], "person")
        c = tower(cloth_feats[None], "cloth")
        h = jnp.concatenate([p, c], axis=-1)
        h = nn.relu(nn.Conv(2 * self.width, (3, 3), name="mix")(h))
        h = jnp.mean(h, axis=(1, 2))                    # (1, 2·width)
        h = nn.relu(nn.Dense(2 * self.width, name="head0")(h))
        out = nn.Dense(N_PTS * 2, name="head1",
                       kernel_init=nn.initializers.zeros)(h)
        return RESIDUAL_SCALE * jnp.tanh(out.reshape(N_PTS, 2))


def _pair_features(pre: dict, cloth, cloth_mask):
    person = jnp.concatenate([
        pre["agnostic"],
        pre["garment_mask"][..., None],
        jnp.max(pre["pose_heat"], axis=-1, keepdims=True),
    ], axis=-1)                                          # (H, W, 5)
    cl = jnp.concatenate([cloth, cloth_mask[..., None]], axis=-1)
    return person, cl


def matched_warp(params, module: GarmentMatcher, pre: dict, cloth,
                 cloth_mask, keypoints, H: int, W: int):
    """Warp `cloth` with the learned correspondences: keypoint-grid src/dst
    plus the matcher's residual on dst. Returns (warped_cloth, warped_mask,
    dst). params None ⇒ pure procedural baseline (zero residual)."""
    src, dst = keypoint_grid_correspondences(
        cloth_mask, pre["garment_mask"], keypoints, H, W, k_rows=K_ROWS)
    if params is not None:
        person, cl = _pair_features(pre, cloth, cloth_mask)
        dst = dst + module.apply(params, person, cl)
    tps = fit_tps(dst, src)       # backward map: person frame → cloth
    grid = tps_grid(tps, H, W)
    warped_cloth = grid_sample(cloth, grid, padding_value=1.0)
    warped_mask = grid_sample(cloth_mask[..., None], grid)[..., 0]
    return warped_cloth, warped_mask, dst


def soft_iou(a, b, eps: float = 1e-6):
    inter = jnp.sum(a * b)
    union = jnp.sum(a + b - a * b)
    return inter / (union + eps)


def _device_pair(pair: dict, H: int, W: int):
    from fashion_nerf.tryon.pipeline import _preprocess_device
    pre = _preprocess_device(
        jnp.asarray(pair["image"]), jnp.asarray(pair["cloth"]),
        jnp.asarray(pair["cloth_mask"]), jnp.asarray(pair["parse"]),
        jnp.asarray(pair["keypoints"]), H=H, W=W)
    return pre


def make_batch(seeds, H: int = 64, W: int = 64):
    """Stacked device arrays for a batch of procedural pairs."""
    import numpy as np
    from fashion_nerf.data.viton import synth_viton_pair

    pairs = [synth_viton_pair(H, W, seed=s) for s in seeds]
    stack = {k: jnp.asarray(np.stack([p[k] for p in pairs]))
             for k in ("image", "cloth", "cloth_mask", "parse", "keypoints")}
    return stack


def train_matcher(key, steps: int = 200, batch: int = 8, H: int = 64,
                  W: int = 64, lr: float = 3e-4, seed0: int = 1):
    """Train on the randomized procedural distribution; returns
    (params, module, history). Hermetic, single-jit step, vmap over the
    batch (SURVEY.md test discipline — CPU-runnable)."""
    import numpy as np
    import optax

    from fashion_nerf.tryon.pipeline import _preprocess_device

    module = GarmentMatcher()
    probe = make_batch([seed0], H, W)

    def single_loss(params, image, cloth, cloth_mask, parse, keypoints):
        pre = _preprocess_device(image, cloth, cloth_mask, parse,
                                 keypoints, H=H, W=W)
        _, wm, dst = matched_warp(params, module, pre, cloth, cloth_mask,
                                  keypoints, H, W)
        tgt = pre["garment_mask"]
        iou = soft_iou(wm, tgt)
        src, dst0 = keypoint_grid_correspondences(
            cloth_mask, tgt, keypoints, H, W, k_rows=K_ROWS)
        reg = jnp.mean((dst - dst0) ** 2)
        return 1.0 - iou + 0.01 * reg, iou

    pre0 = _device_pair({k: np.asarray(v[0]) for k, v in probe.items()},
                        H, W)
    person0, cloth0 = _pair_features(
        pre0, probe["cloth"][0], probe["cloth_mask"][0])
    params = module.init(key, person0, cloth0)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch_arrs):
        def loss_fn(p):
            losses, ious = jax.vmap(
                lambda im, cl, cm, pa, kp: single_loss(p, im, cl, cm, pa,
                                                       kp))(
                batch_arrs["image"], batch_arrs["cloth"],
                batch_arrs["cloth_mask"], batch_arrs["parse"],
                batch_arrs["keypoints"])
            return jnp.mean(losses), jnp.mean(ious)

        (loss, iou), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        return params, opt_state, loss, iou

    history = []
    rng = np.random.default_rng(seed0)
    for i in range(steps):
        seeds = rng.integers(1, 1_000_000, batch).tolist()
        arrs = make_batch(seeds, H, W)
        params, opt_state, loss, iou = step(params, opt_state, arrs)
        if (i + 1) % max(1, steps // 10) == 0:
            history.append({"step": i + 1, "loss": float(loss),
                            "iou": float(iou)})
    return params, module, history


def eval_iou(params, module, seeds, H: int = 64, W: int = 64):
    """Mean warped-mask IoU over held-out pairs, learned vs the
    keypoint-grid baseline (params=None)."""
    import numpy as np
    from fashion_nerf.data.viton import synth_viton_pair

    def one(pair):
        pre = _device_pair(pair, H, W)
        cloth = jnp.asarray(pair["cloth"])
        cm = jnp.asarray(pair["cloth_mask"])
        kp = jnp.asarray(pair["keypoints"])
        _, wm_l, _ = matched_warp(params, module, pre, cloth, cm, kp, H, W)
        _, wm_b, _ = matched_warp(None, module, pre, cloth, cm, kp, H, W)
        tgt = (pre["garment_mask"] > 0.5).astype(jnp.float32)
        return (float(soft_iou((wm_l > 0.5).astype(jnp.float32), tgt)),
                float(soft_iou((wm_b > 0.5).astype(jnp.float32), tgt)))

    scores = [one(synth_viton_pair(H, W, seed=s)) for s in seeds]
    learned = sum(s[0] for s in scores) / len(scores)
    baseline = sum(s[1] for s in scores) / len(scores)
    return learned, baseline
