"""Ray pipeline (BASELINE.json:5 "device-side prefetch feeding the ray sampler").

TPU-native design: when the full ray set fits HBM (all standard NeRF scenes —
100×800²×9 floats ≈ 2.3 GB), precompute every (origin, dir, rgb) ONCE, park
the tensors on device, and let the jitted train step gather its batch by
random indices. The host never touches the hot loop (SURVEY.md §7 hard-part 6).

For datasets that exceed HBM, `prefetch_to_device` provides the classic
double-buffered host→device iterator as the fallback path.
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.core.cameras import generate_rays, ndc_rays


class RayDataset:
    """Device-resident precomputed rays for N posed images.

    Attributes (jnp arrays on device):
      rays_o, rays_d, viewdirs: (N·H·W, 3)
      rgb: (N·H·W, 3)
      frame_ids: (N·H·W,) int32 — image index per ray (latent-code lookup)
      center_mask_idx: indices of center-crop rays (precrop phase)
    """

    def __init__(self, images: np.ndarray, poses: np.ndarray, focal: float,
                 ndc: bool = False, H: Optional[int] = None,
                 W: Optional[int] = None, precrop_frac: float = 0.5,
                 sharding=None):
        N, H_, W_ = images.shape[:3]
        H, W = H or H_, W or W_

        # one jit over vmapped pose batch: eager per-pose ray generation costs
        # seconds per dispatch through the TPU tunnel (see verify SKILL.md)
        @jax.jit
        def _all_rays(poses_arr):
            o, d = jax.vmap(lambda p: generate_rays(H, W, focal, p))(poses_arr)
            o = o.reshape(-1, 3)
            d = d.reshape(-1, 3)
            if ndc:
                no, nd = ndc_rays(H, W, focal, 1.0, o, d)
                return no, nd, d
            return o, d, d

        rays_o, rays_d, viewdirs = _all_rays(jnp.asarray(np.asarray(poses)))
        rgb = jnp.asarray(images.reshape(-1, 3))
        frame_ids = jnp.repeat(jnp.arange(N, dtype=jnp.int32), H * W)

        # center-crop ray indices for the precrop warmup phase
        dh, dw = int(H // 2 * precrop_frac), int(W // 2 * precrop_frac)
        jj, ii = np.meshgrid(
            np.arange(H // 2 - dh, H // 2 + dh),
            np.arange(W // 2 - dw, W // 2 + dw), indexing="ij")
        per_img = (jj * W + ii).reshape(-1)
        crop = (np.arange(N)[:, None] * (H * W) + per_img[None]).reshape(-1)
        crop_idx = jnp.asarray(crop, jnp.int32)

        if sharding is not None:
            rays_o = jax.device_put(rays_o, sharding)
            rays_d = jax.device_put(rays_d, sharding)
            viewdirs = jax.device_put(viewdirs, sharding)
            rgb = jax.device_put(rgb, sharding)

        self.rays_o, self.rays_d = rays_o, rays_d
        self.viewdirs, self.rgb = viewdirs, rgb
        self.frame_ids = frame_ids
        self.crop_idx = crop_idx
        self.n_rays = int(rays_o.shape[0])
        self.H, self.W, self.focal, self.N = H, W, focal, N

    def batch_arrays(self):
        """The pytree the jitted train step gathers from (device-resident)."""
        return {
            "rays_o": self.rays_o, "rays_d": self.rays_d,
            "viewdirs": self.viewdirs, "rgb": self.rgb,
            "frame_ids": self.frame_ids,
        }


def sample_batch(all_rays: dict, key, batch_rays: int, n_total: int,
                 crop_idx=None, step=None, precrop_iters: int = 0):
    """Gather a random ray batch entirely on device (called inside jit —
    this IS the train step's gather, train/loop.make_train_step).

    With crop_idx given, indices come from the center-crop subset (precrop
    warmup, canonical NeRF trick for blender scenes) — unconditionally when
    `step` is None, else only while step < precrop_iters (a traced switch,
    so one jitted step serves both phases).
    """
    idx = jax.random.randint(key, (batch_rays,), 0, n_total)
    if crop_idx is not None:
        sel = jax.random.randint(jax.random.fold_in(key, 1), (batch_rays,),
                                 0, crop_idx.shape[0])
        idx = (crop_idx[sel] if step is None
               else jnp.where(step < precrop_iters, crop_idx[sel], idx))
    return {k: jnp.take(v, idx, axis=0) for k, v in all_rays.items()}


def host_batch_iter(all_rays: dict, batch_rays: int, seed: int = 0):
    """Host-side random ray batches as numpy — the source feeding
    prefetch_to_device on the streaming path (cfg.data.stream) for datasets
    that exceed HBM. Precrop is not supported here (streaming runs resume
    long after the warmup phase)."""
    host = {k: np.asarray(v) for k, v in all_rays.items()}
    n_total = host["rays_o"].shape[0]
    rng = np.random.default_rng(seed)
    while True:
        idx = rng.integers(0, n_total, batch_rays)
        yield {k: v[idx] for k, v in host.items()}


def prefetch_to_device(iterator: Iterator, size: int = 2, sharding=None):
    """Double-buffered host→device prefetch — the fallback path for datasets
    that exceed HBM. Keeps `size` batches in flight so device_put overlaps
    with the previous step's compute."""
    queue = collections.deque()

    def _put(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    for batch in itertools.islice(iterator, size):
        queue.append(_put(batch))
    while queue:
        out = queue.popleft()
        nxt = next(iterator, None)
        if nxt is not None:
            queue.append(_put(nxt))
        yield out


def ray_dataset(cfg, images, poses, focal, **kw):
    """SURVEY.md §2.2 inventory name: construct the device-resident ray set
    for a config (ndc/precrop follow cfg)."""
    return RayDataset(images, poses, focal, ndc=cfg.render.ndc,
                      precrop_frac=cfg.train.precrop_frac, **kw)
