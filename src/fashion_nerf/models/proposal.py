"""σ-only proposal field: a tiny MLP that shapes the fine-pass PDF at render
time in place of the full coarse network (VERDICT r3 #1; mip-NeRF-360's
proposal-net pattern, PAPERS.md, re-thought for the blockwise TPU march).

Why this exists: in hierarchical eval-mode rendering the coarse pass's ONLY
consumer is `sample_pdf` — its rgb never reaches the image (the renderer
composites the fine head). Yet it costs a full 8×256 MLP march per ray
(measured r3: 5.1 of every 14.4 ms live chunk). A 2×128 σ-only net does the
same PDF-shaping job at ~7% of the FLOPs, and because it is expressed as a
standard `ModelConfig`, the existing Pallas substrate (pack_params/mlp_rows/
the carry march) runs it unchanged — no new kernel code.

The proposal is DISTILLED from the trained fine field at render setup
(`distill_proposal`): a few hundred Adam steps matching log(1 + σ) at random
points inside the occupancy box (plus a slice of the full world box so
exterior density stays pinned at the teacher's zero). One-time seconds
on-chip; the committed asset (assets/proposal_synthetic.npz) amortizes it for
bench/CI. Training of the main model is untouched.

Reference@v1 ships no code (/root/reference/README.md:1-2); the proposal-
sampling idea follows mip-NeRF 360 (PAPERS.md) — here distilled post-hoc
rather than trained online, because the render-time PDF is the only consumer.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from fashion_nerf.config import Config, ModelConfig


def proposal_model_config(cfg: Config) -> ModelConfig:
    """The proposal net expressed as a ModelConfig so the whole field stack
    (flax init, XLA field, pack_params, fused kernels, the carry march)
    applies verbatim. σ-only by construction: no view branch, no cond, and
    callers ignore the (untrained) rgb lanes of out_head."""
    p = cfg.proposal
    return ModelConfig(
        net_depth=p.net_depth, net_width=p.net_width, skips=(),
        posenc_xyz=p.posenc_xyz, posenc_dir=4, use_viewdirs=False,
        sigma_activation=cfg.model.sigma_activation,
        compute_dtype=cfg.model.compute_dtype,
        conditioned=False, n_latents=0)


def init_proposal(key, cfg: Config):
    from fashion_nerf.models.nerf_mlp import init_field
    return init_field(key, proposal_model_config(cfg))


def distill_proposal(cfg: Config, teacher: Callable, key,
                     box_min=None, box_max=None,
                     steps: Optional[int] = None) -> dict:
    """Fit the proposal σ to a trained teacher field by log-density matching.

    Args:
      teacher: bound field fn (pts (R,S,3), viewdirs (R,3), cond) → (rgb,
        σ-raw) — the repo-wide convention; pass the fine net with trained
        params (and the per-scene cond closed over, for conditioned models).
      box_min/box_max: (3,) sampling region for 7/8 of the points (the
        occupancy AABB when available); the remaining 1/8 samples the full
        occupancy.world box so σ outside stays matched to the teacher's
        (≈ zero on sparsity-trained checkpoints).
      steps: override cfg.proposal.distill_steps (tests use a few).

    Returns the proposal param tree. Deterministic given `key`.
    """
    import optax

    from fashion_nerf.models.nerf_mlp import make_field

    pcfg = cfg.proposal
    steps = int(pcfg.distill_steps if steps is None else steps)
    batch = int(pcfg.distill_batch)
    pm = proposal_model_config(cfg)
    _, pfield = make_field(pm)

    wmin = jnp.broadcast_to(
        jnp.asarray(cfg.occupancy.world_min, jnp.float32), (3,))
    wmax = jnp.broadcast_to(
        jnp.asarray(cfg.occupancy.world_max, jnp.float32), (3,))
    bmin = wmin if box_min is None else jnp.asarray(box_min, jnp.float32)
    bmax = wmax if box_max is None else jnp.asarray(box_max, jnp.float32)

    act = (jax.nn.softplus if cfg.model.sigma_activation == "softplus"
           else jax.nn.relu)
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], jnp.float32),
                            (batch, 3))

    k_init, k_data = jax.random.split(key)
    params = init_proposal(k_init, cfg)
    tx = optax.adam(optax.cosine_decay_schedule(pcfg.distill_lr, steps))
    opt_state = tx.init(params)

    def loss_fn(p, pts, y):
        _, s_raw = pfield(p, pts, dirs, None)
        return jnp.mean((jnp.log1p(act(s_raw[:, 0])) - y) ** 2)

    def one_step(carry, i):
        p, opt = carry
        ka, kb = jax.random.split(jax.random.fold_in(k_data, i))
        u = jax.random.uniform(ka, (batch, 1, 3))
        # 7/8 inside the (tight) teacher box, 1/8 across the world box so
        # exterior σ trains to the teacher's near-zero instead of drifting
        in_box = bmin + u * (bmax - bmin)
        in_world = wmin + u * (wmax - wmin)
        sel = (jax.random.uniform(kb, (batch, 1, 1)) < 0.875)
        pts = jnp.where(sel, in_box, in_world)
        _, s_t = teacher(pts, dirs, None)
        y = jax.lax.stop_gradient(jnp.log1p(act(s_t[:, 0])))
        loss, grads = jax.value_and_grad(loss_fn)(p, pts, y)
        updates, opt = tx.update(grads, opt, p)
        return (optax.apply_updates(p, updates), opt), loss

    # the whole distillation is ONE jit (lax.scan over steps): a host-side
    # step loop would pay an eager-dispatch round-trip through the axon
    # tunnel per iteration (~seconds each — CLAUDE.md environment notes)
    @jax.jit
    def run(p, opt):
        (p, _), losses = jax.lax.scan(one_step, (p, opt),
                                      jnp.arange(steps, dtype=jnp.int32))
        return p, losses[-1]

    params, loss = run(params, opt_state)
    # one host sync at the end (the tunnel makes per-step syncs costly)
    print(f"fashion-nerf: proposal distilled in {steps} steps, "
          f"final log-density MSE {float(loss):.4g}", file=sys.stderr)
    return jax.device_get(params)


def _teacher_signature(fine_params) -> str:
    """Content hash of the teacher weights, stored in the proposal asset's
    meta so a retrained flagship invalidates it.

    sha256 over every leaf's exact f32 bytes in path-sorted order (VERDICT r4
    weak #2: the previous abs-weight-sum fingerprint would silently accept a
    retrained teacher with similar weight mass, mis-shaping every production
    PDF). Any single-weight change flips the digest."""
    import hashlib

    import numpy as np

    from fashion_nerf.assets import _flatten
    flat = _flatten(fine_params)
    h = hashlib.sha256()
    for k in sorted(flat):
        h.update(k.encode())
        h.update(np.ascontiguousarray(
            np.asarray(flat[k], dtype=np.float32)).tobytes())
    return h.hexdigest()


def attach_proposal(cfg: Config, params: dict, occ=None, cond=None,
                    key=None, allow_distill: bool = True,
                    use_asset: bool = True) -> dict:
    """Return a shallow copy of `params` with the "proposal" entry attached
    (render setup helper for bench/CLI). Resolution order:

      1. committed asset (assets/proposal_synthetic.npz) when its meta
         matches this config and these fine weights;
      2. on-the-fly distillation from params["fine"] (one-time, seconds
         on-chip) when `allow_distill`;
      3. no-op (the blockwise renderer falls back to the full coarse pass
         when the key is absent).

    `occ`: optional OccupancyState — tightens the distillation sampling box.
    `cond`: per-scene conditioning vector for conditioned teachers (the
    proposal itself is unconditioned; it is distilled FOR this cond).
    """
    if not (cfg.proposal.enabled and cfg.sampling.n_fine > 0
            and "fine" in params):
        return params
    import os

    import numpy as np

    from fashion_nerf.assets import ASSETS_DIR, load_params, save_params

    sig = _teacher_signature(params["fine"])
    asset = os.path.join(ASSETS_DIR, "proposal_synthetic.npz")
    if use_asset and os.path.exists(asset):
        prop, meta = load_params(asset)
        if (str(meta.get("config", "")) == cfg.name
                and str(meta.get("teacher_sig", "")) == sig
                and int(meta.get("net_depth", -1)) == cfg.proposal.net_depth
                and int(meta.get("net_width", -1)) == cfg.proposal.net_width
                and int(meta.get("posenc", -1)) == cfg.proposal.posenc_xyz):
            return {**params, "proposal": prop}
    if not allow_distill:
        return params

    from fashion_nerf.models.nerf_mlp import make_field
    _, field = make_field(cfg.model)
    import functools
    if cond is not None:
        cvec = jnp.asarray(cond)

        def teacher(pts, dirs, _c):
            c = jnp.broadcast_to(cvec, (pts.shape[0], cvec.shape[-1]))
            return field(params["fine"], pts, dirs, c)
    else:
        teacher = functools.partial(field, params["fine"])
    bmin = occ.box_min if occ is not None else None
    bmax = occ.box_max if occ is not None else None
    prop = distill_proposal(cfg, teacher,
                            key if key is not None else jax.random.PRNGKey(7),
                            box_min=bmin, box_max=bmax)
    return {**params, "proposal": prop}


def save_proposal_asset(cfg: Config, prop_params, fine_params,
                        path: Optional[str] = None) -> str:
    """Commit a distilled proposal so bench/CI skip the distillation
    (scripts/make_proposal_asset.py)."""
    import os

    from fashion_nerf.assets import ASSETS_DIR, save_params

    path = path or os.path.join(ASSETS_DIR, "proposal_synthetic.npz")
    save_params(path, prop_params, meta={
        "config": cfg.name,
        "teacher_sig": _teacher_signature(fine_params),
        "net_depth": cfg.proposal.net_depth,
        "net_width": cfg.proposal.net_width,
        "posenc": cfg.proposal.posenc_xyz,
    })
    return path
