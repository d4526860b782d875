"""Benchmark harness (BASELINE.json:2: rays/sec/chip at 800×800 render).

run_bench(cfg) measures steady-state full-image render throughput of the
flagship coarse+fine model on the current chip and returns the one-line
metric dict the driver records. bench.py at the repo root wraps this.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.config import Config, load_config
from fashion_nerf.render.renderer import render_image
from fashion_nerf.train.loop import make_fields
from fashion_nerf.train.state import create_train_state

NORTH_STAR_RAYS_PER_SEC = 10_000_000  # BASELINE.json:5 target on v5e


def _bench_params(cfg: Config):
    """The committed trained flagship weights when they fit this cfg, else
    random init. Trained weights matter: occupancy culling and transmittance
    early-termination are structurally invisible at random init (~99.5% of
    samples stay alive — VERDICT r1), so benching them there understates the
    production renderer."""
    from fashion_nerf.assets import load_flagship
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    params = jax.device_get(state.params)
    loaded = load_flagship()
    if loaded is None:
        return params, False
    trained, meta = loaded
    # the asset is only a trained checkpoint FOR the config it was trained
    # under — llff_fern shares tree structure with blender weights but lives
    # in NDC space, where blender-world σ statistics are meaningless
    # (ADVICE r2); unknown-provenance assets (no config meta) are rejected too
    if str(meta.get("config", "")) != cfg.name:
        return params, False
    # key-path + shape comparison: tree_map raises on STRUCTURE mismatch
    # (e.g. tiny_lego has no fine net, try-on presets add encoder/latents),
    # so flatten both sides first (ADVICE r2 — 3 of 5 presets crashed here)
    flat_p = {jax.tree_util.keystr(k): v.shape for k, v in
              jax.tree_util.tree_leaves_with_path(params)}
    flat_t = {jax.tree_util.keystr(k): v.shape for k, v in
              jax.tree_util.tree_leaves_with_path(trained)}
    if flat_p.keys() != flat_t.keys() or any(
            flat_p[k] != flat_t[k] for k in flat_p):
        return params, False
    return trained, True


def run_bench(cfg: Config, H: int = 800, W: int = 800, warmup: int = 1,
              iters: int = 3) -> dict:
    """Render H×W with the cfg's sampling stack; report rays/sec/chip."""
    params, trained = _bench_params(cfg)
    field_c, field_f = make_fields(cfg)
    from fashion_nerf.kernels import kernels_enabled
    enabled = kernels_enabled(cfg)
    use_pallas = enabled and cfg.kernels.fused_render

    fc = functools.partial(field_c, params["coarse"])
    ff = (functools.partial(field_f, params["fine"])
          if cfg.sampling.n_fine > 0 else None)
    focal = 0.5 * W / np.tan(0.5 * 0.6911)   # blender-standard fov
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0

    # conditioned/latent presets need the per-scene cond vector (procedural
    # garment stack — the same stand-in train/eval use); None otherwise
    cond = None
    if cfg.model.conditioned or cfg.model.n_latents > 0:
        from fashion_nerf.train.loop import _eval_cond, resolve_garment
        garment = resolve_garment(cfg, {}, 64, 64)
        cond = _eval_cond(cfg, params, garment)

    occ = None
    if cfg.occupancy.enabled and trained:
        # one-time lattice sweep against the trained fine field (the culling
        # oracle must be the same net the renderer evaluates); params traced,
        # not constant-folded (see occupancy.build_jit)
        from fashion_nerf.core.occupancy import build_jit
        occ = (build_jit(cfg, field_f, params["fine"])
               if cfg.sampling.n_fine > 0
               else build_jit(cfg, field_c, params["coarse"]))

    blockwise = (enabled and cfg.kernels.blockwise and cfg.kernels.fused_mlp
                 and cfg.sampling.n_fine > 0)
    if blockwise and cfg.proposal.enabled and trained:
        # r4 (VERDICT r3 #1): distill (or load) the σ-only proposal net that
        # replaces the full-MLP coarse pass — one-time setup, outside the
        # timed loop, trained weights only (a random-init teacher is junk)
        from fashion_nerf.models.proposal import attach_proposal
        params = attach_proposal(cfg, params, occ=occ, cond=cond)
    if blockwise:
        # the production fast path: fused field blocks + per-tile
        # early-termination/culling skips (render/blockwise.py)
        from fashion_nerf.render.blockwise import render_image_blockwise
        render = jax.jit(lambda pose: render_image_blockwise(
            params, cfg, H, W, focal, pose, occ=occ, cond=cond)["rgb"])
    else:
        render = jax.jit(lambda pose: render_image(
            fc, ff, H, W, focal, pose, cfg, cond=cond,
            use_pallas_render=use_pallas, occ=occ)["rgb"])

    pose = jnp.asarray(c2w)

    def sync(out):
        # block_until_ready is a silent no-op through the axon tunnel;
        # pulling a scalar to host is the reliable completion barrier
        return float(out[0, 0, 0])

    for _ in range(warmup):
        sync(render(pose))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(render(pose))
    dt = (time.perf_counter() - t0) / iters

    rays_per_sec = H * W / dt
    n_c, n_f = cfg.sampling.n_coarse, cfg.sampling.n_fine
    if blockwise and occ is not None and (cfg.render.eval_n_coarse
                                          or cfg.render.eval_n_fine):
        # the blockwise path honors the render-time budget override, but
        # only under occupancy culling (render_rays_blockwise — ADVICE r3)
        n_c = cfg.render.eval_n_coarse or n_c
        n_f = (cfg.render.eval_n_fine or n_f) if n_f > 0 else 0
    prop_active = blockwise and isinstance(params, dict) \
        and "proposal" in params
    if prop_active:
        # σ-only proposal coarse pass (r4): the budgeted FULL-MLP evals are
        # the fine pass only (non-union), plus the tiny proposal march
        n_p = cfg.proposal.eval_n or n_c
        samples = ((n_p + n_f) if cfg.proposal.union
                   else n_f + cfg.proposal.cov_n)
        budget = (f"{samples} full-MLP + {n_p} proposal-MLP evals/ray")
    else:
        samples = n_c + (n_c + n_f if n_f > 0 else 0)
        budget = f"{samples} field evals/ray"
    return {
        "metric": f"rays/sec/chip at 800x800 render (coarse+fine, {budget})",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec",
        "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC, 4),
        "frame_seconds": round(dt, 4),
        "config": cfg.name,
        "pallas": bool(enabled),
        "blockwise": blockwise,
        "trained_ckpt": trained,
        "proposal": prop_active,
        "occupancy_cull": occ is not None,
        "device": str(jax.devices()[0]),
    }


def bench_train(cfg: Config, steps: int = 50, warmup: int = 10) -> dict:
    """Steady-state TRAINING throughput: rays/sec including backward +
    Adam, device-resident ray gather, one jit step (SURVEY.md §2.3 bench)."""
    from fashion_nerf.data.pipeline import RayDataset
    from fashion_nerf.data.synthetic import make_synthetic_scene
    from fashion_nerf.train.loop import make_train_step

    scene = make_synthetic_scene(n_views=8, H=64, W=64, n_samples=32)
    ds = RayDataset(scene["images"], scene["poses"], scene["focal"])
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, ds)
    all_rays = ds.batch_arrays()
    for _ in range(warmup):
        state, m = step(state, all_rays)
    float(m["loss"])                              # sync (see run_bench)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, all_rays)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    return {
        "metric": "train rays/sec/chip (fwd+bwd+adam)",
        "value": round(cfg.train.batch_rays / dt, 1),
        "unit": "rays/sec",
        "step_ms": round(dt * 1e3, 3),
        "config": cfg.name,
    }


# SURVEY.md §2.3 inventory name
bench_render = run_bench


def main():
    cfg = load_config("blender_lego")
    result = run_bench(cfg)
    import json
    print(json.dumps(result))


if __name__ == "__main__":
    main()
