"""L4 — the pjit'd train step and the training driver (SURVEY.md §3.1).

One jit encloses the entire step: ray-batch gather from device-resident
tensors, coarse+fine render, MSE loss, Adam update. Nothing inside touches
the host (BASELINE.json:5 "instead of a host-side Python loop"). Under a
device mesh the same step is sharded DP-over-rays by dist/mesh.py; the
gradient psum is inserted by XLA from the sharding annotations.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from fashion_nerf.config import Config
from fashion_nerf.data.pipeline import RayDataset
from fashion_nerf.metrics import mse_to_psnr, psnr as psnr_fn
from fashion_nerf.models.nerf_mlp import make_field
from fashion_nerf.render.renderer import render_rays, render_image
from fashion_nerf.train.state import TrainState, create_train_state, \
    make_optimizer


def make_fields(cfg: Config, training: bool = False):
    """Build (field_coarse, field_fine) UNBOUND field fns taking params
    explicitly: field(params, pts, viewdirs, cond).

    Render/eval honor cfg.kernels (Pallas fused MLP). Training uses the
    fused field only when kernels.fused_backward provides the Pallas VJP
    (in-kernel recompute + dgrad/wgrad); without it the custom VJP recomputes
    the forward through XLA inside jax.grad — an extra full forward
    (measured: 72.7k → 48.8k rays/s train) for no gradient benefit."""
    _, field = make_field(cfg.model)
    from fashion_nerf.kernels import kernels_enabled
    if kernels_enabled(cfg) and cfg.kernels.fused_mlp and (
            not training or cfg.kernels.fused_backward):
        from fashion_nerf.kernels.posenc_mlp_pallas import make_fused_field
        return make_fused_field(cfg), make_fused_field(cfg)
    return field, field


def make_train_step(cfg: Config, dataset: RayDataset, mesh=None,
                    garment=None, streamed: bool = False,
                    occ_culled: bool = False):
    """Returns a jitted step: (state, all_rays) → (state, metrics dict) —
    or, with occ_culled=True, (state, all_rays, occ) → (state, metrics).

    With a mesh, the gathered ray batch is constrained to shard over the
    "dp" axis; params follow their own (replicated or tp-sharded) placement
    and XLA inserts the gradient psum over ICI (SURVEY.md §2.4).

    `garment`: optional (H, W, 7) conditioning stack (tryon/pipeline.py);
    encoded once per step by GarmentEncoder and broadcast to every ray.

    occ_culled (r3, VERDICT r2 #3): the occupancy-accelerated step — the
    REDUCED budget (train.occ_coarse + occ_fine) concentrated inside each
    ray's occupied interval (render_rays' occ path), taking the live
    OccupancyState as a traced argument so grid refreshes don't recompile.
    """
    if occ_culled:
        import dataclasses
        cfg = dataclasses.replace(cfg, sampling=dataclasses.replace(
            cfg.sampling, n_coarse=cfg.train.occ_coarse,
            n_fine=(cfg.train.occ_fine if cfg.sampling.n_fine > 0 else 0)))
    field_c, field_f = make_fields(cfg, training=True)
    tx = make_optimizer(cfg)
    use_fine = cfg.sampling.n_fine > 0
    n_total = dataset.n_rays
    crop_idx = dataset.crop_idx if cfg.train.precrop_iters > 0 else None
    # same rationale as make_fields(training=True): the fused volrend's VJP
    # recomputes through XLA, costing an extra forward inside grad
    use_pallas_render = False
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = NamedSharding(mesh, P("dp"))
    else:
        batch_sharding = None

    def loss_fn(params, batch, key, occ=None):
        cond = _make_cond(cfg, params, batch, garment)
        fc = functools.partial(_with_viewdirs(field_c), params["coarse"],
                               batch["viewdirs"])
        ff = (functools.partial(_with_viewdirs(field_f), params["fine"],
                                batch["viewdirs"]) if use_fine else None)
        out = render_rays(fc, ff, batch["rays_o"], batch["rays_d"], key, cfg,
                          train=True, cond=cond,
                          use_pallas_render=use_pallas_render, occ=occ)
        loss_c = jnp.mean((out["coarse"]["rgb"] - batch["rgb"]) ** 2)
        loss = loss_c
        loss_f = loss_c
        if use_fine:
            loss_f = jnp.mean((out["fine"]["rgb"] - batch["rgb"]) ** 2)
            loss = loss_c + loss_f
        aux = {"mse_coarse": loss_c, "mse_fine": loss_f}
        if cfg.train.sparsity_weight > 0.0:
            loss_sp = _sparsity_loss(cfg, params, field_c, field_f,
                                     jax.random.fold_in(key, 17), cond)
            loss = loss + cfg.train.sparsity_weight * loss_sp
            aux["sparsity"] = loss_sp
        return loss, aux

    def train_step(state: TrainState, all_rays: dict, occ=None):
        key, k_idx, k_render = jax.random.split(state.key, 3)
        if streamed:
            # cfg.data.stream: the batch arrives pre-gathered from the
            # host prefetch iterator (datasets > HBM)
            batch = all_rays
        else:
            # device-side ray-batch gather (no host in the loop)
            from fashion_nerf.data.pipeline import sample_batch
            batch = sample_batch(all_rays, k_idx, cfg.train.batch_rays,
                                 n_total, crop_idx=crop_idx, step=state.step,
                                 precrop_iters=cfg.train.precrop_iters)
        if batch_sharding is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, jax.tree_util.tree_map(lambda _: batch_sharding,
                                              batch))

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, k_render, occ)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, key=key)
        metrics = {"loss": loss, "psnr": mse_to_psnr(aux["mse_fine"]),
                   **aux}
        return new_state, metrics

    if occ_culled:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(lambda state, all_rays: train_step(state, all_rays),
                   donate_argnums=(0,))


def _sparsity_loss(cfg: Config, params, field_c, field_f, key, cond):
    """Cauchy density prior log(1 + σ²/2) at uniform world points (the
    occupancy scan box). Saturates for solid interiors (penalizes existence,
    not magnitude) while unobserved floaters — which see no reconstruction
    gradient at all — decay to zero, keeping core/occupancy.py's grid tight.
    Applied to both nets so the coarse PDF stays consistent with the fine
    field it steers."""
    n = cfg.train.sparsity_points
    pts = jax.random.uniform(
        key, (n, 1, 3), minval=cfg.occupancy.world_min,
        maxval=cfg.occupancy.world_max)
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (n, 3))
    cond_pt = None
    if cond is not None:
        cond_pt = jnp.broadcast_to(cond[:1], (n, cond.shape[-1]))
    act = (jax.nn.softplus if cfg.model.sigma_activation == "softplus"
           else jax.nn.relu)
    total = 0.0
    for params_k, field in (("coarse", field_c), ("fine", field_f)):
        if field is None or params_k not in params:
            continue
        _, sigma_raw = field(params[params_k], pts, dirs, cond_pt)
        total = total + jnp.mean(jnp.log1p(0.5 * act(sigma_raw) ** 2))
    return total


@functools.lru_cache(maxsize=8)
def _occ_refresh_fn(cfg: Config):
    """One jitted grid builder per cfg (ADVICE r3 / VERDICT r3 weak #1): a
    fresh jit(lambda) per refresh retraced + recompiled the full G³ lattice
    sweep every occ_refresh_every steps — the Pallas-field sweep compiles in
    ~15 s through the remote-compile tunnel, so a 200k-step run paid ~400
    recompiles the 3k-step benchmark could not see. params and cond_vec are
    traced args, so every refresh after the first reuses the executable
    (cond_vec=None vs array traces once each)."""
    from fashion_nerf.core.occupancy import build_from_config
    field_c, field_f = make_fields(cfg)
    use_fine = cfg.sampling.n_fine > 0

    def build(params, cond_vec):
        def union_field(pts, dirs, cond):
            if cond is None and cond_vec is not None:
                cond = jnp.broadcast_to(cond_vec, (pts.shape[0],
                                                   cond_vec.shape[-1]))
            rgb, s = field_c(params["coarse"], pts, dirs, cond)
            if use_fine:
                _, s2 = field_f(params["fine"], pts, dirs, cond)
                s = jnp.maximum(s, s2)
            return rgb, s

        return build_from_config(cfg, union_field)

    return jax.jit(build)


def refresh_occupancy(cfg: Config, params, cond_vec=None):
    """Rebuild the training-time culling grid from the LIVE fields (r3,
    VERDICT r2 #3 — NerfAcc's periodic grid refresh). σ is the max over
    coarse and fine so both nets' culled ranges are sound. params traced,
    never constant-folded (occupancy.build_jit rationale); the jitted
    builder is cached per cfg so refreshes never retrace. cond_vec: the
    per-scene conditioning vector for conditioned fields."""
    return _occ_refresh_fn(cfg)(params, cond_vec)


def _with_viewdirs(field):
    """Adapt field(params, pts, viewdirs, cond) to the renderer's bound-field
    convention where viewdirs is captured (renderer passes rays_d which in
    NDC mode is not the view direction)."""
    def bound(params, viewdirs, pts, _rays_d, cond):
        return field(params, pts, viewdirs, cond)
    return bound


def _make_cond(cfg: Config, params, batch, garment=None):
    """Assemble per-ray conditioning features: garment encoding and/or
    per-frame latent codes (BASELINE.json:10-11)."""
    n_rays = batch["rays_o"].shape[0]
    parts = []
    if cfg.model.conditioned and "encoder" in params and garment is not None:
        from fashion_nerf.models.conditioned import GarmentEncoder, \
            encode_garment
        enc = GarmentEncoder(out_dim=cfg.model.condition_dim)
        code = encode_garment(params["encoder"], garment, enc)  # (Cc,)
        parts.append(jnp.broadcast_to(code, (n_rays, code.shape[-1])))
    if cfg.model.n_latents > 0 and "latents" in params:
        from fashion_nerf.models.latents import LatentTable
        table = LatentTable(cfg.model.n_latents, cfg.model.latent_dim)
        ids = jnp.clip(batch["frame_ids"], 0, cfg.model.n_latents - 1)
        parts.append(table.apply(params["latents"], ids))
    if not parts:
        return None
    return jnp.concatenate(parts, axis=-1)


@functools.lru_cache(maxsize=8)
def _eval_render_fn(cfg: Config, H: int, W: int, focal: float,
                    has_cond: bool):
    """One jitted whole-image eval renderer per (cfg, H, W, focal): params,
    pose, and cond are traced args so periodic in-training evals reuse the
    executable instead of dispatching pad/reshape/unchunk ops eagerly (each
    eager op costs a round-trip through the axon tunnel — ADVICE r1)."""
    field_c, field_f = make_fields(cfg)

    def _render(params, pose, cond):
        fc = functools.partial(_eval_field(field_c), params["coarse"])
        ff = (functools.partial(_eval_field(field_f), params["fine"])
              if cfg.sampling.n_fine > 0 else None)
        from fashion_nerf.kernels import kernels_enabled
        return render_image(fc, ff, H, W, focal, pose, cfg, cond=cond,
                            use_pallas_render=kernels_enabled(cfg)
                            and cfg.kernels.fused_render)

    return jax.jit(_render)


def evaluate(cfg: Config, state: TrainState, dataset, key=None,
             garment=None, frame_id: int = 0):
    """Render the held-out view and compute PSNR (eval cadence of §3.1).

    Conditioned/dynamic runs rebuild the cond vector from the garment stack
    and the given frame's latent (the held-out view has no latent of its
    own, so frame 0's code is the standard stand-in)."""
    cond = _eval_cond(cfg, state.params, garment, frame_id)
    render = _eval_render_fn(cfg, dataset.H, dataset.W,
                             float(dataset.focal), cond is not None)
    out = render(state.params, jnp.asarray(dataset.val_pose), cond)
    val_psnr = psnr_fn(out["rgb"], jnp.asarray(dataset.val_image))
    return out, float(val_psnr)


def resolve_garment(cfg: Config, dataset_dict: dict, H: int, W: int):
    """The garment conditioning stack for a run: the dataset's own, or —
    for a conditioned config on a garment-less dataset (e.g. the hermetic
    dynamic_tryon preset) — the procedural pair, so the encoder path stays
    live and param shapes match init. Used by train AND render/eval (they
    must agree or restored params won't match the field input width)."""
    if not cfg.model.conditioned:
        return None
    if "garment" in dataset_dict:
        return jnp.asarray(dataset_dict["garment"])
    from fashion_nerf.data.viton import synth_viton_pair
    from fashion_nerf.tryon.pipeline import build_conditioning
    pair = synth_viton_pair(H, W)
    return build_conditioning(pair, H, W, cfg=cfg)


def _eval_cond(cfg: Config, params, garment, frame_id: int = 0):
    """Per-scene cond VECTOR (Cc,) for whole-image rendering (the renderer
    broadcasts it per chunk)."""
    parts = []
    if cfg.model.conditioned and "encoder" in params and garment is not None:
        from fashion_nerf.models.conditioned import GarmentEncoder, \
            encode_garment
        enc = GarmentEncoder(out_dim=cfg.model.condition_dim)
        parts.append(encode_garment(params["encoder"],
                                    jnp.asarray(garment), enc))
    if cfg.model.n_latents > 0 and "latents" in params:
        from fashion_nerf.models.latents import LatentTable
        table = LatentTable(cfg.model.n_latents, cfg.model.latent_dim)
        parts.append(table.apply(
            params["latents"],
            jnp.asarray([frame_id], jnp.int32))[0])
    if not parts:
        return None
    return jnp.concatenate(parts, axis=-1)


def _eval_field(field):
    def bound(params, pts, viewdirs, cond):
        return field(params, pts, viewdirs, cond)
    return bound


def train(cfg: Config, dataset_dict: Optional[dict] = None,
          log_fn: Optional[Callable] = None, mesh=None,
          resume: bool = False, fault_at_step: Optional[int] = None):
    """Full training driver: data → state → jitted step → loop with
    log/eval/ckpt cadences. Returns (state, history).

    resume: restore the latest Orbax checkpoint and continue the identical
    trajectory (SURVEY.md §5.4). fault_at_step: test hook raising mid-run to
    exercise kill-and-resume recovery (SURVEY.md §5.3).
    """
    import os

    from fashion_nerf import ckpt as ckpt_lib
    from fashion_nerf.dist.mesh import init_distributed, shard_state
    from fashion_nerf.logging_ import MetricLogger
    from fashion_nerf.prng import KeyChain

    init_distributed(cfg.dist.multihost)
    if dataset_dict is None:
        dataset_dict = _load_dataset(cfg)
    dataset = RayDataset(dataset_dict["images"], dataset_dict["poses"],
                         dataset_dict["focal"], ndc=cfg.render.ndc,
                         precrop_frac=cfg.train.precrop_frac)
    dataset.val_image = dataset_dict["val_image"]
    dataset.val_pose = dataset_dict["val_pose"]

    # KeyChain (SURVEY.md §5.2): every host-side draw is a single-use split
    # of the run key — init and the per-step stream can never share a key
    # (the stream itself is threaded functionally through state.key)
    chain = KeyChain(jax.random.PRNGKey(cfg.train.seed))
    state = create_train_state(cfg, chain.once("init"))
    chain.freeze()   # everything after this point draws from state.key
    if mesh is not None:
        state = shard_state(mesh, state)
    garment = resolve_garment(cfg, dataset_dict, dataset.H, dataset.W)
    streamed = cfg.data.stream
    step_fn = make_train_step(cfg, dataset, mesh=mesh, garment=garment,
                              streamed=streamed)
    # occupancy-accelerated training (r3, VERDICT r2 #3)
    occ_train = cfg.train.occ_train
    step_fast = (make_train_step(cfg, dataset, mesh=mesh, garment=garment,
                                 streamed=streamed, occ_culled=True)
                 if occ_train else None)
    occ_state = None
    all_rays = dataset.batch_arrays()
    batch_iter = None
    if streamed:
        # datasets > HBM: host-side gather + double-buffered device_put
        # (SURVEY.md §2.2 prefetch fallback); device-resident gather
        # otherwise (the TPU-right default)
        from fashion_nerf.data.pipeline import host_batch_iter, \
            prefetch_to_device
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(mesh, P("dp"))
        batch_iter = prefetch_to_device(
            host_batch_iter(all_rays, cfg.train.batch_rays,
                            seed=cfg.train.seed), size=2, sharding=sharding)
    elif mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        all_rays = jax.device_put(all_rays, NamedSharding(mesh, P()))

    logger = log_fn or MetricLogger(
        cfg, log_dir=os.path.join(cfg.out_dir, cfg.name, "tb"))
    ckpt_dir = f"{cfg.out_dir}/{cfg.name}/ckpt"
    start = 0
    if resume and ckpt_lib.latest_step(ckpt_dir) is not None:
        state = ckpt_lib.restore(ckpt_dir, state)
        start = int(jax.device_get(state.step))
    history = []
    t0 = time.perf_counter()
    rays_done = 0
    last_val_psnr = None   # most recent eval, attached to ckpt saves for
                           # best-PSNR retention
    for i in range(start, int(cfg.train.iters)):
        if fault_at_step is not None and i == fault_at_step:
            raise RuntimeError(f"injected fault at step {i} "
                               "(SURVEY.md §5.3 test hook)")
        if occ_train and i >= cfg.train.occ_warmup and (
                occ_state is None or i % cfg.train.occ_refresh_every == 0):
            occ_state = refresh_occupancy(
                cfg, state.params,
                cond_vec=_eval_cond(cfg, state.params, garment))
        use_fast = (occ_state is not None
                    and (i + 1) % cfg.train.occ_dense_every != 0)
        batch = next(batch_iter) if streamed else all_rays
        if use_fast:
            state, metrics = step_fast(state, batch, occ_state)
        else:
            state, metrics = step_fn(state, batch)
        rays_done += cfg.train.batch_rays
        if (i + 1) % cfg.train.log_every == 0:
            # float() pulls to host and is the only reliable sync here —
            # block_until_ready is a silent no-op through the axon tunnel
            # (measured: it returned with 200 steps still in flight)
            entry = {k: float(v) for k, v in metrics.items()}
            now = time.perf_counter()   # AFTER the sync, or dt undercounts
            entry.update(step=i + 1, rays_per_sec=rays_done / (now - t0))
            t0, rays_done = now, 0
            history.append(entry)
            logger(entry)
        if (i + 1) % cfg.train.eval_every == 0:
            out, val_psnr = evaluate(cfg, state, dataset, garment=garment)
            if hasattr(logger, "image"):
                import numpy as _np
                logger.image("val/render",
                             _np.clip(_np.asarray(out["rgb"]), 0, 1), i + 1)
            logger({"step": i + 1, "val_psnr": val_psnr})
            history.append({"step": i + 1, "val_psnr": val_psnr})
            last_val_psnr = val_psnr
            t0 = time.perf_counter()  # keep eval out of the throughput window
        if (i + 1) % cfg.train.ckpt_every == 0:
            metrics = ({"val_psnr": last_val_psnr}
                       if last_val_psnr is not None else None)
            ckpt_lib.save(ckpt_dir, state, keep=cfg.train.ckpt_keep,
                          metrics=metrics)
            t0 = time.perf_counter()
    ckpt_lib.finalize()
    return state, history


def _load_dataset(cfg: Config) -> dict:
    if cfg.data.dataset == "tiny":
        from fashion_nerf.data.tiny import load_tiny
        return load_tiny(cfg.data.root)
    if cfg.data.dataset == "blender":
        if not cfg.data.root:
            # hermetic stand-in (no scene data in the harness): the
            # procedural sphere scene at the lego-extent framing the bench
            # checkpoint trains on (data/synthetic.py). Point data.root at
            # a NeRF-synthetic scene dir for real runs.
            from fashion_nerf.data.synthetic import make_synthetic_scene
            scene = make_synthetic_scene(n_views=16, H=160, W=160,
                                         scale=0.5, sharp=80.0, texture=0.6)
            scene.update(H=160, W=160, near=2.0, far=6.0)
            return scene
        from fashion_nerf.data.blender import load_blender
        return load_blender(cfg.data.root, half_res=cfg.data.half_res,
                            white_bkgd=cfg.render.white_bkgd)
    if cfg.data.dataset == "llff":
        if not cfg.data.root:
            # hermetic stand-in (same rationale as the blender fallback):
            # procedural forward-facing scene exercising the NDC path
            from fashion_nerf.data.synthetic import make_forward_scene
            return make_forward_scene(n_views=12, H=96, W=128)
        from fashion_nerf.data.llff import load_llff
        return load_llff(cfg.data.root, factor=cfg.data.llff_factor,
                         spherify=cfg.data.llff_spherify)
    if cfg.data.dataset == "viton":
        from fashion_nerf.data.viton import load_viton_scene
        return load_viton_scene(cfg.data.root, cfg=cfg)
    raise ValueError(f"unknown dataset {cfg.data.dataset!r}")
