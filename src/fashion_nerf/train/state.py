"""TrainState: the one functional state pytree threaded through training
(SURVEY.md §2.2). Holds coarse/fine field params (+ conditioner/latents when
configured), Adam state, step counter, and the PRNG key — everything Orbax
checkpoints (SURVEY.md §5.4)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from fashion_nerf.config import Config
from fashion_nerf.models.nerf_mlp import init_field
from fashion_nerf.models.latents import LatentTable


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any          # {"coarse": ..., "fine": ...?, "latents": ...?, "encoder": ...?}
    opt_state: Any
    key: jax.Array       # PRNG key threaded across steps


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.train.lr_init,
        transition_steps=cfg.train.lr_decay_steps,
        decay_rate=cfg.train.lr_final / cfg.train.lr_init,
    )
    return optax.adam(learning_rate=schedule)


def _init_all(cfg: Config, key):
    k_coarse, k_fine, k_lat, k_enc, k_run = jax.random.split(key, 5)
    cond_dim = 0
    if cfg.model.conditioned:
        cond_dim += cfg.model.condition_dim
    if cfg.model.n_latents > 0:
        cond_dim += cfg.model.latent_dim

    params = {"coarse": init_field(k_coarse, cfg.model, cond_dim)}
    if cfg.sampling.n_fine > 0:
        params["fine"] = init_field(k_fine, cfg.model, cond_dim)
    if cfg.model.n_latents > 0:
        table = LatentTable(cfg.model.n_latents, cfg.model.latent_dim)
        params["latents"] = table.init(
            k_lat, jax.numpy.zeros((1,), jax.numpy.int32))
    if cfg.model.conditioned:
        from fashion_nerf.models.conditioned import GarmentEncoder
        enc = GarmentEncoder(out_dim=cfg.model.condition_dim)
        params["encoder"] = enc.init(
            k_enc, jax.numpy.zeros((1, 64, 64, 7)))

    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return TrainState(step=jax.numpy.zeros((), jax.numpy.int32),
                      params=params, opt_state=opt_state, key=k_run)


def create_train_state(cfg: Config, key) -> TrainState:
    # one jit around the full init: eager flax init costs ~16 s of per-op
    # dispatches through the TPU tunnel (cfg is static — hashable frozen dc)
    return jax.jit(_init_all, static_argnums=0)(cfg, key)
