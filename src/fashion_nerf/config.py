"""Typed, frozen configuration tree + the five acceptance presets.

Reference@v1 has no config system (/root/reference/README.md:1-2 is the whole
repo); the canonical nerf-pytorch equivalent is configargparse .txt files.
Here: frozen dataclasses (hashable → usable as jit static args), named presets
mirroring BASELINE.json:7-11, and dotted `--set a.b=c` overrides.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, replace
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    net_depth: int = 8            # trunk layers
    net_width: int = 256          # trunk width
    skips: Tuple[int, ...] = (4,)  # concat γ(x) after trunk layer i (input to i+1)
    posenc_xyz: int = 10          # L for positions → 3+3*2*10 = 63 dims
    posenc_dir: int = 4           # L for view dirs → 3+3*2*4 = 27 dims
    use_viewdirs: bool = True
    sigma_activation: str = "relu"   # relu | softplus
    compute_dtype: str = "float32"   # activation/matmul dtype (params stay f32)
    # garment conditioning (BASELINE.json:10)
    conditioned: bool = False
    condition_dim: int = 64       # garment feature dim injected into the trunk
    # per-frame latent codes (BASELINE.json:11)
    n_latents: int = 0            # 0 = no latent table
    latent_dim: int = 32


@dataclass(frozen=True)
class SamplingConfig:
    n_coarse: int = 64
    n_fine: int = 0               # 0 = coarse-only
    perturb: bool = True          # stratified jitter during training
    lindisp: bool = False         # sample linearly in inverse depth
    raw_noise_std: float = 0.0    # σ-pre-activation noise during training


@dataclass(frozen=True)
class RenderConfig:
    near: float = 2.0
    far: float = 6.0
    ndc: bool = False             # LLFF forward-facing reparameterization
    white_bkgd: bool = False
    chunk: int = 16384            # rays per device dispatch when rendering images
    # render/eval-time sample budget for the blockwise production path
    # (0 = use sampling.*). With occupancy culling the budget concentrates
    # inside each ray's occupied interval, so a reduced budget reproduces
    # the dense 64+128 render (r3 measured: 32+64 culled is within 0.09 dB
    # of dense vs GT — scripts/quality_check.py); training keeps the full
    # sampling.* budget. The XLA reference renderer ignores these.
    eval_n_coarse: int = 0
    eval_n_fine: int = 0


@dataclass(frozen=True)
class OccupancyConfig:
    """Empty-space culling from a trained field (core/occupancy.py). Built
    once at render/eval/bench setup; training is unaffected. The sample-work
    reduction it buys is the only road to the 10M rays/s north star
    (BASELINE.json:5 — dense 256-eval rendering caps at ~650k rays/s on v5e).

    Caveat for pre-existing checkpoints (ADVICE r2): culling assumes the
    field was trained with the sparsity prior (train.sparsity_weight > 0) so
    out-of-box density is genuinely junk. Checkpoints trained WITHOUT it can
    carry real low-σ fog outside the box (~0.6 dB measured) — score those
    with `--set occupancy.enabled=false`."""
    enabled: bool = False
    resolution: int = 64          # lattice cells per axis (one-time G³ σ sweep)
    sigma_threshold: float = 1e-2  # post-activation density for "occupied"
    margin_cells: int = 1         # conservative AABB dilation (cells)
    # conservative dilation in WORLD units (VERDICT r3 weak #3): the
    # effective margin is max(margin_cells, ceil(margin_world/cell)) cells,
    # so raising `resolution` cannot silently shrink the physical halo
    # around occupied cells (the r3 macro=16/res=128 gate failure was the
    # 1-cell margin halving in world units, not the finer grid). Default =
    # one res-64 cell of the standard [-2, 2] scan box.
    margin_world: float = 0.0625
    # macro³ sub-AABBs of the grid for per-(ray, block) culling in the
    # blockwise march (r3, VERDICT r2 #2): interior empty blocks between
    # objects die, not just pre/post-box ones. 1 = global box only.
    macro: int = 4
    # scan box (world units; NDC configs should use ±1). The culling AABB
    # tightens to occupied cells inside it, so loose bounds are safe.
    world_min: float = -2.0
    world_max: float = 2.0
    # occupancy-warped sampling (r4): place the stratified budget only in
    # bins of the union interval that overlap an occupied macro box, with
    # per-sample integration widths capped at occupied-run ends
    # (core/sampling.occupancy_bins/warp_stratified/delta_caps). Kills the
    # budget-dilution tax of conservative margins (the 5-pose gate showed
    # gap samples are pure loss: blocks over gaps are culled anyway).
    # Requires macro > 1; no-op without seg intervals.
    # ACTIVATION TRIGGER (VERDICT r4 weak #4): turn on when per-ray occupied
    # runs fragment — mean occupied-run count ≥ 2 over the frame's hit rays
    # (multi-object / room-scale scenes with real gaps BETWEEN occupied
    # segments). On single-blob scenes like the flagship lego (one
    # contiguous halo run per ray) it is measured quality-neutral and
    # 13–16% SLOWER (BASELINE.md r4): inside one run the warp reduces to
    # midpoint strata over the same interval, while making every block
    # genuinely occupied — per-block culling stops paying. The fragmented
    # case where the budget win exists is pinned by
    # tests/unit/test_sampling.py::test_warp_budget_win_on_fragmented_scene.
    sample_warp: bool = False
    warp_bins: int = 64           # indicator bins over the union interval


@dataclass(frozen=True)
class ProposalConfig:
    """σ-only proposal field for the render-time coarse pass (VERDICT r3 #1,
    mip-NeRF-360 pattern re-thought for the blockwise march).

    The hierarchical renderer's coarse pass exists at eval time ONLY to shape
    the fine PDF — its rgb is never composited into the output — yet it pays
    the full 8×256 MLP price (measured r3: 5.1 of every 14.4 ms live chunk).
    A tiny σ-only MLP (default 2×128, posenc L=6 — ~7% of the FLOPs) does
    that job: it is DISTILLED from the trained fine field at render setup
    (models/proposal.py) and marched through the identical blockwise
    machinery (same plan/kernel code path, smaller weights). Training is
    untouched; the proposal is attached to the render-time params dict
    (key "proposal") by bench/CLI setup — absent the key, the full coarse
    pass runs as before.
    """
    enabled: bool = False
    net_depth: int = 2            # proposal trunk layers
    net_width: int = 128          # proposal trunk width (lane-friendly)
    posenc_xyz: int = 6           # proposal position encoding L
    # render-time proposal sample budget (the PDF's bin count). More bins =
    # better fine placement at ~7% FLOPs each; 0 = the coarse eval budget.
    # (p32 measured −0.2 dB vs p64's −0.084 — the bin count matters.)
    eval_n: int = 64
    # union=True: fine pass integrates sort(t_prop ∪ t_fine) (canonical-NeRF
    # style — every proposal sample ALSO costs a full-MLP fine eval).
    # union=False (mip-NeRF-360 style, default): the fine pass integrates
    # only its own budget — coverage comes from uniform_mix/cov_n below.
    union: bool = False
    # stratified coverage samples unioned with the PDF samples when
    # union=False. Raw PDF-only integration measured −2.9 dB (low-σ tails
    # between surfaces never sampled — the classic importance-sampling
    # coverage failure). Default 0: uniform_mix supplies coverage INSIDE
    # the fine budget — every +SB of extra budget costs a whole extra
    # block-program per tile (the measured r4 throughput cliff:
    # 80-sample budget pads to 96 and runs 1.25M vs 64-budget's 1.59M).
    cov_n: int = 0
    # conservative PDF: max-pool the proposal weights over ±dilate neighbor
    # bins before inverse-CDF sampling (mip-NeRF-360's proposal dilation) —
    # compensates the tiny net's σ blur so thin structures keep their mass
    # (dil0 −0.156 → dil2 −0.084 at the shipping config)
    dilate: int = 2
    # defensive importance sampling: blend this fraction of each ray's PDF
    # mass uniformly over its bins — coverage without budget (see cov_n)
    uniform_mix: float = 0.2
    # full-range PDF bins (r5): span [t_c[0], t_c[-1]] with ALL S proposal
    # weights instead of the canonical mid-bin form (midpoint edges,
    # weights[1:-1]) that confines fine samples to [mid_0, mid_{-1}] and
    # drops the boundary bins' mass. The union=False proposal path has no
    # other coverage there; the 7-pose gate's close pose (near plane
    # clipping into real density) lost −0.328 dB through exactly that
    # (render/blockwise.py rationale). Off reproduces the r4 behavior.
    edge_bins: bool = True
    # proposal-acc ray culling (r4): rays whose proposal march accumulates
    # less than this opacity along their whole culled range skip the
    # full-MLP fine march (composited straight to background, exactly what
    # a ~zero-acc ray converges to). The expensive rays in a frame are NOT
    # the surface hits — they terminate early — but silhouette-grazing
    # rays that clip the occupancy halo, never saturate, and march their
    # entire (long, tangent-chord) range for ~zero contribution: measured
    # r4, silhouette chunks cost ~13 ms vs the object-interior chunk's
    # 4 ms. The proposal pass already paid to discover chord emptiness;
    # this reuses it. 0 disables. Quality-gated like every cull
    # (quality_check --gate; error per ray is bounded by the threshold).
    cull_acc: float = 0.0
    # per-march sample-block size for the proposal march (0 = follow
    # kernels.block_samples). The r4 frame profile showed the 2×128 prop
    # march costing the SAME as the 8×256 fine march (177 vs 180 ms/frame)
    # — per-block fixed work (HIGHEST-precision selector gathers, row
    # relayout, scan matmul) dominates a small net, so marching the 64-eval
    # budget as ONE 64-lane block instead of two 32-lane blocks halves it.
    block_samples: int = 0
    # slim σ-only march kernel for the proposal pass
    # (kernels/sigmamarch_pallas.py, r4): drops every per-row cost a
    # PDF-shaping pass does not need (dirpart expand, rgb/depth
    # compositing, selector matmuls, matrix→rows t relayout, (rows,3) pts
    # math — the measured ~90%-VPU prop-march body). Activates only when
    # the shape allows (eval_n ≤ the march block ⇒ single-block march) and
    # the carry march is on; otherwise the generic kernel runs as before.
    sigma_march: bool = True
    # distillation budget (one-time, render setup — seconds on-chip;
    # 600→2000 steps measured −0.097 → −0.084 dB vs dense)
    distill_steps: int = 2000
    distill_batch: int = 8192
    distill_lr: float = 2e-3


@dataclass(frozen=True)
class KernelConfig:
    """Pallas kernel selection. Every kernel has an XLA-composed fallback
    (SURVEY.md §2.5); flags flip the hot paths to the Pallas twins."""
    use_pallas: bool = False
    fused_mlp: bool = True        # kernels/posenc_mlp_pallas
    fused_render: bool = True     # kernels/render_pallas
    mlp_dtype: str = "bfloat16"   # matmul input dtype inside fused MLP (accum f32)
    # fused Pallas VJP: in-kernel forward recompute + dgrad/wgrad in VMEM
    # (without it the custom VJP recomputes through XLA, ~30% inside grad)
    fused_backward: bool = True
    interpret: bool = False       # run Pallas in interpreter mode (CPU debugging)
    # blockwise early-terminated render pipeline (render/blockwise.py):
    # sample-blocks of the fused field with per-tile transmittance skipping
    blockwise: bool = True        # use it for whole-image renders when use_pallas
    block_samples: int = 32       # samples per block (tile = 2048/SB rays)
    early_term_eps: float = 1e-4  # stop marching when transmittance < ε (0 = off)
    # carry-in-VMEM block march (kernels/blockmarch_pallas.py, r3): one
    # program per (ray tile, sample block), transmittance carry + composited
    # accumulators persisted in VMEM output windows — the per-block XLA
    # glue (carry update, pts build, rgb/σ HBM round-trips) moves in-kernel.
    # The middle point between the two-stage pipeline and the rejected
    # megakernel (VERDICT r2 next #1b).
    fused_carry: bool = False
    # slim carry march (kernels/slimmarch_pallas.py, r5): the carry body
    # with per-row linear-in-t work hoisted per ray to XLA (the sigmamarch
    # decomposition generalized to rgb-compositing multi-block marches) and
    # block-major t/dists/weights layouts replacing the three
    # HIGHEST-precision selector matmuls per (tile, block). Motivated by the
    # r4 anatomy: the fine carry program measured 42.5 µs alive vs the
    # ~27-29 µs MXU floor — ~30% per-row VPU/selector/relayout overhead.
    # Applies to every _marched_pass_carry user (fine march, non-proposal
    # coarse march); the σ-only proposal keeps its own slimmer kernel.
    # Default ON since r5: bench-pose A/B 1.839M → 1.923M rays/s and the
    # full 7-pose gate passes with it (worst −0.098, identical to the
    # generic kernel's −0.096/−0.097 across runs — run-to-run ±0.002);
    # only consulted when fused_carry is on.
    carry_hoist: bool = True
    # RETIRED (r4): a third march variant — the megakernel (whole block
    # march NB-unrolled in ONE program per ray tile) — was built in r2,
    # measured slower (live chunk 142 ms vs the two-stage pipeline's 113;
    # per-program sequencing cost grows with the unrolled body and eats the
    # launch-overhead savings it targeted), kept one round behind a flag,
    # and deleted in r4 when the carry march (its successor design: same
    # in-VMEM carry, one-block programs) became the default. Full numbers:
    # BASELINE.md r2/r3 measured tables; history: git log --
    # src/fashion_nerf/kernels/megakernel_pallas.py. Re-evaluation trigger: a Mosaic
    # toolchain where predicated-region sequencing cost stops scaling with
    # unrolled body size.


@dataclass(frozen=True)
class TrainConfig:
    iters: int = 200_000
    batch_rays: int = 4096        # rays per step (global, sharded over dp axis)
    lr_init: float = 5e-4
    lr_final: float = 5e-5
    lr_decay_steps: int = 250_000
    seed: int = 0
    log_every: int = 100
    eval_every: int = 5000
    ckpt_every: int = 10000
    ckpt_keep: int = 3
    precrop_iters: int = 0        # train on center crop for first N iters
    precrop_frac: float = 0.5
    # density sparsity prior: Cauchy penalty log(1+σ²/2) on density at random
    # points in the occupancy world box. Unobserved space gets no
    # reconstruction gradient, so without this the field grows junk density
    # there ("floaters") that inflates the occupancy grid and defeats
    # culling/early termination (measured: box → whole world at r2 bring-up).
    sparsity_weight: float = 0.0
    sparsity_points: int = 1024   # random world points per step
    # occupancy-accelerated training (r3, NerfAcc's headline pattern —
    # VERDICT r2 #3): after occ_warmup steps, refresh a culling grid from
    # the live fields every occ_refresh_every steps and train most steps
    # with a REDUCED budget (occ_coarse+occ_fine) concentrated inside
    # per-ray occupied ranges; every occ_dense_every-th step runs the full
    # dense budget over [near, far] so unmodeled content keeps a gradient
    # path. Requires sparsity_weight > 0 (junk-free grids).
    occ_train: bool = False
    occ_refresh_every: int = 500
    occ_warmup: int = 1000
    occ_dense_every: int = 8
    occ_coarse: int = 32          # reduced budget inside tight ranges
    occ_fine: int = 64


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "tiny"         # tiny | blender | llff | viton
    root: str = ""
    # streaming path for ray sets that exceed HBM: host-side batch gather +
    # double-buffered prefetch_to_device instead of device-resident rays
    stream: bool = False
    half_res: bool = False
    llff_factor: int = 8
    llff_spherify: bool = False
    frame_ids: Tuple[int, ...] = ()   # dynamic try-on: which frames carry latents


@dataclass(frozen=True)
class TryonConfig:
    # learned garment-correspondence matcher (tryon/matcher.py, VERDICT r3
    # #5): when true AND the committed weights asset exists, preprocessing
    # warps the cloth with the matcher's residual correspondences (held-out
    # warped-mask IoU 0.93 vs 0.65 keypoint-grid baseline); otherwise the
    # procedural keypoint-grid TPS is used — the exact zero-residual limit
    # of the matcher, so the fallback is graceful by construction
    use_matcher: bool = True
    # override path for the matcher weights ("" = assets/matcher_synthetic.npz)
    matcher_asset: str = ""


@dataclass(frozen=True)
class DistConfig:
    dp: int = -1                  # data-parallel axis size; -1 = all devices
    tp: int = 1                   # optional tensor parallel over MLP hidden dim
    multihost: bool = False       # jax.distributed.initialize on entry


@dataclass(frozen=True)
class Config:
    name: str = "tiny_lego"
    model: ModelConfig = field(default_factory=ModelConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    occupancy: OccupancyConfig = field(default_factory=OccupancyConfig)
    proposal: ProposalConfig = field(default_factory=ProposalConfig)
    kernels: KernelConfig = field(default_factory=KernelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    tryon: TryonConfig = field(default_factory=TryonConfig)
    dist: DistConfig = field(default_factory=DistConfig)
    out_dir: str = "runs"


# --- The five acceptance presets (BASELINE.json:7-11) -----------------------

PRESETS: dict = {}


def _register(cfg: Config) -> Config:
    PRESETS[cfg.name] = cfg
    return cfg


# [B]:7 Tiny-NeRF lego 64×64, coarse-only 8-layer MLP, 64 samples/ray (CPU-runnable)
_register(Config(
    name="tiny_lego",
    model=ModelConfig(posenc_xyz=6, posenc_dir=4, use_viewdirs=False),
    sampling=SamplingConfig(n_coarse=64, n_fine=0),
    # white_bkgd=True: the data is alpha-composited on white; rendering
    # without background compositing admits a uniform-white-fog collapse
    render=RenderConfig(near=2.0, far=6.0, white_bkgd=True, chunk=4096),
    train=TrainConfig(iters=1000, batch_rays=1024, lr_init=5e-4, lr_final=5e-5,
                      lr_decay_steps=1000, eval_every=250, ckpt_every=500),
    data=DataConfig(dataset="tiny"),
))

# [B]:8 NeRF-synthetic Blender 800×800, coarse+fine hierarchical (64+128 = 192 samples/ray)
_register(Config(
    name="blender_lego",
    model=ModelConfig(compute_dtype="bfloat16"),
    sampling=SamplingConfig(n_coarse=64, n_fine=128, raw_noise_std=0.0),
    # eval budget p64+f96 (r4): the 5-pose gate (quality_check --gate)
    # showed the r3 32+64 budget was bench-pose-overfit — the near pose
    # lost 0.178 dB (box clipping) and margin fixes dilute a 64-sample
    # fine budget below the gate (mw.25+f64: pose1 −0.137). f96 restores
    # worst-pose −0.050 at margin_world=0.125. Training keeps the full
    # 64+128; eval_n_coarse feeds the non-proposal fallback path only.
    # chunk 8192 (r3 sweep: 1.36M vs 1.32M at 32768): finer whole-chunk
    # lax.cond skip granularity beats the extra dispatches
    render=RenderConfig(near=2.0, far=6.0, white_bkgd=True, chunk=8192,
                        eval_n_coarse=32, eval_n_fine=96),
    # culling threshold 0.1: tightest box that still contains everything the
    # dense path integrates (sweep on the sparsity-3e-4 ckpt: thr 0.1 box =
    # thr 0.5 box + the real density tail, 60.7 dB vs dense and the fastest
    # live chunk; thr 0.02 picks up junk floaters and the box hits the world
    # edge). Validated by scripts/quality_check.py + test_blockwise gates.
    # macro=8 (r3): 512 sub-AABBs — tighter per-ray intervals AND better
    # quality than macro=4 (−0.076 vs −0.088 dB vs GT) at ~1.12× throughput.
    # margin_world=0.125 (r4): the 5-pose gate's near pose needs a fatter
    # physical halo than the old 1-cell margin (σ=0.1 clips a real density
    # tail: −0.168 dB there even at FULL budget); 0.25 over-dilutes the
    # budget instead (pose1 −0.137). res=128/macro=16 passes the gate with
    # the best quality (worst −0.058) but costs 17% throughput in (R, 4096)
    # multi-AABB glue — stays a documented option, not the default.
    occupancy=OccupancyConfig(enabled=True, sigma_threshold=0.1, macro=8,
                              margin_world=0.125),
    # r4 (VERDICT r3 #1): σ-only proposal field replaces the full-MLP coarse
    # pass at render time — distilled at render setup, marched through the
    # same blockwise machinery (see ProposalConfig)
    # cull_acc=5e-4 (r4): rays whose proposal chord-opacity is ~zero skip
    # the fine march — 999k → 1.50M rays/s at worst-pose −0.093 (PASS);
    # 1e-2 fails the near pose at −0.104 and buys nothing (culling
    # saturates by 5e-4). macro=4/2 retested WITH culling: slower AND
    # macro=4 fails the gate — K=512's tighter unions pay for their glue.
    proposal=ProposalConfig(enabled=True, cull_acc=5e-4, block_samples=64),
    # Pallas is the default path (r2): blockwise early-terminated render
    # beats the dense XLA path ~2× on the trained ckpt; training uses the
    # fused backward (within 4% of XLA at batch 4k, and the ONLY path at
    # batch 16k — XLA's stored activations exceed HBM there). r3: the
    # carry-in-VMEM march is default (1.19M vs 1.13M rays/s two-stage at
    # the eval budget, equal quality after the precision fix). BASELINE.md.
    # ε=1e-3: same measured quality as 1e-4 (−0.076 dB vs GT) at +2.3%
    # throughput on the trained ckpt
    kernels=KernelConfig(use_pallas=True, fused_carry=True,
                         early_term_eps=1e-3),
    train=TrainConfig(iters=200_000, batch_rays=4096, precrop_iters=500,
                      # keeps unobserved space empty → tight occupancy box
                      sparsity_weight=1e-4,
                      # r3 (VERDICT r2 #3): occupancy-accelerated training —
                      # measured 1.61× wall / 97.5k steady rays/s at equal
                      # val PSNR @3k (−0.01 dB) on the textured scene
                      occ_train=True),
    data=DataConfig(dataset="blender"),
))

# [B]:9 LLFF forward-facing, NDC rays, per-scene appearance fitting
_register(Config(
    name="llff_fern",
    model=ModelConfig(),
    sampling=SamplingConfig(n_coarse=64, n_fine=128, raw_noise_std=1.0,
                            lindisp=False),
    render=RenderConfig(near=0.0, far=1.0, ndc=True, white_bkgd=False,
                        chunk=32768),
    # NDC space is the ±1 cube: scan that, not the blender world box, if
    # culling is switched on (occupancy stays off by default here — LLFF
    # forward-facing frusta rarely have cullable background)
    occupancy=OccupancyConfig(enabled=False, world_min=-1.0, world_max=1.0),
    # r3: Pallas substrate by default on every acceptance preset
    # (VERDICT r2 #4); early termination still pays on forward-facing
    # scenes once transmittance saturates
    kernels=KernelConfig(use_pallas=True),
    train=TrainConfig(iters=200_000, batch_rays=4096),
    data=DataConfig(dataset="llff", llff_factor=8),
))

# [B]:10 Garment-conditioned try-on NeRF (VITON-HD TPS warp + seg masks)
_register(Config(
    name="viton_tryon",
    model=ModelConfig(conditioned=True, condition_dim=64),
    sampling=SamplingConfig(n_coarse=64, n_fine=128),
    render=RenderConfig(near=2.0, far=6.0, white_bkgd=True, chunk=16384,
                        eval_n_coarse=32, eval_n_fine=96),
    # r5 (VERDICT r4 missing #3): the try-on presets run the full flagship
    # perf stack — cond-aware occupancy (occupancy.build_jit takes the scene
    # cond) + conditioned-teacher σ-proposal + proposal-acc culling.
    # Measured on a 600-step conditioned ckpt (scripts/r5_tryon_stack):
    # dense 0.222 → occ-only 0.414 → full stack 1.075 Mrays/s (4.83×) at
    # 40.98 dB blockwise-vs-dense agreement.
    occupancy=OccupancyConfig(enabled=True),
    proposal=ProposalConfig(enabled=True, cull_acc=5e-4, block_samples=64),
    # r3: conditioning is fused into the Pallas field (the cond rows of
    # trunk_0/skip are hoisted per ray like the view branch), so the try-on
    # half of the mission runs the TPU-native substrate (VERDICT r2 #4).
    # r5: carry march + ε=1e-3 follow the flagship defaults.
    kernels=KernelConfig(use_pallas=True, fused_carry=True,
                         early_term_eps=1e-3),
    # sparsity prior: occupancy culling is only sound when out-of-box
    # density trains toward zero (OccupancyConfig docstring)
    train=TrainConfig(iters=100_000, batch_rays=2048, sparsity_weight=1e-4),
    data=DataConfig(dataset="viton"),
))

# [B]:11 Multi-view dynamic try-on: per-frame latent codes, rotating-subject video
_register(Config(
    name="dynamic_tryon",
    model=ModelConfig(conditioned=True, condition_dim=64,
                      n_latents=64, latent_dim=32),
    sampling=SamplingConfig(n_coarse=64, n_fine=128),
    render=RenderConfig(near=2.0, far=6.0, white_bkgd=True, chunk=16384,
                        eval_n_coarse=32, eval_n_fine=96),
    # r5: full perf stack with ONE latent-0 proposal + latent-0 occupancy
    # shared across frames — measured uniform across latents 0..3 (40.3 to
    # 41.1 dB vs dense, 1.09 Mrays/s = 4.17× dense; scripts/r5_tryon_stack),
    # which retires the r4 "latent-specific teacher" rationale for skipping
    # the proposal on video renders (VERDICT r4 weak #5)
    occupancy=OccupancyConfig(enabled=True),
    proposal=ProposalConfig(enabled=True, cull_acc=5e-4, block_samples=64),
    # r3: fused cond path (garment code ⊕ per-frame latent) — see viton_tryon
    kernels=KernelConfig(use_pallas=True, fused_carry=True,
                         early_term_eps=1e-3),
    train=TrainConfig(iters=100_000, batch_rays=2048, sparsity_weight=1e-4),
    # hermetic default (procedural multi-view scene with per-frame latents);
    # point data.root at a real capture for production runs
    data=DataConfig(dataset="tiny", frame_ids=tuple(range(64))),
))


# --- dotted overrides --------------------------------------------------------

def _set_dotted(cfg: Any, dotted: str, raw: str) -> Any:
    """Return a copy of `cfg` with dotted path (e.g. 'train.iters') set.

    Values are parsed with the target field's existing type.
    """
    head, _, rest = dotted.partition(".")
    names = {f.name: f for f in fields(cfg)}
    if head not in names:
        raise KeyError(f"unknown config field {head!r} on {type(cfg).__name__}")
    cur = getattr(cfg, head)
    if rest:
        return replace(cfg, **{head: _set_dotted(cur, rest, raw)})
    new_val = _parse_like(cur, raw)
    return replace(cfg, **{head: new_val})


def _parse_like(template: Any, raw: str) -> Any:
    if isinstance(template, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(template, int):
        return int(raw)
    if isinstance(template, float):
        return float(raw)
    if isinstance(template, tuple):
        if raw.strip() == "":
            return ()
        items = [s.strip() for s in raw.split(",")]
        inner = template[0] if template else int
        return tuple(type(inner)(s) if template else int(s) for s in items)
    return raw


def load_config(name: str, overrides: Optional[list] = None) -> Config:
    """Look up a preset and apply `k=v` dotted overrides."""
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    cfg = PRESETS[name]
    for item in overrides or []:
        key, _, val = item.partition("=")
        cfg = _set_dotted(cfg, key.strip(), val.strip())
    return cfg


def config_to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: config_to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, tuple):
        return list(cfg)
    return cfg
