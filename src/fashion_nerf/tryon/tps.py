"""Thin-plate-spline cloth warp — BASELINE.json:5,10 [EXT: CP-VTON GMM].

fit_tps solves the TPS linear system (radial basis U(r) = r² log r² plus an
affine part) for fixed K control points (static shape — SURVEY.md §7 hard
part 4: control-point count is config-fixed so the solve jits); tps_grid
evaluates the warp on a dense pixel grid; grid_sample is the XLA bilinear
equivalent of torch.nn.functional.grid_sample.
"""

from __future__ import annotations

import jax.numpy as jnp


def _u(r2):
    """TPS radial basis U(r) = r² log r², safe at r=0."""
    return jnp.where(r2 == 0.0, 0.0, r2 * jnp.log(jnp.maximum(r2, 1e-12)))


def fit_tps(src_pts, dst_pts, reg: float = 1e-6):
    """Fit TPS mapping src → dst.

    Args:
      src_pts: (K, 2) control points in the SOURCE (warped-to) frame,
               normalized [-1, 1] coords.
      dst_pts: (K, 2) corresponding points in the TARGET frame.
      reg: Tikhonov regularizer on the bending term.

    Returns params dict {w (K,2), a (3,2), src (K,2)} for tps_apply.
    """
    K = src_pts.shape[0]
    d2 = jnp.sum((src_pts[:, None, :] - src_pts[None, :, :]) ** 2, -1)
    Phi = _u(d2) + reg * jnp.eye(K)                      # (K, K)
    P = jnp.concatenate([jnp.ones((K, 1)), src_pts], axis=1)   # (K, 3)
    top = jnp.concatenate([Phi, P], axis=1)              # (K, K+3)
    bot = jnp.concatenate([P.T, jnp.zeros((3, 3))], axis=1)    # (3, K+3)
    A = jnp.concatenate([top, bot], axis=0)              # (K+3, K+3)
    b = jnp.concatenate([dst_pts, jnp.zeros((3, 2))], axis=0)  # (K+3, 2)
    sol = jnp.linalg.solve(A, b)                         # (K+3, 2)
    return {"w": sol[:K], "a": sol[K:], "src": src_pts}


def tps_apply(params, pts):
    """Evaluate the fitted TPS at pts (..., 2) → (..., 2)."""
    w, a, src = params["w"], params["a"], params["src"]
    d2 = jnp.sum((pts[..., None, :] - src) ** 2, -1)     # (..., K)
    rbf = _u(d2) @ w                                     # (..., 2)
    affine = a[0] + pts @ a[1:]                          # (..., 2)
    return rbf + affine


def tps_grid(params, H: int, W: int):
    """Dense sampling grid (H, W, 2) in [-1,1] coords: where each OUTPUT
    pixel reads from in the source image (backward warp)."""
    ys = jnp.linspace(-1.0, 1.0, H)
    xs = jnp.linspace(-1.0, 1.0, W)
    gx, gy = jnp.meshgrid(xs, ys)                        # (H, W)
    pts = jnp.stack([gx, gy], axis=-1)                   # (H, W, 2) (x, y)
    return tps_apply(params, pts)


def grid_sample(img, grid, padding_value: float = 0.0):
    """Bilinear sample img (H, W, C) at grid (Ho, Wo, 2) of (x, y) in [-1,1].

    XLA twin of torch grid_sample(align_corners=True); out-of-bounds reads
    return padding_value.
    """
    H, W = img.shape[:2]
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x); y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = x - x0; wx0 = 1.0 - wx1
    wy1 = y - y0; wy0 = 1.0 - wy1

    def gather(yy, xx):
        inside = ((xx >= 0) & (xx <= W - 1) & (yy >= 0)
                  & (yy <= H - 1))
        xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        vals = img[yi, xi]                               # (..., C)
        return jnp.where(inside[..., None], vals, padding_value)

    out = (gather(y0, x0) * (wy0 * wx0)[..., None]
           + gather(y0, x1) * (wy0 * wx1)[..., None]
           + gather(y1, x0) * (wy1 * wx0)[..., None]
           + gather(y1, x1) * (wy1 * wx1)[..., None])
    return out


def tps_warp(img, src_pts, dst_pts, out_hw=None, reg: float = 1e-6,
             padding_value: float = 0.0):
    """Warp img so that dst_pts land on src_pts (backward-mapping TPS):
    fit TPS mapping OUTPUT coords → SOURCE coords, then bilinear-sample."""
    H, W = out_hw or img.shape[:2]
    params = fit_tps(dst_pts, src_pts, reg)   # output-frame → source-frame
    grid = tps_grid(params, H, W)
    return grid_sample(img, grid, padding_value)
