"""Pure-NumPy reference renderer — the golden oracle (SURVEY.md §4.2).

Written fresh from the volume-rendering equations; deliberately naive and
loop-free of any JAX so it is an independent check on the XLA/Pallas paths.
The reference repo has no code to diff against (/root/reference/README.md:1-2),
so this oracle is the parity authority for golden tests.
"""

import numpy as np


def oracle_posenc(x, num_freqs, include_input=True):
    if num_freqs == 0:
        return x if include_input else x[..., :0]
    out = [x] if include_input else []
    for k in range(num_freqs):
        out.append(np.sin(x * (2.0 ** k)))
        out.append(np.cos(x * (2.0 ** k)))
    # interleave per-frequency to match core.posenc layout:
    # [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]
    return np.concatenate(out, axis=-1)


def oracle_generate_rays(H, W, focal, c2w):
    c2w = np.asarray(c2w)
    rays_o = np.zeros((H, W, 3), np.float64)
    rays_d = np.zeros((H, W, 3), np.float64)
    for j in range(H):
        for i in range(W):
            d_cam = np.array([(i - W * 0.5) / focal,
                              -(j - H * 0.5) / focal,
                              -1.0])
            rays_d[j, i] = c2w[:3, :3] @ d_cam
            rays_o[j, i] = c2w[:3, -1]
    return rays_o, rays_d


def oracle_volume_render(rgb, sigma, t_vals, rays_d, white_bkgd=False):
    """Per-ray Python loop implementing the quadrature equations directly."""
    R, S, _ = rgb.shape
    out_rgb = np.zeros((R, 3), np.float64)
    out_depth = np.zeros(R, np.float64)
    out_acc = np.zeros(R, np.float64)
    out_w = np.zeros((R, S), np.float64)
    for r in range(R):
        norm = np.linalg.norm(rays_d[r])
        T = 1.0
        for s in range(S):
            if s + 1 < S:
                delta = (t_vals[r, s + 1] - t_vals[r, s]) * norm
            else:
                delta = 1e10 * norm
            dens = max(sigma[r, s], 0.0)  # relu
            alpha = 1.0 - np.exp(-dens * delta)
            w = T * alpha
            out_w[r, s] = w
            out_rgb[r] += w * rgb[r, s]
            out_depth[r] += w * t_vals[r, s]
            out_acc[r] += w
            T *= (1.0 - alpha + 1e-10)
        if white_bkgd:
            out_rgb[r] += 1.0 - out_acc[r]
    return out_rgb, out_depth, out_acc, out_w


def oracle_sample_pdf(bins, weights, u, eps=1e-5):
    """Inverse-CDF sampling given explicit quantiles u (R, N)."""
    R, B = weights.shape
    out = np.zeros_like(u)
    w = weights + eps
    for r in range(R):
        pdf = w[r] / w[r].sum()
        cdf = np.concatenate([[0.0], np.cumsum(pdf)])
        for n in range(u.shape[1]):
            idx = np.searchsorted(cdf, u[r, n], side="right")
            below = min(max(idx - 1, 0), B)
            above = min(idx, B)
            denom = cdf[above] - cdf[below]
            if denom < eps:
                denom = 1.0
            frac = (u[r, n] - cdf[below]) / denom
            out[r, n] = bins[r, below] + frac * (bins[r, above] - bins[r, below])
    return out


def oracle_mlp(x_enc, params, skips=(4,), x_skip=None):
    """Tiny reference MLP: list of (W, b) f64 matmuls with ReLU, skip-concat."""
    h = x_enc
    x_skip = x_enc if x_skip is None else x_skip
    for i, (W, b) in enumerate(params):
        h = h @ W + b
        if i < len(params) - 1:
            h = np.maximum(h, 0.0)
        if i in skips and i < len(params) - 1:
            h = np.concatenate([x_skip, h], axis=-1)
    return h
