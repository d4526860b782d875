"""L1 — Pallas TPU kernel substrate (SURVEY.md §2.1 rows 5-7, §2.5).

The TPU-native equivalent of the ATen/CUDA kernels a PyTorch NeRF implicitly
relies on. Every kernel here is a drop-in twin of an L0/L2 XLA path, selected
by cfg.kernels flags, with equivalence tests in tests/kernels/.
"""

import jax


def kernels_enabled(cfg) -> bool:
    """Effective kernel switch: cfg.kernels.use_pallas AND a device the
    compiled kernels can target. Presets ship use_pallas=true; on the
    hermetic CPU harness (default device pinned to CPU) the XLA twins serve
    unless interpret mode is explicitly requested."""
    if not cfg.kernels.use_pallas:
        return False
    if cfg.kernels.interpret:
        return True
    dev = jax.config.jax_default_device
    if dev is None:
        devs = jax.devices()
        dev = devs[0] if devs else None
    return dev is not None and dev.platform == "tpu"
