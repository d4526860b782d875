"""L1 — Pallas TPU kernel substrate (SURVEY.md §2.1 rows 5-7, §2.5).

The TPU-native equivalent of the ATen/CUDA kernels a PyTorch NeRF implicitly
relies on. Every kernel here is a drop-in twin of an L0/L2 XLA path, selected
by cfg.kernels flags, with equivalence tests in tests/kernels/.
"""
