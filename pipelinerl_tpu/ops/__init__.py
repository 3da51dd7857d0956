"""TPU compute kernels and their XLA reference implementations.

Every op here has an XLA reference implementation (works on CPU/TPU, used in
tests and as an autodiff-friendly fallback) and, for the hot ops, a Pallas
TPU kernel selected at runtime.
"""
