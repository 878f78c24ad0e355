"""sat_tpu — a TPU-native "Show, Attend and Tell" image-captioning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference implementation (yvokeller/Show-Attend-and-Tell): frozen CNN encoders
emitting annotation grids, a soft-attention LSTM decoder (teacher forcing,
advanced deep output, optional frozen BERT embeddings, attention on/off),
doubly-stochastic attention regularization, beam-search captioning with
attention visualization, and Karpathy-split data prep — re-architected as
pure-functional jitted programs: the autoregressive decode is a fused,
batched, on-device `lax.scan`/`lax.while_loop` instead of a per-step Python
loop, and training runs data-parallel over a `jax.sharding.Mesh`.

Package layout:
  sat_tpu.models    — encoder / attention / decoder / beam search
  sat_tpu.ops       — compute kernels (LSTM cell, Pallas fused decode step)
  sat_tpu.parallel  — device mesh, shardings, pjit train step
  sat_tpu.data      — vocab + caption prep, streaming dataset, transforms
  sat_tpu.engine    — train / eval loops, checkpointing
  sat_tpu.utils     — meters, metrics, logging, viz, profiling

Import stays light: no JAX backend initialization happens at import time, so
`JAX_PLATFORMS` / `XLA_FLAGS` set by the caller (e.g. tests forcing a virtual
8-device CPU mesh) still take effect.
"""

from sat_tpu.version import __version__

__all__ = ["__version__"]
