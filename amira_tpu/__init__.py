"""amira-tpu: a TPU-native AMR-gene detection engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Danderson123/Amira (reference layout surveyed in SURVEY.md): per-read gene
calls are packed into integer tensors, the gene-space de Bruijn graph is
built with batched hash/sort/segment-sum ops on device, error correction and
multi-copy path clustering run as vectorized kernels, and the
minimap2/racon/jellyfish externals are replaced by native JAX/Pallas
alignment, consensus and k-mer counting kernels.
"""

import os

import jax

# The gene-mer engine keys nodes/edges by 64-bit mix hashes; enable x64 so
# device-side sort/unique/segment ops can operate on them directly.
jax.config.update("jax_enable_x64", True)

# TPU compiles go through a remote tunnel here (~20-40s each); cache them
# persistently so pipeline re-runs and tests only pay once per shape.
try:  # pragma: no cover - best effort
    _cache = os.environ.get(
        "AMIRA_TPU_JAX_CACHE", os.path.expanduser("~/.cache/amira_tpu_jax")
    )
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

__version__ = "0.1.0"
