"""rkmh-tpu: a TPU-native MinHash sequence-classification framework.

A from-scratch JAX/XLA/Pallas reimplementation of the *capabilities* of
edawson/rkmh (reference: /root/reference/src/rkmh.cpp): classify individual
sequencing reads against reference-genome panels with MinHash sketches,
filter reads, stream with constant-memory k-mer counters, dump/load
Mash-compatible sketches, and call variants by brute-force k-mer mutation
enumeration — all with the hot compute path (MurmurHash3 over every k-mer
window, bottom-s sketch selection, batched sketch-intersection counting)
running on TPU.

Design notes
------------
* hash_t is uint64 (MurmurHash3_x64_128, seed 42, low 64 bits), exactly as
  rkmh documents in its JSON metadata (rkmh.cpp:494-497).  We therefore
  enable jax_enable_x64 at import time; XLA:TPU emulates 64-bit integer
  ops with u32 pairs where the hardware lacks them.
* Reads/references are 2-bit packed host-side into fixed-shape [batch, L]
  uint8 code tensors; every per-k-mer inner loop from the reference
  (rkmh.cpp:293-433 hash_sequences / mkmh calc_hashes) becomes a batched
  vectorized device op.
* Parallelism is a jax.sharding Mesh: reads are data-parallel on the batch
  axis, reference panels can be tensor-parallel on the panel axis (merged
  with psum-style argmax), long genomes hash sequence-parallel in (k-1)-
  overlapped chunks.  The reference's OpenMP pragmas have no analog here.
"""

import os

# hash_t is 64-bit; enable x64 before any array is created.  Allow an
# explicit opt-out for embedding into 32-bit-only JAX programs (the hash
# kernels themselves compute in u32 pairs and do not require x64).
if os.environ.get("RKMH_TPU_NO_X64", "0") != "1":
    import jax

    jax.config.update("jax_enable_x64", True)

# This container's sitecustomize force-registers the axon TPU plugin and
# pins jax.config.jax_platforms='axon,cpu', silently overriding the
# standard JAX_PLATFORMS env var; re-assert the user's choice here (it
# must happen before the first jax.devices() call, after which the
# platform list freezes).
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax

    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass
del _plat

# Persistent compilation cache: the classify program is compile-once,
# run-forever (fixed shapes per length bucket).  ~60 s of XLA work on the
# first-ever run, ~0 after.
if os.environ.get("RKMH_TPU_NO_COMPILE_CACHE", "0") != "1":
    import jax

    _cache_dir = os.environ.get(
        "RKMH_TPU_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
        # persist even trivial programs: through the remote-compile tunnel
        # a sub-second compile still costs seconds of RTT per process
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

__version__ = "0.1.0"
