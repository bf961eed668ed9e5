"""Pallas TPU kernel: canonical k-mer window hashing, fused in VMEM.

One kernel computes, for a [TB, L] tile of 2-bit-coded reads, every
window's canonical MurmurHash3_x64_128 (seed 42, low 64 bits) — validity
mask, canonical-orientation compare, ASCII word packing, and the whole
murmur mix chain — entirely in uint32-pair arithmetic (ops/u64pair) on
VPU registers/VMEM, with no u64 emulation and no HBM round-trips between
stages.  Bit-identical to ops.hashing.kmer_window_hashes (the XLA path),
which remains the fallback for CPU, k > 32, and debugging
(RKMH_TPU_NO_PALLAS=1).

Supported k: 1..32 (one 64-bit canonical compare key, <= 4 murmur words;
every rkmh workload uses k in 12..31).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rkmh_tpu.ops import u64pair as up

U32 = jnp.uint32


def _ascii_u32(c):
    """2-bit code (u32) -> ASCII byte value as u32 (invalid handled by mask)."""
    out = jnp.where(c == 0, np.uint32(65), np.uint32(84))
    out = jnp.where(c == 1, np.uint32(67), out)
    return jnp.where(c == 2, np.uint32(71), out)


def _hash_kernel(codes_ref, lo_ref, hi_ref, *, k: int, seed: int, W: int):
    c = codes_ref[:].astype(U32)  # [TB, L]

    def sl(off):
        return c[:, off : off + W]

    # validity: any code >= 4 in the window -> hash 0
    invalid = sl(0) >= np.uint32(4)
    for p in range(1, k):
        invalid = invalid | (sl(p) >= np.uint32(4))

    three = np.uint32(3)

    # canonical compare keys as u64 (lo, hi) pairs, built Horner-style
    # (key = key<<2 | base).  NOTE: the direct form `(base << 2*(k-1-p))`
    # miscompiles under Mosaic for shifts 16..20 at tiles >8 sublanes
    # (bits silently dropped; verified against interpret mode) — the
    # accumulator-shift form avoids large shifts of small values.
    zf = jnp.zeros_like(sl(0))
    kf = (zf, zf)
    kr = (zf, zf)
    for p in range(k):
        fb = sl(p) & three                       # fwd: msb-first
        kf = up.shl64(*kf, 2)
        kf = (kf[0] | fb, kf[1])
    for p in range(k - 1, -1, -1):               # rc: Σ comp(c_p)·4^p
        rb = (three - (sl(p) & three)) & three
        kr = up.shl64(*kr, 2)
        kr = (kr[0] | rb, kr[1])
    use_fwd = up.ult32(kf[1], kr[1]) | ((kf[1] == kr[1]) & up.ule32(kf[0], kr[0]))

    # murmur input words: canonical kmer ASCII bytes, little-endian u64s
    # held as (lo, hi) u32 pairs.  byte p of fwd = ascii(c[i+p]); byte p of
    # rc = ascii(complement(c[i + k-1-p])).
    nwords = (k + 15) // 16 * 2  # murmur consumes word pairs
    pairs = []
    for w in range(nwords):
        wlo = jnp.zeros_like(zf)
        whi = jnp.zeros_like(zf)
        for j in range(8):
            p = 8 * w + j
            if p >= k:
                break
            fbyte = _ascii_u32(sl(p) & three)
            rbyte = _ascii_u32((three - (sl(k - 1 - p) & three)) & three)
            byte = jnp.where(use_fwd, fbyte, rbyte)
            if j < 4:
                wlo = wlo | (byte << np.uint32(8 * j))
            else:
                whi = whi | (byte << np.uint32(8 * (j - 4)))
        pairs.append((wlo, whi))

    h_lo, h_hi = up.murmur3_x64_128_h1(pairs, k, seed)
    zero = np.uint32(0)
    lo_ref[:] = jnp.where(invalid, zero, h_lo)
    hi_ref[:] = jnp.where(invalid, zero, h_hi)


def _pick_tile(B: int, W: int) -> int:
    """Rows per grid step: target ~6 MB of [TB, W] u32 working set."""
    budget = 6 * 1024 * 1024
    live = 72  # empirical: Mosaic's stack allocation is ~3x the naive count
    tb = budget // max(1, W * 4 * live)
    tb = max(8, min(512, int(tb)))
    # round to a multiple of 8 (sublane)
    return max(8, (tb // 8) * 8)


@partial(jax.jit, static_argnames=("k", "seed", "interpret"))
def kmer_window_hashes_pallas_pair(codes, k: int, seed: int = 42,
                                   interpret: bool = False):
    """[B, L] uint8 codes -> ([B, W] lo, [B, W] hi) uint32 halves of the
    canonical window hashes (W = L-k+1).

    The kernel computes in u32 pairs natively; returning the halves lets
    all-u32 consumers (the sort-free classify path) skip the u64
    pack/unpack, which XLA:TPU emulates expensively.
    """
    if not 1 <= k <= 32:
        raise ValueError(f"pallas hash kernel supports k in 1..32, got {k}")
    codes = jnp.asarray(codes, dtype=jnp.uint8)
    B, L = codes.shape
    W = L - k + 1
    if W <= 0 or B == 0:
        z = jnp.zeros((B, max(W, 0)), dtype=jnp.uint32)
        return z, z

    TB = _pick_tile(B, W)
    Bp = (B + TB - 1) // TB * TB
    if Bp != B:
        codes = jnp.concatenate(
            [codes, jnp.full((Bp - B, L), 255, dtype=jnp.uint8)]
        )

    kern = partial(_hash_kernel, k=k, seed=seed, W=W)

    def _imap(i):
        # under jax_enable_x64 a literal 0 traces as i64, which Mosaic's
        # index-map lowering rejects — keep every index the grid dtype
        return (i, i * 0)

    lo, hi = pl.pallas_call(
        kern,
        grid=(Bp // TB,),
        in_specs=[pl.BlockSpec((TB, L), _imap, memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TB, W), _imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, W), _imap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, W), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, W), jnp.uint32),
        ),
        interpret=interpret,
    )(codes)
    return lo[:B], hi[:B]


@partial(jax.jit, static_argnames=("k", "seed", "interpret"))
def kmer_window_hashes_pallas(codes, k: int, seed: int = 42, interpret: bool = False):
    """[B, L] uint8 codes -> [B, L-k+1] uint64 canonical window hashes.

    Pallas TPU fast path; bit-identical to hashing.kmer_window_hashes.
    """
    lo, hi = kmer_window_hashes_pallas_pair(codes, k, seed, interpret)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))


def pallas_enabled() -> bool:
    """Opt-in: RKMH_TPU_PALLAS=1 on a TPU backend.

    Measured on v5e (zika, k=12, 4k reads): the Pallas kernel and the XLA
    fused path are within noise of each other (~1 ms / 4k reads) — XLA
    already fuses the elementwise chain well — so the XLA path stays the
    default and this kernel is the explicit-control alternative (and the
    place to grow fused hash+sketch later).
    """
    if os.environ.get("RKMH_TPU_PALLAS", "0") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
