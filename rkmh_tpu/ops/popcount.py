"""Vertical (bit-sliced) popcount: per-bit-position counts over an axis.

The classify probe ends by counting, for every read and every reference
r, how many sketch elements matched ref r — i.e. summing bit r of the
selected mask words over the sketch axis (ops/lookup.py).  The naive
form expands R separate ``(sel >> r) & 1`` planes and reduces each: ~2·R
elementwise ops per element (R up to 182 for hpv16), which profiling
shows is a multi-ms tail of the device step.

This module computes ALL 32 bit-position counts simultaneously with a
binary ripple-carry adder tree over bit-planes: the W mask words are a
list of W 1-bit bit-sliced integers (each u32 word holds bit r of 32
independent counters); summing two n-bit bit-sliced numbers costs ~5·n
elementwise u32 ops (XOR/AND/OR ripple carry), so the whole tree is
~5·W ops *independent of R* — versus 2·R·W for the expansion.  For
W=7409, R=182 (the hpv16 type probe) that is ~470x fewer lane-ops.

Exactness: pure integer adder arithmetic — counts are bit-identical to
the expansion for any input.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _ripple_add(a_planes, b_planes):
    """Sum two little-endian bit-sliced numbers (lists of equal-shape u32
    planes).  len(result) = max(len(a), len(b)) + 1."""
    n = max(len(a_planes), len(b_planes))
    zero = None
    out = []
    carry = None
    for p in range(n):
        ap = a_planes[p] if p < len(a_planes) else None
        bp = b_planes[p] if p < len(b_planes) else None
        if ap is None:
            ap, bp = bp, None
        if bp is None and carry is None:
            out.append(ap)
            continue
        if bp is None:
            bp, carry = carry, None
        if carry is None:
            s = ap ^ bp
            carry = ap & bp
        else:
            axb = ap ^ bp
            s = axb ^ carry
            carry = (ap & bp) | (axb & carry)
        out.append(s)
    if carry is not None:
        out.append(carry)
    return out


def vertical_popcounts(x, nbits: int):
    """x [..., W] uint32 -> [..., nbits] int32 where out[..., r] =
    sum over W of bit r of x — all positions counted at once via a
    carry-save/ripple adder tree (~5 ops per word, independent of nbits).
    """
    x = x.astype(jnp.uint32)
    W = x.shape[-1]
    if W == 0:
        return jnp.zeros(x.shape[:-1] + (nbits,), jnp.int32)
    # binary tree: halve the word axis, ripple-adding the two halves;
    # an odd leftover column rides along as one extra bit-sliced number
    planes = [x]
    n = W
    while n > 1:
        h = n // 2
        a = [p[..., :h] for p in planes]
        b = [p[..., h : 2 * h] for p in planes]
        summed = _ripple_add(a, b)
        if n % 2:
            old = planes
            planes = [
                jnp.concatenate(
                    [sp,
                     old[p][..., 2 * h : 2 * h + 1] if p < len(old)
                     else jnp.zeros_like(sp[..., :1])],
                    axis=-1,
                )
                for p, sp in enumerate(summed)
            ]
            n = h + 1
        else:
            planes = summed
            n = h
    # planes: ~log2(W)+1 single-column u32 planes, little-endian weights
    shifts = jnp.arange(nbits, dtype=jnp.uint32)
    total = None
    for p, plane in enumerate(planes):
        bits = ((plane[..., 0:1] >> shifts) & np.uint32(1)).astype(jnp.int32)
        term = bits << p
        total = term if total is None else total + term
    return total
