"""Exact u64 -> i32 device hash map (host-built cuckoo, 2-probe query).

The `call` command needs the reference's ``read_hash_to_depth``
unordered_map (rkmh.cpp:1570-1624): an *exact* map from canonical k-mer
hash to read depth, queried ~4k times per reference position during
mutation enumeration (rkmh.cpp:1807-1865).  A sorted-array searchsorted
costs log2(U) serialized gathers per query; this cuckoo layout resolves
every query in exactly 2 probes (6 u32 gathers), the same scheme
ops/lookup.py uses for the classify panel table.

Missing keys return `default` (0), matching operator[] default-insert
semantics for reads (the map is read-only during enumeration, and the
reference pre-populates every ref-position key via the depth loop
before any mutation query that could insert — inserts during the
parallel enumeration would be a data race the reference tolerates; we
replicate the value-returning behavior, not the race).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from rkmh_tpu.utils import next_pow2

_MUL1 = 0x9E3779B1
_MUL2 = 0x85EBCA77


@dataclass
class HashMap:
    hash_hi: np.ndarray  # [T] uint32
    hash_lo: np.ndarray  # [T] uint32
    used: np.ndarray     # [T] bool
    values: np.ndarray   # [T] int32

    def device_arrays(self):
        return (
            jnp.asarray(self.hash_hi),
            jnp.asarray(self.hash_lo),
            jnp.asarray(self.used),
            jnp.asarray(self.values),
        )


def build_hash_map(keys: np.ndarray, values: np.ndarray) -> HashMap:
    """keys: unique uint64; values: int32.  Host-side cuckoo placement."""
    keys = np.asarray(keys, dtype=np.uint64)
    values = np.asarray(values, dtype=np.int32)
    assert keys.shape == values.shape
    n = len(keys)
    T = max(64, next_pow2(2 * max(n, 1)))

    while True:
        hash_hi = np.zeros(T, dtype=np.uint32)
        hash_lo = np.zeros(T, dtype=np.uint32)
        used = np.zeros(T, dtype=bool)
        vals = np.zeros(T, dtype=np.int32)
        mask_t = T - 1

        def slots(h):
            lo = h & 0xFFFFFFFF
            hi = (h >> 32) & 0xFFFFFFFF
            return (lo ^ _MUL1) * _MUL1 % (1 << 32) & mask_t, (
                (hi ^ _MUL2) * _MUL2 % (1 << 32)
            ) & mask_t

        ok = True
        rng = np.random.default_rng(777)
        for h0, v0 in zip(keys.tolist(), values.tolist()):
            cur = (h0, v0)
            placed = False
            for _ in range(500):
                h, v = cur
                s1, s2 = slots(h)
                if not used[s1]:
                    tgt = s1
                elif not used[s2]:
                    tgt = s2
                else:
                    tgt = s1 if rng.integers(2) else s2
                if not used[tgt]:
                    hash_hi[tgt] = (h >> 32) & 0xFFFFFFFF
                    hash_lo[tgt] = h & 0xFFFFFFFF
                    used[tgt] = True
                    vals[tgt] = v
                    placed = True
                    break
                eh = (int(hash_hi[tgt]) << 32) | int(hash_lo[tgt])
                ev = (eh, int(vals[tgt]))
                hash_hi[tgt] = (h >> 32) & 0xFFFFFFFF
                hash_lo[tgt] = h & 0xFFFFFFFF
                vals[tgt] = v
                cur = ev
            if not placed:
                ok = False
                break
        if ok:
            return HashMap(hash_hi, hash_lo, used, vals)
        T *= 2


def hashmap_get(table_arrays, hashes, default: int = 0):
    """Device query: [.., ] uint64 -> int32 values (2 probes).

    Slot arithmetic must agree bit-for-bit with build_hash_map.slots.
    """
    t_hi, t_lo, t_used, t_vals = table_arrays
    T = t_hi.shape[0]
    mask_t = np.uint32(T - 1)
    lo = hashes.astype(jnp.uint32)
    hi = (hashes >> np.uint64(32)).astype(jnp.uint32)
    s1 = (((lo ^ np.uint32(_MUL1)) * np.uint32(_MUL1)) & mask_t).astype(jnp.int32)
    s2 = (((hi ^ np.uint32(_MUL2)) * np.uint32(_MUL2)) & mask_t).astype(jnp.int32)

    out = jnp.full(hashes.shape, default, dtype=jnp.int32)
    for slot in (s1, s2):
        hit = (t_hi[slot] == hi) & (t_lo[slot] == lo) & t_used[slot]
        out = jnp.where(hit, t_vals[slot], out)
    return out


def depth_map_from_hashes(hashes: np.ndarray, mask: np.ndarray) -> HashMap:
    """Build hash->count map from window hashes (the read depth map,
    rkmh.cpp:1616-1623).  Zeros are counted too: every invalid read k-mer
    increments map[0], exactly like the reference's operator[] loop."""
    h = np.asarray(hashes, dtype=np.uint64)[np.asarray(mask, dtype=bool)]
    keys, counts = np.unique(h, return_counts=True)
    return build_hash_map(keys, counts.astype(np.int32))
