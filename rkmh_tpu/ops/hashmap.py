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
    """keys: unique uint64; values: int32.  Host-side vectorized cuckoo.

    Rounds of first-wins claims on each key's preferred slot, WITH
    eviction: a stuck key overwrites an occupant (random side per key
    per round) and the evicted key rejoins the pending set.  No per-key
    Python loop for the bulk — the old insertion walk cost ~25 us per
    key, ~4.6 s for a nanopore depth map.  Eviction is what keeps the
    table at load 0.5: greedy placement without it strands every key
    whose two slots are taken and the table balloons to ~n^1.5 slots
    before zero-failure placement succeeds.  The last few stragglers
    (keys in nearly-saturated cuckoo components, where the parallel
    walk's hitting time is quadratic in component size) are finished by
    the classic sequential eviction walk — O(dozens) of keys, cheap.
    """
    keys = np.asarray(keys, dtype=np.uint64)
    values = np.asarray(values, dtype=np.int32)
    assert keys.shape == values.shape
    n = len(keys)
    T = max(64, next_pow2(2 * max(n, 1)))

    lo_all = keys.astype(np.uint32)
    hi_all = (keys >> np.uint64(32)).astype(np.uint32)

    while True:
        mask_t = np.uint32(T - 1)
        used = np.zeros(T, dtype=bool)
        # which key occupies each slot (index into keys); -1 = empty
        slot_key = np.full(T, -1, dtype=np.int64)
        s1_all = (((lo_all ^ np.uint32(_MUL1)) * np.uint32(_MUL1)) & mask_t).astype(np.int64)
        s2_all = (((hi_all ^ np.uint32(_MUL2)) * np.uint32(_MUL2)) & mask_t).astype(np.int64)

        rng = np.random.default_rng(0xC0FFEE)
        pending = np.arange(n, dtype=np.int64)
        for rnd in range(64):
            if pending.size == 0:
                break
            t1 = s1_all[pending]
            t2 = s2_all[pending]
            free1 = ~used[t1]
            free2 = ~used[t2]
            # random per-key eviction side: a global side gives a
            # deterministic parallel walk that locks small key cycles
            # into evicting each other forever (observed: 28 keys
            # oscillating at load 0.49)
            side = rng.integers(0, 2, size=pending.size).astype(bool)
            evict = np.where(side, t2, t1)
            tgt = np.where(free1, t1, np.where(free2, t2, evict))
            # serialize within the round: first pending key per slot wins
            order = np.argsort(tgt, kind="stable")
            ts = tgt[order]
            first = np.ones(ts.size, dtype=bool)
            first[1:] = ts[1:] != ts[:-1]
            win_pos = order[first]                  # positions in `pending`
            w_slots = tgt[win_pos]
            evicted = slot_key[w_slots]
            evicted = evicted[evicted >= 0]
            slot_key[w_slots] = pending[win_pos]
            used[w_slots] = True
            keep = np.ones(pending.size, dtype=bool)
            keep[win_pos] = False
            pending = np.concatenate([pending[keep], evicted])
        if 0 < pending.size <= 65536:
            # sequential eviction walk for the stragglers.  An evicted
            # key never reinserts into the slot it was just kicked out
            # of (classic cuckoo alternation) — a random side choice can
            # bounce keys back and forth and time out on feasible
            # instances, forcing a spurious table doubling.
            ok = True
            for ki in pending.tolist():
                cur = ki
                came_from = -1
                placed = False
                for _step in range(10000):
                    c1, c2 = s1_all[cur], s2_all[cur]
                    if not used[c1]:
                        tgt = c1
                    elif not used[c2]:
                        tgt = c2
                    elif came_from == c1:
                        tgt = c2
                    elif came_from == c2:
                        tgt = c1
                    else:
                        tgt = c2 if rng.integers(2) else c1
                    prev = slot_key[tgt] if used[tgt] else -1
                    slot_key[tgt] = cur
                    used[tgt] = True
                    if prev < 0:
                        placed = True
                        break
                    came_from = tgt
                    cur = int(prev)
                if not placed:
                    ok = False
                    break
            if ok:
                pending = pending[:0]
        if pending.size == 0:
            occ = np.nonzero(used)[0]
            ki = slot_key[occ]
            hash_hi = np.zeros(T, dtype=np.uint32)
            hash_lo = np.zeros(T, dtype=np.uint32)
            vals = np.zeros(T, dtype=np.int32)
            hash_hi[occ] = hi_all[ki]
            hash_lo[occ] = lo_all[ki]
            vals[occ] = values[ki]
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
