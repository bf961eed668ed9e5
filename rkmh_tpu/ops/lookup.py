"""Panel lookup table: gather-free-as-possible sketch intersection.

The classify hot loop needs, for every read-sketch element, the set of
references whose sketch contains that (value, occurrence) pair.  Binary
search per (read, ref) pair (ops/intersect.py) costs O(B*s*R*log t)
serialized gathers — hostile to TPU.  This module replaces it with a
**2-choice cuckoo hash table built host-side once per reference panel**:

* every (hash, occ) pair present in any reference sketch becomes one
  table entry whose payload is a bitmask over references (bit r set iff
  ref r's sketch holds >= occ+1 copies of the hash);
* cuckoo placement guarantees every query resolves in exactly 2 probes;
* on device, a batch of B*s read elements resolves with 2*(3+Wm)
  vectorized u32 gathers total (Wm = ceil(R/32) mask words), then
  counts[b, r] = sum over the read's elements of bit r — a fused
  unpack-reduce.

Duplicate semantics stay exact (SURVEY §7 "hard parts"): a value with
multiplicity ca in the read and cb in ref r contributes min(ca, cb)
because the read's element #occ matches iff cb > occ.

The table keys store the full 64-bit hash plus the occurrence index, so
matches are exact — no false positives beyond murmur collisions the
reference itself is subject to.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rkmh_tpu.ops.sketch import SENTINEL

_EMPTY_OCC = np.int32(-1)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@dataclass
class PanelTable:
    """Host-built, device-queried (hash, occ) -> ref-bitmask table."""

    hash_hi: np.ndarray   # [T] uint32
    hash_lo: np.ndarray   # [T] uint32
    occ: np.ndarray       # [T] int32, -1 = empty
    masks: np.ndarray     # [T, Wm] uint32
    num_refs: int

    @property
    def size(self) -> int:
        return self.hash_hi.shape[0]

    def device_arrays(self):
        return (
            jnp.asarray(self.hash_hi),
            jnp.asarray(self.hash_lo),
            jnp.asarray(self.occ),
            jnp.asarray(self.masks),
        )


def build_panel_table(ref_sk: np.ndarray, ref_lens=None, num_refs: int | None = None) -> PanelTable:
    """Build the cuckoo table from a sorted sketch matrix [R, t] uint64
    (SENTINEL-padded rows, as produced by bottom_s_sketch)."""
    ref_sk = np.asarray(ref_sk, dtype=np.uint64)
    R = ref_sk.shape[0] if num_refs is None else num_refs
    Wm = max(1, (R + 31) // 32)

    # collect entries: (hash, occ) -> ref bitmask
    entries: dict[tuple[int, int], np.ndarray] = {}
    for r in range(ref_sk.shape[0]):
        row = ref_sk[r]
        row = row[row != SENTINEL]
        if ref_lens is not None:
            row = row[: int(np.asarray(ref_lens)[r])]
        prev = None
        occ = 0
        for h in row.tolist():
            occ = occ + 1 if h == prev else 0
            prev = h
            key = (h, occ)
            m = entries.get(key)
            if m is None:
                m = np.zeros(Wm, dtype=np.uint32)
                entries[key] = m
            m[r // 32] |= np.uint32(1 << (r % 32))

    n = len(entries)
    T = max(64, _next_pow2(2 * n))

    while True:
        hash_hi = np.zeros(T, dtype=np.uint32)
        hash_lo = np.zeros(T, dtype=np.uint32)
        occ_arr = np.full(T, _EMPTY_OCC, dtype=np.int32)
        masks = np.zeros((T, Wm), dtype=np.uint32)
        mask_t = T - 1

        def slots(h, o):
            # pure-python ints with explicit u32 wraparound — must agree
            # bit-for-bit with the device u32 arithmetic in _query_masks
            lo = h & 0xFFFFFFFF
            hi = (h >> 32) & 0xFFFFFFFF
            return (
                (lo ^ ((o * 0x9E3779B1) & 0xFFFFFFFF)) & mask_t,
                (hi ^ ((o * 0x85EBCA77) & 0xFFFFFFFF)) & mask_t,
            )

        ok = True
        rng = np.random.default_rng(12345)
        for (h, o), m in entries.items():
            cur = (h, o, m)
            placed = False
            for _kick in range(500):
                h_, o_, m_ = cur
                s1, s2 = slots(h_, o_)
                if occ_arr[s1] == _EMPTY_OCC:
                    tgt = s1
                elif occ_arr[s2] == _EMPTY_OCC:
                    tgt = s2
                else:
                    tgt = s1 if rng.integers(2) else s2
                if occ_arr[tgt] == _EMPTY_OCC:
                    hash_hi[tgt] = (h_ >> 32) & 0xFFFFFFFF
                    hash_lo[tgt] = h_ & 0xFFFFFFFF
                    occ_arr[tgt] = o_
                    masks[tgt] = m_
                    placed = True
                    break
                # evict
                eh = (int(hash_hi[tgt]) << 32) | int(hash_lo[tgt])
                ev = (eh, int(occ_arr[tgt]), masks[tgt].copy())
                hash_hi[tgt] = (h_ >> 32) & 0xFFFFFFFF
                hash_lo[tgt] = h_ & 0xFFFFFFFF
                occ_arr[tgt] = o_
                masks[tgt] = m_
                cur = ev
            if not placed:
                ok = False
                break
        if ok:
            return PanelTable(hash_hi, hash_lo, occ_arr, masks, R)
        T *= 2  # rare: rebuild bigger


def _query_masks(read_sk, occ_a, qmask, t_hi, t_lo, t_occ, t_masks):
    """Gather ref bitmask words for every read element.  [B, s] -> [B, s, Wm]."""
    T = t_hi.shape[0]
    mask_t = np.uint32(T - 1)
    lo = read_sk.astype(jnp.uint32)
    hi = (read_sk >> np.uint64(32)).astype(jnp.uint32)
    occ_u = occ_a.astype(jnp.uint32)
    s1 = ((lo ^ occ_u * np.uint32(0x9E3779B1)) & mask_t).astype(jnp.int32)
    s2 = ((hi ^ occ_u * np.uint32(0x85EBCA77)) & mask_t).astype(jnp.int32)

    out = jnp.zeros(read_sk.shape + (t_masks.shape[1],), dtype=jnp.uint32)
    for slot in (s1, s2):
        hit = (t_hi[slot] == hi) & (t_lo[slot] == lo) & (t_occ[slot] == occ_a) & qmask
        out = out | jnp.where(hit[..., None], t_masks[slot], np.uint32(0))
    return out


# ---------------------------------------------------------------------------
# Sorted-key panel: distinct-set membership for large full-hash panels
# ---------------------------------------------------------------------------
# The hpv16 type-level comparator intersects each read's *full* hash set
# with 182 reference hash *sets* (hash_set_intersection_size,
# rkmh.cpp:2669-2678) — ~1.4M distinct (hash, ref) pairs, too many for
# the Python cuckoo builder.  Keys here are deduplicated, so occ
# disambiguation is unnecessary: a sorted unique-key array + bitmask
# matrix builds in O(n log n) numpy and queries with one searchsorted
# (log2 U ~ 20 steps) per element.


def build_sorted_panel(ref_hash_rows: list, num_refs: int | None = None):
    """Per-ref distinct hash arrays -> (sorted unique keys [U] u64,
    masks [U, Wm] u32).  Zeros (invalid k-mers) are excluded."""
    R = num_refs if num_refs is not None else len(ref_hash_rows)
    Wm = max(1, (R + 31) // 32)
    keys_all = []
    refs_all = []
    for r, row in enumerate(ref_hash_rows):
        row = np.unique(np.asarray(row, dtype=np.uint64))
        row = row[row != 0]
        keys_all.append(row)
        refs_all.append(np.full(len(row), r, dtype=np.int64))
    if not keys_all or sum(len(x) for x in keys_all) == 0:
        return np.zeros(1, dtype=np.uint64), np.zeros((1, Wm), dtype=np.uint32)
    keys_cat = np.concatenate(keys_all)
    refs_cat = np.concatenate(refs_all)
    uniq, inv = np.unique(keys_cat, return_inverse=True)
    masks = np.zeros((len(uniq), Wm), dtype=np.uint32)
    np.bitwise_or.at(
        masks, (inv, refs_cat // 32), (np.uint32(1) << (refs_cat % 32)).astype(np.uint32)
    )
    return uniq, masks


def sorted_panel_counts(read_sk, read_lens, keys, masks, num_refs: int):
    """[B, s] sorted read hash arrays -> [B, R] *distinct* shared counts.

    Duplicate read values are counted once (set semantics): only each
    value's first occurrence queries the panel.
    """
    from rkmh_tpu.ops.intersect import occ_ranks

    B, s = read_sk.shape
    occ = occ_ranks(read_sk)
    qmask = (
        (jnp.arange(s, dtype=jnp.int32)[None, :] < read_lens[:, None])
        & (read_sk != SENTINEL)
        & (occ == 0)
    )
    pos = jnp.searchsorted(keys, read_sk)
    pos = jnp.clip(pos, 0, keys.shape[0] - 1)
    hit = (keys[pos] == read_sk) & qmask
    mw = jnp.where(hit[..., None], masks[pos], np.uint32(0))  # [B, s, Wm]
    counts = []
    for r in range(num_refs):
        w, b = divmod(r, 32)
        counts.append(
            jnp.sum((mw[..., w] >> np.uint32(b)) & np.uint32(1), axis=-1, dtype=jnp.int32)
        )
    return jnp.stack(counts, axis=-1)


def lookup_intersection_counts(read_sk, read_lens, table_arrays, num_refs: int):
    """[B, s] sorted read sketches -> [B, R] intersection counts, exactly
    matching intersect.intersection_counts, via the panel table."""
    from rkmh_tpu.ops.intersect import occ_ranks

    t_hi, t_lo, t_occ, t_masks = table_arrays
    B, s = read_sk.shape
    occ = occ_ranks(read_sk)
    qmask = (jnp.arange(s, dtype=jnp.int32)[None, :] < read_lens[:, None]) & (
        read_sk != SENTINEL
    )
    mw = _query_masks(read_sk, occ, qmask, t_hi, t_lo, t_occ, t_masks)  # [B, s, Wm]
    counts = []
    for r in range(num_refs):
        w, b = divmod(r, 32)
        counts.append(
            jnp.sum((mw[..., w] >> np.uint32(b)) & np.uint32(1), axis=-1, dtype=jnp.int32)
        )
    return jnp.stack(counts, axis=-1)  # [B, R]
