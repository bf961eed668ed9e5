"""Scalar Python oracle for mkmh/rkmh hash+sketch semantics.

This is the executable specification the TPU kernels are tested against.
It reimplements, in plain Python on top of the golden NumPy murmur3, the
behavior of the (non-vendored) mkmh library as reconstructed from its rkmh
call sites (SURVEY.md §2.3):

* ``calc_hash``      — canonical k-mer hash: uppercase ACGT only; the hash
  is MurmurHash3_x64_128 (seed 42, low 64 bits) of the lexicographic min of
  the k-mer and its reverse complement (Mash convention; rkmh.cpp:494-497
  documents canonical=true / seed 42 / 64 bits).  Any non-ACGT character
  makes the k-mer invalid → hash 0 (the sentinel every rkmh sketch loop
  skips, e.g. rkmh.cpp:1233-1235, 1274-1276).
* ``calc_hashes``    — all k-mer hashes of a sequence in sequence order,
  concatenated across k sizes for multi-k (rkmh.cpp:303, 860).
* ``minhashes``      — bottom-s sketch: sort ascending, drop zeros, take
  up to s (rkmh.cpp:863 semantics; open-coded at rkmh.cpp:1274-1284).
* ``intersection_size`` — sorted-array intersection size with
  min-multiplicity duplicate semantics (std::set_intersection behavior),
  the hot comparator of rkmh.cpp:867-870.
"""

from __future__ import annotations

from rkmh_tpu.ops.murmur3 import murmur3_x64_128_np

_COMP = {65: 84, 67: 71, 71: 67, 84: 65}  # A<->T, C<->G (ASCII)
_ACGT = frozenset(b"ACGT")


def revcomp(seq: bytes) -> bytes:
    return bytes(_COMP[b] for b in reversed(seq))


def calc_hash(kmer: bytes | str, seed: int = 42) -> int:
    """Canonical hash of one k-mer; 0 if it contains a non-ACGT base."""
    if isinstance(kmer, str):
        kmer = kmer.encode()
    kmer = kmer.upper()
    if any(b not in _ACGT for b in kmer):
        return 0
    rc = revcomp(kmer)
    canon = kmer if kmer <= rc else rc
    h1, _ = murmur3_x64_128_np(canon, seed)
    return h1


def calc_hashes(seq: bytes | str, ks: list[int] | int, seed: int = 42) -> list[int]:
    """All k-mer hashes in sequence order, concatenated over k sizes."""
    if isinstance(seq, str):
        seq = seq.encode()
    seq = seq.upper()
    if isinstance(ks, int):
        ks = [ks]
    out: list[int] = []
    for k in ks:
        for i in range(len(seq) - k + 1):
            out.append(calc_hash(seq[i : i + k], seed))
    return out


def minhashes(hashes: list[int], sketch_size: int) -> list[int]:
    """Bottom-s sketch: ascending sort, zeros excluded, up to s values."""
    nz = sorted(h for h in hashes if h != 0)
    return nz[:sketch_size]


def intersection_size(a: list[int], b: list[int]) -> int:
    """|multiset ∩| of two sorted hash arrays (min multiplicity per value)."""
    i = j = n = 0
    while i < len(a) and j < len(b):
        if a[i] < b[j]:
            i += 1
        elif a[i] > b[j]:
            j += 1
        else:
            n += 1
            i += 1
            j += 1
    return n


def set_intersection_size(a: list[int], b: list[int]) -> int:
    """Distinct shared hash values (hpv16 type-level comparator)."""
    return len(set(a) & set(b))
