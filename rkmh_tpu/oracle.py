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


def hash_intersection(a: list[int], b: list[int]) -> list[int]:
    """Matching hashes of two sorted arrays, multiset semantics — the
    value-returning mkmh hash_intersection (equiv.hpp:268/282 call sites)."""
    i = j = 0
    out: list[int] = []
    while i < len(a) and j < len(b):
        if a[i] < b[j]:
            i += 1
        elif a[i] > b[j]:
            j += 1
        else:
            out.append(a[i])
            i += 1
            j += 1
    return out


def kmer_intersection(a: list, b: list) -> list:
    """Shared k-mer strings (legacy string-kmer comparator,
    equiv.hpp:435/237 kmer_intersection / kmer_heap_intersection)."""
    return hash_intersection(sorted(a), sorted(b))


def set_intersection_size(a: list[int], b: list[int]) -> int:
    """Distinct shared hash values (hpv16 type-level comparator)."""
    return len(set(a) & set(b))


# ---------------------------------------------------------------------------
# `call` oracle — scalar replication of rkmh.cpp:1766-1888
# ---------------------------------------------------------------------------

_ROTATE = {  # rotate_snps order, rkmh.cpp:1634-1654
    "A": "CTG", "C": "TGA", "T": "CGA", "G": "ACT",
}


def call_variants(ref_name: str, ref_seq: bytes, read_depth: dict[int, int],
                  k: int, window_len: int = 100):
    """Replicates the reference's per-ref call loop exactly.

    read_depth: hash -> count over every read k-mer occurrence (zeros
    included).  Returns (calls, depth_rows) where calls maps the VCF key
    string "ref\\tpos\\t.\\tREF\\tALT" -> [count, max_depth, avg_depth,
    orig_depth] and depth_rows is the per-position (avg, depth,
    max_rescue) list of the -d path.

    Documented deviation: the depth window resets per reference.  The
    reference's d_window is per-OpenMP-thread (rkmh.cpp:1769-1790) and
    carries history across whatever refs a thread happens to process —
    a thread-scheduling-dependent behavior with no deterministic analog
    (see PARITY.md; rkmh itself warns multi-ref VCFs are not correct).
    """
    seq = ref_seq.decode() if isinstance(ref_seq, bytes) else ref_seq
    seq = seq.upper()  # rkmh to_upper's before the call loop (rkmh.cpp:1610)
    P = len(seq) - k + 1
    hashes = [calc_hash(seq[j : j + k]) for j in range(P)]

    calls: dict[str, list[int]] = {}
    rows = []
    window: list[int] = []

    def record(key, alt_depth, avg_d, depth):
        ent = calls.setdefault(key, [0, 0, 0, 0])
        ent[0] += 1
        ent[2] = max(ent[2], avg_d)
        ent[3] = max(ent[3], depth)
        if alt_depth > ent[1]:
            ent[1] = alt_depth

    for j in range(P):
        depth = read_depth.get(hashes[j], 0)
        window.append(depth)
        if len(window) > window_len:
            window.pop(0)
        avg_d = int(sum(window) / len(window))  # (double) division, int trunc
        max_rescue = 0

        if depth < 0.5 * avg_d:
            kmer = seq[j : j + k]
            # SNPs (rkmh.cpp:1807-1838)
            for ap in range(k):
                orig = kmer[ap]
                for x in _ROTATE.get(orig, ""):
                    alt = kmer[:ap] + x + kmer[ap + 1 :]
                    alt_depth = read_depth.get(calc_hash(alt), 0)
                    max_rescue = max(max_rescue, alt_depth)
                    if alt_depth >= 0.1 * avg_d and alt_depth > depth:
                        pos = j + ap + 1
                        record(f"{ref_name}\t{pos}\t.\t{orig}\t{x}",
                               alt_depth, avg_d, depth)
            # 1bp deletions (rkmh.cpp:1845-1865)
            if j > 0:
                d_alt = seq[j - 1 : j + k]  # k+1 chars
                for ap in range(1, k + 1):
                    mod = d_alt[:ap] + d_alt[ap + 1 :]
                    alt_depth = read_depth.get(calc_hash(mod), 0)
                    if alt_depth > 0.9 * avg_d:
                        pos = j + ap + 1
                        record(f"{ref_name}\t{pos}\t.\t{d_alt[ap]}\t-",
                               alt_depth, avg_d, depth)

        rows.append((avg_d, depth, max_rescue))
    return calls, rows


def read_depth_map(reads: list[bytes], k: int) -> dict[int, int]:
    """hash -> occurrence count over all reads (zeros included,
    rkmh.cpp:1616-1623)."""
    d: dict[int, int] = {}
    for seq in reads:
        for h in calc_hashes(seq, k):
            d[h] = d.get(h, 0) + 1
    return d
