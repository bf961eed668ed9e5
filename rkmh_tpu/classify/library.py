"""Classification-library helpers: the equiv.hpp API surface.

The reference's equiv.hpp exports more than its commands use — `merge`,
`only_informative_kmers`, `classify`, `all_hash_compare`, `all_count`
(equiv.hpp:59-111, 171-199, 440-472) are library functions with no live
call site in rkmh.cpp.  They're provided here so the full inventory
(SURVEY.md §2.2 row 2) has a working equivalent, built on the same
device ops as the command paths.

Semantics notes vs the reference:
* merge keeps the reference's bottom-s-of-union behavior (min_heap over
  all hashes); the counted variant reports exact multiset counts rather
  than HASHTCounter(1e8)-lossy ones (pass counter_size to reproduce the
  lossy behavior).
* classify uses multiset intersection (hash_intersection) with the
  strict-> scan starting at 0 — an unmatched read returns "" exactly
  like equiv.hpp:459-470.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from rkmh_tpu import oracle


def merge_sketches(mins: list[list[int]], sketch_size: int) -> list[int]:
    """Bottom-s sketch of the union of several sketches
    (equiv.hpp:88-111 merge/2): the min_heap is a std::set that skips
    zeros (equiv.hpp:32-34), so the union dedups and drops the invalid
    sentinel before taking the lowest `sketch_size`."""
    allh = sorted({h for row in mins for h in row} - {0})
    return allh[:sketch_size]


def merge_sketches_with_counts(
    mins: list[list[int]], sketch_size: int, counter_size: int | None = None
) -> tuple[list[int], list[int]]:
    """merge/3 (equiv.hpp:59-83): bottom-(2*sketch_size) union sketch
    (set semantics, zeros dropped) plus per-hash occurrence counts over
    every input element.  counter_size reproduces the reference's lossy
    HASHTCounter(1e8) counts (collisions merge); None = exact."""
    counts: Counter = Counter()
    for row in mins:
        for h in row:
            key = h % counter_size if counter_size else h
            counts[key] += 1
    sketch = merge_sketches(mins, 2 * sketch_size)  # heap is 2*s, equiv.hpp:62
    out_counts = [
        counts[h % counter_size if counter_size else h] for h in sketch
    ]
    return sketch, out_counts


def only_informative_kmers(
    name_to_hashes: dict[str, list[int]], max_samples: int
) -> dict[str, list[int]]:
    """Per-sample hash lists filtered to hashes occurring in fewer than
    max_samples samples (equiv.hpp:171-199; distinct per-sample counting
    via make_kmer_to_sample_count)."""
    sample_count: Counter = Counter()
    for hashes in name_to_hashes.values():
        for h in set(hashes):
            sample_count[h] += 1
    return {
        name: [h for h in hashes if sample_count[h] < max_samples]
        for name, hashes in name_to_hashes.items()
    }


def classify(read_hashes: list[int], ref_to_hashes: dict[str, list[int]]) -> str:
    """Best-matching reference name by multiset intersection size, "" when
    nothing matches (equiv.hpp:459-472; map iteration = sorted names)."""
    best, best_shared = "", 0
    sh = sorted(read_hashes)
    for name in sorted(ref_to_hashes):
        shared = oracle.intersection_size(sh, sorted(ref_to_hashes[name]))
        if shared > best_shared:
            best, best_shared = name, shared
    return best


def all_hash_compare(
    hashes: list[int], ref_hashes: list[tuple[str, list[int]]]
) -> list[int]:
    """Multiset intersection size vs every reference (equiv.hpp:447-456).

    Device path for batches: ops.intersect.intersection_counts /
    ops.lookup.lookup_intersection_counts — this scalar form mirrors the
    reference's signature for library use.
    """
    sh = sorted(hashes)
    return [
        oracle.intersection_size(sh, sorted(rh)) for _, rh in ref_hashes
    ]
