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
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rkmh_tpu import oracle
from rkmh_tpu.ops.sketch import SENTINEL, sort_u64_rows


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


# ---------------------------------------------------------------------------
# Device-batch forms of the same exports.  The scalar functions above are
# the executable spec (oracle-backed); these run whole row batches on the
# accelerator and are bit-tested against them (tests/test_library.py).
# Rows use the package's device hash-row convention: uint64, 0 = invalid
# (mkmh's canonical-hash sentinel), any order unless noted.
# ---------------------------------------------------------------------------


def _sort_flat(rows):
    """All valid values of [..., W] rows, ascending, SENTINEL-padded."""
    flat = rows.reshape(1, -1)
    x = jnp.where(flat == np.uint64(0), SENTINEL, flat)
    return sort_u64_rows(x)[0]


@partial(jax.jit, static_argnames=("sketch_size",))
def merge_sketches_batch(rows, sketch_size: int):
    """Device merge/2 (equiv.hpp:88-111): bottom-`sketch_size` of the
    DEDUPED union of all rows.  Returns (sorted [sketch_size] uint64,
    SENTINEL-padded, count)."""
    xs = _sort_flat(rows)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), xs[1:] != xs[:-1]])
    keep = first & (xs != SENTINEL)
    rank = jnp.cumsum(keep) - 1
    idx = jnp.where(keep & (rank < sketch_size), rank, sketch_size)
    out = jnp.full((sketch_size + 1,), SENTINEL, dtype=jnp.uint64)
    out = out.at[idx].set(xs, mode="drop")[:sketch_size]
    n = jnp.minimum(jnp.sum(keep), sketch_size).astype(jnp.int32)
    return out, n


@partial(jax.jit, static_argnames=("sketch_size",))
def merge_sketches_with_counts_batch(rows, sketch_size: int):
    """Device merge/3 (equiv.hpp:59-83): bottom-(2*sketch_size) union
    sketch plus exact multiset occurrence counts per selected hash
    (the counter_size=None flavor of merge_sketches_with_counts)."""
    sketch, n = merge_sketches_batch.__wrapped__(rows, 2 * sketch_size)
    xs = _sort_flat(rows)
    left = jnp.searchsorted(xs, sketch, side="left")
    right = jnp.searchsorted(xs, sketch, side="right")
    counts = jnp.where(sketch != SENTINEL, right - left, 0).astype(jnp.int32)
    return sketch, counts, n


@jax.jit
def informative_mask_batch(rows, sample_counts_max):
    """Device only_informative_kmers (equiv.hpp:171-199): per-element
    keep mask for hashes occurring in fewer than `sample_counts_max`
    DISTINCT rows (invalid 0s are never kept).

    Counting: row-sort -> per-row first-occurrence flags -> one global
    sort of the distinct stream -> run lengths = samples per hash ->
    searchsorted lookup back onto every original element."""
    x = jnp.where(rows == np.uint64(0), SENTINEL, rows)
    xs = sort_u64_rows(x)                          # [N, W] row-sorted
    row_first = jnp.concatenate(
        [jnp.ones_like(xs[:, :1], bool), xs[:, 1:] != xs[:, :-1]], axis=1)
    distinct = jnp.where(row_first & (xs != SENTINEL), xs, SENTINEL)
    ds = _sort_flat(jnp.where(distinct == SENTINEL, 0, distinct))
    # samples-per-value for each original element, via run bounds in ds
    left = jnp.searchsorted(ds, x, side="left")
    right = jnp.searchsorted(ds, x, side="right")
    n_samples = (right - left).astype(jnp.int32)
    return (rows != np.uint64(0)) & (n_samples < sample_counts_max)


@jax.jit
def all_hash_compare_batch(read_sorted, read_lens, ref_sorted, ref_lens):
    """Device all_hash_compare (equiv.hpp:447-456): multiset
    intersection sizes [B, R] of sorted hash rows (SENTINEL-padded,
    as produced by ops.intersect.sort_hashes_padded)."""
    from rkmh_tpu.ops.intersect import intersection_counts

    return intersection_counts(read_sorted, read_lens, ref_sorted, ref_lens)


def classify_batch(read_sorted, read_lens, ref_sorted, ref_lens,
                   ref_names: list[str]) -> list[str]:
    """Device classify (equiv.hpp:459-472) over a read batch: best
    NAME-SORTED reference per read by multiset intersection, "" when
    nothing matches (the reference iterates a std::map, i.e. sorted
    names, with a strict > scan)."""
    order = np.argsort(ref_names, kind="stable")
    counts = np.asarray(all_hash_compare_batch(
        read_sorted, read_lens, ref_sorted[order],
        jnp.asarray(np.asarray(ref_lens)[order])))
    best = counts.argmax(axis=1)
    names_sorted = [ref_names[i] for i in order]
    return [
        names_sorted[b] if counts[i, b] > 0 else ""
        for i, b in enumerate(best)
    ]
