"""Padded-length grid invariants (io.packing.grid_length / length_buckets).

The classify probe gathers one table row per window slot, so padded
length directly scales the dominant device cost; these tests pin the
grid contract the batching paths rely on: every bucket length is a
multiple of 8 (pack_codes4 packs 8 bases per u16 lane), covers its
reads, and comes from a fixed value universe so compile caches converge.
"""

import numpy as np

from rkmh_tpu.io.packing import (
    _GRID_FINE_CAP,
    _GRID_FINE_STEP,
    grid_length,
    length_buckets,
)


def test_grid_length_values_and_invariants():
    # fine grid below the cap, coarse 128 grid above
    assert grid_length(1) == 32
    assert grid_length(150) == 160
    assert grid_length(160) == 160
    assert grid_length(_GRID_FINE_CAP) == _GRID_FINE_CAP
    assert grid_length(_GRID_FINE_CAP + 1) == 640
    assert grid_length(6500) == 6528
    for n in range(1, 2000, 7):
        g = grid_length(n)
        assert g >= n
        assert g % 8 == 0, "pack_codes4 requires L % 8 == 0"
        # value universe is fixed: 32-grid below the cap, 128-grid above
        assert g % (_GRID_FINE_STEP if g <= _GRID_FINE_CAP else 128) == 0
        assert grid_length(g) == g  # idempotent


def test_length_buckets_cover_and_grid():
    rng = np.random.default_rng(0)
    lens = np.concatenate([
        rng.integers(40, 200, 50),       # short-read regime (fine grid)
        rng.integers(1600, 7400, 50),    # nanopore regime (coarse grid)
    ])
    uniq, idx = length_buckets(lens, max_buckets=4)
    assert len(uniq) <= 4
    assert np.all(uniq[idx] >= lens), "every read must fit its bucket"
    assert np.all(uniq % 8 == 0)
    # bucket values come from the raw grid (merge picks among them)
    raw = {grid_length(int(l)) for l in lens}
    assert set(uniq.tolist()) <= raw


def test_length_buckets_uniform_short_reads_single_fine_bucket():
    # z1.fq shape: 1000 x 150 bp -> one L=160 bucket, not 256
    uniq, idx = length_buckets(np.full(1000, 150))
    assert uniq.tolist() == [160]
    assert set(idx.tolist()) == {0}
