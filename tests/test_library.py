"""equiv.hpp library-surface equivalents (classify.library)."""

from rkmh_tpu.classify.library import (
    all_hash_compare,
    classify,
    merge_sketches,
    merge_sketches_with_counts,
    only_informative_kmers,
)


def test_merge_bottom_s_of_union():
    mins = [[5, 9, 30], [1, 9, 40], [2, 50]]
    assert merge_sketches(mins, 4) == [1, 2, 5, 9]


def test_merge_dedups_and_skips_zeros():
    # the reference min_heap is a std::set skipping 0 (equiv.hpp:25-54)
    assert merge_sketches([[5, 5], [9]], 2) == [5, 9]
    assert merge_sketches([[0, 7], [3]], 2) == [3, 7]


def test_merge_with_counts_exact_and_lossy():
    mins = [[5, 9], [9, 105]]
    sketch, counts = merge_sketches_with_counts(mins, 1)  # heap = 2*1
    assert sketch == [5, 9]
    assert counts == [1, 2]
    # lossy table of size 100: 5 and 105 collide
    sketch, counts = merge_sketches_with_counts(mins, 1, counter_size=100)
    assert sketch == [5, 9]
    assert counts == [2, 2]


def test_only_informative_kmers():
    data = {"a": [1, 2, 3, 3], "b": [2, 3], "c": [3, 4]}
    out = only_informative_kmers(data, max_samples=2)
    # 3 occurs in 3 samples -> dropped; 2 occurs in 2 -> dropped at <2
    assert out == {"a": [1], "b": [], "c": [4]}
    out = only_informative_kmers(data, max_samples=3)
    assert out == {"a": [1, 2], "b": [2], "c": [4]}


def test_classify_and_all_hash_compare():
    refs = {"r1": [1, 2, 3], "r2": [3, 4, 5, 6]}
    assert classify([3, 4, 5], refs) == "r2"
    assert classify([99], refs) == ""  # no match -> "" (equiv.hpp:461)
    assert all_hash_compare([3, 4, 5], [("r1", [1, 2, 3]), ("r2", [3, 4, 5, 6])]) == [1, 3]
    # multiset semantics: duplicate counted min(multiplicities)
    assert all_hash_compare([3, 3], [("r", [3, 3, 3])]) == [2]
