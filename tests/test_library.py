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


def test_device_batch_forms_match_scalar():
    """merge/informative/compare/classify device-batch forms vs the
    scalar spec on random 0-padded hash rows."""
    import numpy as np
    import jax.numpy as jnp
    from rkmh_tpu.classify.library import (
        all_hash_compare_batch,
        classify_batch,
        informative_mask_batch,
        merge_sketches_batch,
        merge_sketches_with_counts_batch,
    )
    from rkmh_tpu.ops.intersect import sort_hashes_padded
    from rkmh_tpu.ops.sketch import SENTINEL

    rng = np.random.default_rng(11)
    N, W = 7, 40
    rows = rng.integers(1, 60, size=(N, W)).astype(np.uint64)
    rows[rng.random((N, W)) < 0.2] = 0  # invalid holes
    lists = [[int(h) for h in r if h] for r in rows]

    # merge/2
    for s in (4, 25, 500):
        want = merge_sketches(lists, s)
        got, n = merge_sketches_batch(jnp.asarray(rows), s)
        got = np.asarray(got)
        assert int(n) == len(want)
        assert got[: len(want)].tolist() == want
        assert (got[len(want):] == np.uint64(SENTINEL)).all()

    # merge/3 (exact counts flavor)
    want_sk, want_ct = merge_sketches_with_counts(lists, 5)
    got_sk, got_ct, n = merge_sketches_with_counts_batch(jnp.asarray(rows), 5)
    assert int(n) == len(want_sk)
    assert np.asarray(got_sk)[: len(want_sk)].tolist() == want_sk
    assert np.asarray(got_ct)[: len(want_ct)].tolist() == want_ct

    # only_informative_kmers as a device mask
    named = {f"s{i}": lists[i] for i in range(N)}
    for ms in (2, 4):
        want_d = only_informative_kmers(named, ms)
        mask = np.asarray(informative_mask_batch(jnp.asarray(rows), ms))
        got_d = {
            f"s{i}": [int(h) for h, m in zip(rows[i], mask[i]) if m]
            for i in range(N)
        }
        assert got_d == want_d

    # all_hash_compare + classify over a batch
    ref_rows = rng.integers(1, 60, size=(3, 30)).astype(np.uint64)
    ref_lists = [("b", [int(h) for h in ref_rows[1]]),
                 ("a", [int(h) for h in ref_rows[0]]),
                 ("c", [int(h) for h in ref_rows[2]])]
    rs, rlens = sort_hashes_padded(jnp.asarray(rows), jnp.asarray(rows) != 0)
    ref_bac = jnp.asarray(ref_rows[[1, 0, 2]])
    fs, flens = sort_hashes_padded(ref_bac, ref_bac != 0)
    counts = np.asarray(all_hash_compare_batch(rs, rlens, fs, flens))
    for i in range(N):
        assert counts[i].tolist() == all_hash_compare(lists[i], ref_lists)

    names = [classify(lst, dict((n, h) for n, h in ref_lists))
             for lst in lists]
    got_names = classify_batch(rs, rlens, fs, flens, ["b", "a", "c"])
    assert got_names == names
