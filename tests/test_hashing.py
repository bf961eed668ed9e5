"""Device k-mer hashing vs the scalar oracle (bit-exactness)."""

import numpy as np
import pytest
import jax

from rkmh_tpu import oracle
from rkmh_tpu.io.packing import encode_seqs
from rkmh_tpu.ops.hashing import (
    kmer_window_hashes,
    multi_k_window_hashes,
    window_counts,
    window_mask,
)


def random_dna(rng, n, with_n=False):
    alphabet = b"ACGT" + (b"N" if with_n else b"")
    return bytes(rng.choice(np.frombuffer(alphabet, dtype=np.uint8), size=n))


@pytest.mark.parametrize("k", [4, 12, 16, 18, 31, 33])
def test_window_hashes_match_oracle(k):
    rng = np.random.default_rng(k)
    seqs = [random_dna(rng, n) for n in (k, k + 1, 40, 73)]
    codes, lens = encode_seqs(seqs, pad_to=80, granularity=1)
    got = np.asarray(jax.jit(lambda c: kmer_window_hashes(c, k))(codes))
    for i, s in enumerate(seqs):
        exp = oracle.calc_hashes(s, k)
        W = len(s) - k + 1
        assert [int(x) for x in got[i, :W]] == exp
        # padded windows must be invalid (0)
        assert np.all(got[i, W:] == 0)


def test_invalid_bases_hash_to_zero():
    rng = np.random.default_rng(7)
    k = 12
    seqs = [random_dna(rng, 60, with_n=True) for _ in range(8)]
    codes, lens = encode_seqs(seqs, pad_to=64, granularity=1)
    got = np.asarray(kmer_window_hashes(codes, k))
    for i, s in enumerate(seqs):
        exp = oracle.calc_hashes(s, k)
        assert [int(x) for x in got[i, : len(exp)]] == exp


def test_lowercase_handled_by_encoder():
    codes, _ = encode_seqs([b"acgtACGTacgt"], pad_to=12, granularity=1)
    got = np.asarray(kmer_window_hashes(codes, 8))
    exp = oracle.calc_hashes(b"ACGTACGTACGT", 8)
    assert [int(x) for x in got[0]] == exp


def test_palindrome_and_revcomp_pairs():
    # canonical hashing: a kmer and its revcomp must hash identically
    fwd = b"ACGTTGCA"  # palindromic under revcomp
    other = b"AAACCCGG"
    rc = oracle.revcomp(other)
    codes, _ = encode_seqs([fwd, other, rc], pad_to=8, granularity=1)
    got = np.asarray(kmer_window_hashes(codes, 8))
    assert int(got[1, 0]) == int(got[2, 0])
    assert int(got[0, 0]) == oracle.calc_hash(fwd)


def test_multi_k_concatenation_order():
    rng = np.random.default_rng(1)
    s = random_dna(rng, 50)
    codes, lens = encode_seqs([s], pad_to=50, granularity=1)
    got = np.asarray(multi_k_window_hashes(codes, [12, 16]))
    exp = oracle.calc_hashes(s, [12, 16])
    assert [int(x) for x in got[0]] == exp
    assert int(window_counts(lens, [12, 16])[0]) == len(exp)


def test_window_mask_multi_k():
    lens = np.array([10, 50], dtype=np.int32)
    m = np.asarray(window_mask(lens, 50, [12, 16]))
    # read 0: len 10 < k -> no valid windows at all
    assert m[0].sum() == 0
    assert m[1].sum() == (50 - 11) + (50 - 15)
