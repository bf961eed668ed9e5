"""Pallas canonical-hash kernel: bit-exact vs the XLA path (interpret
mode on CPU; the TPU compile path is additionally validated on hardware
— see ops/pallas_hash.py docstrings for the Mosaic shift-miscompile
workaround this kernel carries)."""

import numpy as np
import pytest

from rkmh_tpu.ops.hashing import kmer_window_hashes
from rkmh_tpu.ops.pallas_hash import kmer_window_hashes_pallas
from rkmh_tpu.ops import u64pair as up
from rkmh_tpu.ops.murmur3 import murmur3_x64_128_np


@pytest.mark.parametrize("k", [4, 12, 16, 17, 31, 32])
def test_pallas_matches_xla(k):
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 6, size=(16, 96)).astype(np.uint8)  # incl. invalid
    want = np.asarray(kmer_window_hashes(codes, k))
    got = np.asarray(kmer_window_hashes_pallas(codes, k, interpret=True))
    assert np.array_equal(got, want)


def test_pallas_rejects_large_k():
    with pytest.raises(ValueError):
        kmer_window_hashes_pallas(np.zeros((2, 64), np.uint8), 33, interpret=True)


@pytest.mark.parametrize("length", [1, 7, 8, 12, 15, 16, 17, 24, 31, 32])
def test_u64pair_murmur_matches_golden(length):
    import jax.numpy as jnp

    rng = np.random.default_rng(length)
    data = rng.integers(0, 256, size=length).astype(np.uint8).tobytes()
    want, _ = murmur3_x64_128_np(data, 42)
    nw = (length + 15) // 16 * 2
    words = np.frombuffer(data + b"\0" * (nw * 8 - length), dtype="<u8")
    pairs = [
        (jnp.full((3,), np.uint32(w & 0xFFFFFFFF)), jnp.full((3,), np.uint32(w >> 32)))
        for w in words
    ]
    lo, hi = up.murmur3_x64_128_h1(pairs, length, 42)
    got = (int(np.asarray(hi)[0]) << 32) | int(np.asarray(lo)[0])
    assert got == want


def test_u64pair_primitives():
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    a = rng.integers(0, 2**64, size=64, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=64, dtype=np.uint64)
    alo, ahi = (a & 0xFFFFFFFF).astype(np.uint32), (a >> 32).astype(np.uint32)
    blo, bhi = (b & 0xFFFFFFFF).astype(np.uint32), (b >> 32).astype(np.uint32)
    j = jnp.asarray

    lo, hi = up.add64(j(alo), j(ahi), j(blo), j(bhi))
    want = a + b
    assert np.array_equal(np.asarray(lo), (want & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    assert np.array_equal(np.asarray(hi), (want >> np.uint64(32)).astype(np.uint32))

    lo, hi = up.mul64(j(alo), j(ahi), j(blo), j(bhi))
    want = a * b
    assert np.array_equal(np.asarray(lo), (want & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    assert np.array_equal(np.asarray(hi), (want >> np.uint64(32)).astype(np.uint32))

    for r in (1, 13, 31, 32, 33, 47, 63):
        lo, hi = up.rotl64(j(alo), j(ahi), r)
        want = (a << np.uint64(r)) | (a >> np.uint64(64 - r))
        got = np.asarray(lo).astype(np.uint64) | (np.asarray(hi).astype(np.uint64) << np.uint64(32))
        assert np.array_equal(got, want), f"rotl {r}"
        lo, hi = up.shr64(j(alo), j(ahi), r)
        got = np.asarray(lo).astype(np.uint64) | (np.asarray(hi).astype(np.uint64) << np.uint64(32))
        assert np.array_equal(got, a >> np.uint64(r)), f"shr {r}"
        lo, hi = up.shl64(j(alo), j(ahi), r)
        got = np.asarray(lo).astype(np.uint64) | (np.asarray(hi).astype(np.uint64) << np.uint64(32))
        assert np.array_equal(got, a << np.uint64(r)), f"shl {r}"

    assert np.array_equal(np.asarray(up.ult32(j(alo), j(blo))), alo < blo)
    assert np.array_equal(np.asarray(up.ule32(j(alo), j(blo))), alo <= blo)


def test_pair_classify_path_matches_u64_path():
    """The all-u32 pair pipeline (Pallas pair hash -> pair lookup) must be
    bit-identical to the u64 packed2 path (interpret mode on CPU)."""
    import numpy as np
    import jax.numpy as jnp

    from rkmh_tpu.classify import engine
    from rkmh_tpu.ops.lookup import build_panel_table
    from rkmh_tpu.utils import to_host

    rng = np.random.default_rng(9)
    read_codes = rng.integers(0, 3, size=(16, 64)).astype(np.uint8)
    read_codes[2, 20:30] = 255           # invalid stretch
    read_codes[7] = read_codes[1]        # duplicate read
    ref_codes = rng.integers(0, 3, size=(4, 200)).astype(np.uint8)

    ks, s = (10,), 500
    ref_sk, ref_lens = engine.sketch_batch(ref_codes, ks, s)
    panel = build_panel_table(np.asarray(ref_sk), np.asarray(ref_lens))
    table = jnp.asarray(panel.table)

    want = to_host(engine.classify_codes_table_packed2(
        read_codes, table, ks=ks, sketch_size=s,
        num_refs=panel.num_refs, min_diff=0, min_matches=3,
    ))
    got = to_host(engine.classify_codes_table_packed2_pair(
        read_codes, table, ks=ks, sketch_size=s,
        num_refs=panel.num_refs, min_diff=0, min_matches=3,
        interpret=True,
    ))
    assert np.array_equal(np.asarray(got), np.asarray(want))
