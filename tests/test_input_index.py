"""Input-index cache (io/input_index.py) + the indexed seek path of the
distributed batch iterator: the index must be invisible in the output
(indexed iteration bit-identical to the full-reparse fallback for any
geometry) and must never write next to the input (read-only data dirs).
The reference has no analog — it buffers all input in memory
(rkmh.cpp:783-788)."""

import gzip
import os
import random

import numpy as np
import pytest

from rkmh_tpu.commands.dist_stream import _iter_owned_batches
from rkmh_tpu.io import input_index
from rkmh_tpu.io.native import load as native_load

pytestmark = pytest.mark.skipif(
    native_load() is None, reason="native io library unavailable")


def _write_fastq(path, n, seed=0, minlen=5, maxlen=300):
    rng = random.Random(seed)
    recs = []
    with open(path, "w") as fh:
        for i in range(n):
            seq = "".join(rng.choice("ACGTN") for _ in range(
                rng.randrange(minlen, maxlen)))
            fh.write(f"@r{seed}_{i} extra meta\n{seq}\n+\n{'I' * len(seq)}\n")
            recs.append(seq)
    return recs


@pytest.fixture(autouse=True)
def _cache_in_tmp(tmp_path, monkeypatch):
    # isolate the index cache per test (and prove the env override works)
    monkeypatch.setenv("RKMH_TPU_INPUT_INDEX", str(tmp_path / "idxcache"))


def test_scan_or_index_counts_offsets_and_caches(tmp_path, monkeypatch):
    p = str(tmp_path / "reads.fq")
    seqs = _write_fastq(p, 23, seed=1)
    n, maxlen, index = input_index.scan_or_index([p], chunk_reads=5)
    assert n == 23 and maxlen == max(len(s) for s in seqs)
    (entry,) = index
    assert entry is not None
    offs, lens = entry
    assert list(lens) == [len(s) for s in seqs]
    raw = open(p, "rb").read()
    assert all(raw[o : o + 1] == b"@" for o in offs)  # record starts
    assert os.path.exists(input_index.index_path(p))
    # nothing was written next to the input (read-only data dirs)
    assert sorted(os.listdir(tmp_path)) == ["idxcache", "reads.fq"]

    # second scan answers from the cache: parsing must not happen at all
    import rkmh_tpu.commands.common as common

    def boom(*a, **k):
        raise AssertionError("reparsed despite a fresh index entry")

    monkeypatch.setattr(common, "iter_packed_chunks", boom)
    n2, maxlen2, index2 = input_index.scan_or_index([p], chunk_reads=5)
    assert (n2, maxlen2) == (n, maxlen)
    np.testing.assert_array_equal(index2[0][0], offs)
    np.testing.assert_array_equal(index2[0][1], lens)


def test_stale_entry_is_rebuilt(tmp_path):
    p = str(tmp_path / "reads.fq")
    _write_fastq(p, 7, seed=2)
    input_index.scan_or_index([p], chunk_reads=64)
    assert input_index.load_index(p) is not None
    _write_fastq(p, 9, seed=3)  # rewrite: size/mtime fingerprint changes
    assert input_index.load_index(p) is None
    n, _, index = input_index.scan_or_index([p], chunk_reads=64)
    assert n == 9 and len(index[0][1]) == 9


def test_same_size_mtime_preserving_swap_invalidates(tmp_path):
    """A `cp -p`-style replacement that keeps size AND mtime must still
    invalidate the entry (the content sample catches it) — a stale index
    would silently seek to the wrong records."""
    p = str(tmp_path / "reads.fq")
    _write_fastq(p, 7, seed=20)
    input_index.scan_or_index([p], chunk_reads=64)
    assert input_index.load_index(p) is not None
    st = os.stat(p)
    data = bytearray(open(p, "rb").read())
    # flip one sequence base in place: same byte count, restored mtime
    at = data.index(b"\n") + 1
    data[at] = ord("A") if data[at] != ord("A") else ord("C")
    with open(p, "wb") as fh:
        fh.write(bytes(data))
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    st2 = os.stat(p)
    assert (st2.st_size, st2.st_mtime_ns) == (st.st_size, st.st_mtime_ns)
    assert input_index.load_index(p) is None


def test_gc_drops_dead_entries_past_cap(tmp_path, monkeypatch):
    """Entries for deleted inputs (tmp files from tests/one-off runs) are
    collected once the cache exceeds the cap; live entries survive."""
    monkeypatch.setenv("RKMH_TPU_INPUT_INDEX_MAX", "3")
    keep = []
    for i in range(2):
        p = str(tmp_path / f"live{i}.fq")
        _write_fastq(p, 3, seed=30 + i)
        input_index.scan_or_index([p], chunk_reads=64)
        keep.append(p)
    dead = str(tmp_path / "dead.fq")
    _write_fastq(dead, 3, seed=40)
    input_index.scan_or_index([dead], chunk_reads=64)
    dead_idx = input_index.index_path(dead)
    assert os.path.exists(dead_idx)
    os.remove(dead)
    # one more save trips the GC (4 entries > cap 3): the dead entry goes
    # and the remaining 3 live ones (within the cap) all survive
    p = str(tmp_path / "trigger.fq")
    _write_fastq(p, 3, seed=41)
    input_index.scan_or_index([p], chunk_reads=64)
    assert not os.path.exists(dead_idx)
    for kp in keep + [p]:
        assert input_index.load_index(kp) is not None


def test_gzip_inputs_fall_back_unindexed(tmp_path):
    p = str(tmp_path / "reads.fq")
    _write_fastq(p, 11, seed=4)
    gz = str(tmp_path / "reads.fq.gz")
    with open(p, "rb") as fi, gzip.open(gz, "wb") as fo:
        fo.write(fi.read())
    assert not input_index.is_indexable(gz)
    n, maxlen, index = input_index.scan_or_index([gz], chunk_reads=4)
    assert n == 11 and index == [None]


def test_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("RKMH_TPU_INPUT_INDEX", "0")
    p = str(tmp_path / "reads.fq")
    _write_fastq(p, 5, seed=5)
    n, _, index = input_index.scan_or_index([p], chunk_reads=64)
    assert n == 5 and index == [None]


@pytest.mark.parametrize("with_records", [False, True])
def test_indexed_iter_bit_identical_to_reparse(tmp_path, with_records):
    """Every (batch, codes, lens, names[, recs]) of the seek path equals
    the full-reparse fallback — multiple files, every rank of H=1/2/3,
    trailing pad batches, tiny chunk windows."""
    p1 = str(tmp_path / "a.fq")
    p2 = str(tmp_path / "b.fq")
    _write_fastq(p1, 17, seed=6)
    _write_fastq(p2, 8, seed=7)
    files = [p1, p2]
    N, maxlen, index = input_index.scan_or_index(files, chunk_reads=6)
    assert N == 25 and all(e is not None for e in index)
    from rkmh_tpu.io.packing import bucket_length

    L = bucket_length(maxlen)
    for H in (1, 2, 3):
        B = 6 * H
        Bl = B // H
        for rank in range(H):
            ref = list(_iter_owned_batches(
                files, 6, N, B, Bl, rank, L, with_records=with_records))
            got = list(_iter_owned_batches(
                files, 6, N, B, Bl, rank, L, with_records=with_records,
                index=index))
            assert len(got) == len(ref) == -(-N // B)
            for rt, gt in zip(ref, got):
                assert gt[0] == rt[0]
                np.testing.assert_array_equal(gt[1], rt[1])
                np.testing.assert_array_equal(gt[2], rt[2])
                assert gt[3] == rt[3]
                if with_records:
                    assert gt[4] == rt[4]


def test_indexed_iter_start_batch_skips_exactly(tmp_path):
    p = str(tmp_path / "a.fq")
    _write_fastq(p, 29, seed=8)
    N, maxlen, index = input_index.scan_or_index([p], chunk_reads=64)
    from rkmh_tpu.io.packing import bucket_length

    L = bucket_length(maxlen)
    B, Bl, rank = 8, 4, 1
    full = list(_iter_owned_batches([p], 64, N, B, Bl, rank, L, index=index))
    tail = list(_iter_owned_batches([p], 64, N, B, Bl, rank, L, index=index,
                                    start_batch=2))
    assert len(tail) == len(full) - 2
    for ft, tt in zip(full[2:], tail):
        assert tt[0] == ft[0]
        np.testing.assert_array_equal(tt[1], ft[1])
        np.testing.assert_array_equal(tt[2], ft[2])
        assert tt[3] == ft[3]
    # the reparse fallback honors start_batch too (parses, doesn't yield)
    tail2 = list(_iter_owned_batches([p], 64, N, B, Bl, rank, L,
                                     start_batch=2))
    assert [t[0] for t in tail2] == [t[0] for t in tail]
    for ft, tt in zip(tail, tail2):
        np.testing.assert_array_equal(tt[1], ft[1])
        assert tt[3] == ft[3]


def test_indexed_iter_detects_changed_input(tmp_path):
    p = str(tmp_path / "a.fq")
    _write_fastq(p, 12, seed=9)
    N, maxlen, index = input_index.scan_or_index([p], chunk_reads=64)
    from rkmh_tpu.io.packing import bucket_length

    L = bucket_length(maxlen)
    # truncate the file AFTER indexing: the seek path must refuse loudly
    with open(p, "w") as fh:
        fh.write("@only\nACGT\n+\nIIII\n")
    with pytest.raises(RuntimeError, match="changed under its input index"):
        list(_iter_owned_batches([p], 64, N, 4, 4, 0, L, index=index))
