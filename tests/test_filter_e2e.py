"""End-to-end `filter` parity vs a scalar model of rkmh main_filter
(rkmh.cpp:996-1424 + equiv.hpp:324-353), on real minION long reads."""

import io

import numpy as np
import pytest

from rkmh_tpu import oracle
from rkmh_tpu.io.fastx import read_fastx
from rkmh_tpu.commands.filter_cmd import FilterConfig, run

DATA = "/root/reference/data"
CTR = 100003  # small counter for tests (lossy modulo, like the reference's)


def _ctr_add(ctr, h):
    ctr[h % CTR] = ctr.get(h % CTR, 0) + 1


def _ctr_get(ctr, h):
    return ctr.get(h % CTR, 0)


def oracle_filter(refs, reads, ks, s, min_diff=0, min_matches=-1,
                  min_kmer_occ=None, max_samples=None):
    ref_ctr, read_ctr = {}, {}
    ref_hashes = [oracle.calc_hashes(r.seq, list(ks)) for r in refs]
    if max_samples is not None:
        for h in ref_hashes:
            for v in set(h):  # per-sample distinct (rkmh.cpp:340-357)
                _ctr_add(ref_ctr, v)
    read_hashes = [oracle.calc_hashes(r.seq, list(ks)) for r in reads]
    if min_kmer_occ is not None:
        for h in read_hashes:
            for v in h:
                _ctr_add(read_ctr, v)

    ref_sk = []
    for h in ref_hashes:
        hs = sorted(h)
        if max_samples is not None:
            sk = [v for v in hs if v != 0 and _ctr_get(ref_ctr, v) <= max_samples][:s]
        else:
            sk = [v for v in hs if v != 0][:s]
        ref_sk.append(sk)

    out = []
    for rec, h in zip(reads, read_hashes):
        hs = sorted(h)
        if min_kmer_occ is not None:
            sk = [v for v in hs if v != 0 and _ctr_get(read_ctr, v) >= min_kmer_occ][:s]
        else:
            sk = [v for v in hs if v != 0][:s]
        max_shared, prev_best = 0, 0
        for rs in ref_sk:
            shared = oracle.intersection_size(sk, rs)
            if shared > max_shared:
                prev_best = max_shared
                max_shared = shared
        depth_fail = len(sk) <= 0
        match_fail = max_shared < min_matches
        diff_ok = (max_shared - prev_best) > min_diff
        if not depth_fail and not match_fail and diff_ok:
            qual = rec.qual if rec.qual is not None else b"I" * len(rec.seq)
            out.append(f">{rec.name}\n{rec.seq.decode()}\n+\n{qual.decode()}\n")
    return "".join(out)


@pytest.fixture(scope="module")
def minion_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("filter")
    reads = read_fastx(f"{DATA}/minION25.fq")[:8]
    refs = read_fastx(f"{DATA}/hpv_16.fa") + read_fastx(f"{DATA}/dengue.fa")
    rp, fp = str(tmp / "refs.fa"), str(tmp / "reads.fq")
    with open(rp, "wb") as f:
        for r in refs:
            f.write(b">" + r.name.encode() + b"\n" + r.seq + b"\n")
    with open(fp, "wb") as f:
        for r in reads:
            f.write(b"@" + r.name.encode() + b"\n" + r.seq + b"\n+\n"
                    + (r.qual or b"I" * len(r.seq)) + b"\n")
    return refs, reads, rp, fp


def test_filter_basic(minion_data):
    refs, reads, rp, fp = minion_data
    ks, s = (16,), 400
    expected = oracle_filter(refs, reads, ks, s, min_matches=5)
    buf = io.StringIO()
    run(FilterConfig(ref_files=[rp], read_files=[fp], ks=ks, sketch_size=s,
                     min_matches=5, batch_size=8), out=buf)
    assert buf.getvalue() == expected
    assert expected  # some reads must actually pass for the test to bite


def test_filter_with_read_depth(minion_data):
    refs, reads, rp, fp = minion_data
    ks, s = (16,), 300
    expected = oracle_filter(refs, reads, ks, s, min_matches=2, min_kmer_occ=2)
    buf = io.StringIO()
    run(FilterConfig(ref_files=[rp], read_files=[fp], ks=ks, sketch_size=s,
                     min_matches=2, min_kmer_occ=2, counter_size=CTR,
                     batch_size=8), out=buf)
    assert buf.getvalue() == expected


def test_filter_informative_refs(minion_data):
    refs, reads, rp, fp = minion_data
    ks, s = (16,), 300
    expected = oracle_filter(refs, reads, ks, s, min_matches=2, max_samples=1)
    buf = io.StringIO()
    run(FilterConfig(ref_files=[rp], read_files=[fp], ks=ks, sketch_size=s,
                     min_matches=2, max_samples=1, counter_size=CTR,
                     batch_size=8), out=buf)
    assert buf.getvalue() == expected


def test_filter_stream_mode(minion_data):
    refs, reads, rp, fp = minion_data
    ks, s = (16,), 200
    fq = b"".join(
        b"@" + r.name.encode() + b"\n" + r.seq + b"\n+\n"
        + (r.qual or b"I" * len(r.seq)) + b"\n"
        for r in reads
    )
    buf = io.StringIO()
    run(FilterConfig(ref_files=[rp], ks=ks, sketch_size=s, in_stream=True,
                     batch_size=8), out=buf, stdin=io.BytesIO(fq))
    lines = buf.getvalue().splitlines()
    assert len(lines) == len(reads)
    # verify the first line against the scalar model
    ref_sk = [oracle.minhashes(oracle.calc_hashes(r.seq, list(ks)), s) for r in refs]
    sk = oracle.minhashes(oracle.calc_hashes(reads[0].seq, list(ks)), s)
    best, max_shared, prev, tu = "", 0, 0, 0
    for r, rs in zip(refs, ref_sk):
        shared = oracle.intersection_size(sk, rs)
        if shared > max_shared:
            prev = max_shared
            max_shared = shared
            best = r.name
            tu = min(len(sk), len(rs))
    exp = (f"Sample: {reads[0].name}\tResult: {best}\t{max_shared}\t{tu}\t"
           f"{''}\t{''}\t{'' if (max_shared - prev) > 0 else 'FAIL:DIFF'}")
    assert lines[0] == exp


def test_filter_devices_parity(minion_data, capsys):
    """--devices N [--tp T] output is byte-identical to single-device;
    -M and a non-dividing --tp warn and fall back."""
    refs, reads, rp, fp = minion_data
    ks, s = (16,), 400
    expected = oracle_filter(refs, reads, ks, s, min_matches=5)
    base = dict(ref_files=[rp], read_files=[fp], ks=ks, sketch_size=s,
                min_matches=5, batch_size=8)

    buf = io.StringIO()
    run(FilterConfig(**base, devices=4, tp=2), out=buf)
    assert buf.getvalue() == expected

    buf = io.StringIO()
    run(FilterConfig(**base, devices=8), out=buf)
    assert buf.getvalue() == expected
    capsys.readouterr()

    # -M with a dp-divisible counter: the depth counter shards over dp
    # and the lookup fuses into the SPMD step — identical to single-device
    dep = oracle_filter(refs, reads, ks, 300, min_matches=2, min_kmer_occ=2)
    mbase = dict(ref_files=[rp], read_files=[fp], ks=ks, sketch_size=300,
                 min_matches=2, min_kmer_occ=2, batch_size=8)
    buf = io.StringIO()
    run(FilterConfig(**mbase, counter_size=100_000, devices=4), out=buf)
    sd = io.StringIO()
    run(FilterConfig(**mbase, counter_size=100_000), out=sd)
    assert buf.getvalue() == sd.getvalue()
    capsys.readouterr()
    # -M whose counter size does not split over dp: warn + fallback
    buf = io.StringIO()
    run(FilterConfig(**mbase, counter_size=100_003, devices=4), out=buf)
    assert buf.getvalue() == dep
    assert "not divisible" in capsys.readouterr().err

    # tp does not divide the 2-ref panel: warn + fallback
    buf = io.StringIO()
    run(FilterConfig(**base, devices=6, tp=3), out=buf)
    assert buf.getvalue() == expected
    assert "does not divide" in capsys.readouterr().err


def test_filter_devices_stream_mode(minion_data):
    """--devices also covers the -i STDIN path (same classify closure)."""
    refs, reads, rp, fp = minion_data
    ks, s = (16,), 400
    with open(fp, "rb") as fh:
        payload = fh.read()
    single, sharded = io.StringIO(), io.StringIO()
    run(FilterConfig(ref_files=[rp], ks=ks, sketch_size=s, in_stream=True,
                     min_matches=5, batch_size=8),
        out=single, stdin=io.BytesIO(payload))
    run(FilterConfig(ref_files=[rp], ks=ks, sketch_size=s, in_stream=True,
                     min_matches=5, batch_size=8, devices=4, tp=2),
        out=sharded, stdin=io.BytesIO(payload))
    assert sharded.getvalue() == single.getvalue()
    assert "Sample:" in single.getvalue()
