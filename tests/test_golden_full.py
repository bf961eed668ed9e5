"""Full-dataset golden + accuracy runs — the five canonical BASELINE.md
configs, end to end on the complete bundled data (no subsetting):

1. zika classify: 60 refs x all 1000 z1.fq reads, every output line
   verified against an independent host-side oracle recomputation
   (scalar murmur + numpy multiset intersections).
2. hpv16 on all 25 real minION reads at k=18 (the published config),
   piped through score_real_classification; accuracy-level asserts on
   the type step plus a checked-in golden output (tests/golden/).
3. filter on all of minION25.fq vs hpv_16.fa, expected record bytes
   rebuilt from the scalar oracle.
4. stream -M/-I on the full zika data, verified against an oracle
   recomputation including the lossy counter tables.
5. call on hpv_16.fa + all 25 minION reads vs the scalar call oracle.

These are the "full-config" proofs that the subset parity tests
extrapolate to the real workloads (reference accuracy claims:
/root/reference/README.md:142-143).
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from rkmh_tpu import oracle
from rkmh_tpu.io.fastx import read_fastx

DATA = "/root/reference/data"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.slow


def _uniq_counts(vals):
    u, c = np.unique(np.asarray(vals, dtype=np.uint64), return_counts=True)
    return u, c


def _ms_isect(a, b):
    """Multiset intersection size of two (vals, counts) unique pairs."""
    av, ac = a
    bv, bc = b
    if not len(av) or not len(bv):
        return 0
    idx = np.clip(np.searchsorted(bv, av), 0, len(bv) - 1)
    hit = bv[idx] == av
    return int(np.minimum(ac[hit], bc[idx[hit]]).sum())


def _oracle_stream_lines(ref_recs, read_recs, ks, s, read_hash_fn=None,
                         ref_sketch_fn=None):
    """Expected stream output, vectorized enough to run on full datasets."""
    if ref_sketch_fn is None:
        ref_sketch_fn = lambda r: oracle.minhashes(
            oracle.calc_hashes(r.seq, list(ks)), s
        )
    if read_hash_fn is None:
        read_hash_fn = lambda r: oracle.calc_hashes(r.seq, list(ks))
    ref_sk = [_uniq_counts(ref_sketch_fn(r)) for r in ref_recs]
    lines = []
    for rec in read_recs:
        mins = oracle.minhashes(read_hash_fn(rec), s)
        a = _uniq_counts(mins)
        max_shared, max_id = -1, 0
        for j, b in enumerate(ref_sk):
            c = _ms_isect(a, b)
            if c > max_shared:
                max_shared, max_id = c, j
        lines.append(
            f"{ref_recs[max_id].name}\t{rec.name}\t{max_shared}\t{s}\t\t\n"
        )
    return "".join(lines)


def _golden_check(name: str, text: str):
    """Compare against (or with RKMH_TPU_REGEN_GOLDEN=1, regenerate) the
    checked-in golden output."""
    path = os.path.join(GOLDEN, name)
    if os.environ.get("RKMH_TPU_REGEN_GOLDEN") == "1":
        os.makedirs(GOLDEN, exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
        return
    with open(path) as f:
        assert f.read() == text, f"output drifted from golden {name}"


# ---------------------------------------------------------------------------
# 1. full zika classify (60 refs x 1000 reads) vs oracle
# ---------------------------------------------------------------------------


def test_full_zika_classify_vs_oracle():
    from rkmh_tpu.commands.stream import StreamConfig, run

    refs = read_fastx(f"{DATA}/zika.refs.fa")
    reads = read_fastx(f"{DATA}/z1.fq")
    assert len(refs) == 60 and len(reads) == 1000

    buf = io.StringIO()
    run(StreamConfig(ref_files=[f"{DATA}/zika.refs.fa"],
                     read_files=[f"{DATA}/z1.fq"],
                     ks=(12,), sketch_size=1000), out=buf)
    got = buf.getvalue()
    assert got.count("\n") == 1000

    expected = _oracle_stream_lines(refs, reads, (12,), 1000)
    assert got == expected
    _golden_check("zika_classify_k12_s1000.txt", got)


# ---------------------------------------------------------------------------
# 2. hpv16 k=18 on all real minION reads + score_real_classification
# ---------------------------------------------------------------------------


def test_full_hpv16_minion_k18_accuracy(tmp_path, monkeypatch):
    from rkmh_tpu.commands.hpv16_cmd import Hpv16Config, run
    from rkmh_tpu.scripts import score_real_classification as score

    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    rc = run(Hpv16Config(read_files=[f"{DATA}/minION25.fq"], refpath=DATA,
                         ks=(18,), sketch_size=4000), out=buf)
    assert rc == 0
    text = buf.getvalue()
    lines = text.splitlines()
    assert len(lines) == 25

    # accuracy: these are real HPV16 nanopore reads — the 182-genome type
    # step must call HPV16 for (almost) all of them (README.md:142-143
    # claims ~97% read-level accuracy on this kind of data)
    types = [l.split("\t")[1] for l in lines]
    hpv16_frac = sum("HPV16" in t for t in types) / len(types)
    assert hpv16_frac >= 0.96, types

    # sample-level scoring pipeline runs and produces a summary line
    out = io.StringIO()
    err = io.StringIO()
    rc = score.main([], stdin=io.StringIO(text), stdout=out, stderr=err)
    assert rc == 0
    summary = out.getvalue()
    assert "WARN:low_" in summary  # 25 reads is far below the 1000 floor
    # the sample-level call is deterministic: this 25-read minION sample
    # scores C-dominant (C1) with an A (A1) minority at k=18
    assert summary.startswith("C:0.69"), summary
    assert "C1:" in summary and "A1:" in summary

    _golden_check("hpv16_minion25_k18.txt", text)


# ---------------------------------------------------------------------------
# 3. filter on all of minION25.fq vs oracle
# ---------------------------------------------------------------------------


def test_full_filter_minion_vs_oracle():
    from rkmh_tpu.commands.filter_cmd import FilterConfig, run

    k, s, min_matches = 16, 1000, 25
    refs = read_fastx(f"{DATA}/hpv_16.fa")
    reads = read_fastx(f"{DATA}/minION25.fq")
    assert len(reads) == 25

    buf = io.StringIO()
    run(FilterConfig(ref_files=[f"{DATA}/hpv_16.fa"],
                     read_files=[f"{DATA}/minION25.fq"],
                     ks=(k,), sketch_size=s, min_matches=min_matches), out=buf)
    got = buf.getvalue()

    # oracle: filter keep-set + exact 4-line record bytes (rkmh.cpp:1298-1310
    # layout: '>' header + seq + '+' + qual)
    ref_sk = [_uniq_counts(oracle.minhashes(oracle.calc_hashes(r.seq, [k]), s))
              for r in refs]
    expected = []
    kept = 0
    for rec in reads:
        mins = oracle.minhashes(oracle.calc_hashes(rec.seq, [k]), s)
        a = _uniq_counts(mins)
        shared = [_ms_isect(a, b) for b in ref_sk]
        # equiv.hpp:324-353: running max starts at 0
        mx = max(shared)
        keep = (len(mins) > 0) and (mx >= min_matches) and (mx - 0 > 0)
        if keep:
            kept += 1
            expected.append(
                f">{rec.name}\n{rec.seq.decode()}\n+\n{(rec.qual or b'').decode()}\n"
            )
    assert got == "".join(expected)
    _golden_check("filter_minion25_hpv16_k16_N25.fq", got)
    # the high-accuracy 2D nanopore reads survive N=25 against the HPV16
    # genome (1D template/complement reads are too noisy at k=16 — the
    # exact filtering behavior the reference was built for)
    assert kept == 10, kept
    kept_names = [e.split("\n")[0] for e in expected]
    assert sum(n.endswith("_2d") for n in kept_names) >= 8


# ---------------------------------------------------------------------------
# 4. stream -M / -I on the full zika data vs oracle (lossy counters)
# ---------------------------------------------------------------------------


def test_full_stream_M_I_vs_oracle():
    from rkmh_tpu.commands.stream import StreamConfig, run

    ks, s, M, I, C = (12,), 1000, 2, 40, 1 << 22
    refs = read_fastx(f"{DATA}/zika.refs.fa")
    reads = read_fastx(f"{DATA}/z1.fq")

    buf = io.StringIO()
    run(StreamConfig(ref_files=[f"{DATA}/zika.refs.fa"],
                     read_files=[f"{DATA}/z1.fq"],
                     ks=ks, sketch_size=s, min_kmer_occ=M, max_samples=I,
                     counter_size=C), out=buf)
    got = buf.getvalue()
    assert got.count("\n") == 1000

    # counters (lossy hash % C), exactly as rkmh builds them:
    # ref counter over every ref-kmer occurrence (rkmh.cpp:828-837),
    # read counter over every read-kmer occurrence (rkmh.cpp:903-910)
    ref_hashes = [oracle.calc_hashes(r.seq, list(ks)) for r in refs]
    read_hashes = [oracle.calc_hashes(r.seq, list(ks)) for r in reads]
    ref_tab = np.zeros(C, np.int64)
    np.add.at(ref_tab, np.concatenate([np.asarray(h, np.uint64) for h in ref_hashes]).astype(np.int64) % C, 1)
    read_tab = np.zeros(C, np.int64)
    np.add.at(read_tab, np.concatenate([np.asarray(h, np.uint64) for h in read_hashes]).astype(np.int64) % C, 1)

    ref_i = iter(ref_hashes)
    read_i = iter(read_hashes)
    expected = _oracle_stream_lines(
        refs, reads, ks, s,
        ref_sketch_fn=lambda r: oracle.minhashes(
            [h if 0 <= ref_tab[h % C] <= I else 0 for h in next(ref_i)], s
        ),
        read_hash_fn=lambda r: [
            h if read_tab[h % C] >= M else 0 for h in next(read_i)
        ],
    )
    assert got == expected
    _golden_check("stream_zika_M2_I40_k12.txt", got)


# ---------------------------------------------------------------------------
# 5. call on hpv_16.fa + all 25 minION reads vs the scalar call oracle
# ---------------------------------------------------------------------------


def test_hpv16_sorted_panel_fallback_matches_golden(tmp_path, monkeypatch):
    """Force the over-budget sorted-panel fallback
    (RKMH_TPU_SET_TABLE_MAX_MB=1) on a minION25 subset: per-read output
    must be byte-identical to the bucket-table golden.  hpv16 lines are
    per-read independent (no -M), so the first-6-reads slice of the
    golden is the exact expectation."""
    from rkmh_tpu.commands.hpv16_cmd import Hpv16Config, run

    reads = read_fastx(f"{DATA}/minION25.fq")[:6]
    sub = tmp_path / "m6.fq"
    with open(sub, "w") as fh:
        for r in reads:
            fh.write(f"@{r.name}\n{r.seq.decode()}\n+\n"
                     f"{(r.qual or b'I' * len(r.seq)).decode()}\n")

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("RKMH_TPU_SET_TABLE_MAX_MB", "1")
    buf = io.StringIO()
    rc = run(Hpv16Config(read_files=[str(sub)], refpath=DATA,
                         ks=(18,), sketch_size=4000), out=buf)
    assert rc == 0
    with open(os.path.join(GOLDEN, "hpv16_minion25_k18.txt")) as fh:
        want = "".join([next(fh) for _ in range(6)])
    assert buf.getvalue() == want


def test_full_call_hpv16_minion_vs_oracle():
    from rkmh_tpu.commands.call_cmd import CallConfig, run

    k, w = 16, 100
    ref = read_fastx(f"{DATA}/hpv_16.fa")[0]
    reads = read_fastx(f"{DATA}/minION25.fq")

    buf = io.StringIO()
    run(CallConfig(ref_files=[f"{DATA}/hpv_16.fa"],
                   read_files=[f"{DATA}/minION25.fq"],
                   ks=(k,), window_len=w), out=buf)
    got = buf.getvalue()

    depth = oracle.read_depth_map([r.seq for r in reads], k)
    calls, _rows = oracle.call_variants(ref.name, ref.seq, depth, k, w)

    body = [l for l in got.splitlines() if l and not l.startswith("#")]
    assert len(body) == len(calls), (len(body), len(calls))
    got_keys = {"\t".join(l.split("\t")[:5]) for l in body}
    assert got_keys == set(calls)
    # VCF shape: QUAL 99 / PASS / KC= info on every record (rkmh.cpp:1885-88)
    for l in body:
        f = l.split("\t")
        assert f[5] == "99" and f[6] == "PASS" and f[7].startswith("KC=")
    # real variation exists between these reads and the reference genome
    assert len(body) > 0
    _golden_check("call_hpv16_minion25_k16_w100.vcf", got)
