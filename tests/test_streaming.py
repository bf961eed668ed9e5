"""Constant-memory streaming: chunked native parser + incremental stream
output (the KSEQ_Reader / bufsize-1000 capability of rkmh.cpp:950-959 and
the constant-memory claim of the reference README.md:53-72).

Checks: (1) the native chunked parser is record-identical to the Python
oracle parser across chunk boundaries (FASTQ, gzip, multi-line FASTA);
(2) `stream` output is byte-identical whether the input is one chunk or
many; (3) output buffering stays bounded (lines are emitted per completed
chunk, not held to the end); (4) [slow] a subprocess RSS ceiling on a
synthetic input much larger than the streaming window.
"""

import io
import os
import random
import subprocess
import sys

import pytest

from rkmh_tpu.io.fastx import read_fastx
from rkmh_tpu.commands.common import iter_packed_chunks

DATA = "/root/reference/data"


def _write_synth_fastq(path, n, minlen=40, maxlen=400, seed=7, alphabet="ACGTNacgtn"):
    rng = random.Random(seed)
    with open(path, "w") as f:
        for i in range(n):
            L = rng.randint(minlen, maxlen)
            seq = "".join(rng.choice(alphabet) for _ in range(L))
            qual = "".join(chr(33 + rng.randrange(40)) for _ in range(L))
            f.write(f"@r{i} desc {i}\n{seq}\n+\n{qual}\n")


def _collect_chunks(paths, chunk_reads):
    names, seqs, quals, lens = [], [], [], []
    nchunks = 0
    for c in iter_packed_chunks(paths, chunk_reads):
        assert len(c) <= chunk_reads
        names += list(c.names)
        seqs += list(c.seqs)
        quals += list(c.quals)
        lens += list(c.lens)
        nchunks += 1
    return names, seqs, quals, lens, nchunks


def test_chunked_parse_matches_oracle_fastq(tmp_path):
    p = str(tmp_path / "synth.fq")
    _write_synth_fastq(p, 997)
    oracle = read_fastx(p)
    names, seqs, quals, lens, nchunks = _collect_chunks([p], 101)
    assert nchunks == 10
    assert names == [r.name for r in oracle]
    assert seqs == [r.seq for r in oracle]
    assert quals == [r.qual for r in oracle]
    assert lens == [len(r.seq) for r in oracle]


def test_chunked_parse_matches_oracle_gzip(tmp_path):
    import gzip

    p = str(tmp_path / "synth.fq")
    _write_synth_fastq(p, 300, seed=9)
    gz = str(tmp_path / "synth.fq.gz")
    with open(p, "rb") as fi, gzip.open(gz, "wb") as fo:
        fo.write(fi.read())
    oracle = read_fastx(p)
    names, seqs, quals, _, _ = _collect_chunks([gz], 37)
    assert names == [r.name for r in oracle]
    assert seqs == [r.seq for r in oracle]
    assert quals == [r.qual for r in oracle]


def test_chunked_parse_matches_oracle_multiline_fasta(tmp_path):
    rng = random.Random(3)
    p = str(tmp_path / "synth.fa")
    with open(p, "w") as f:
        for i in range(120):
            L = rng.randint(1, 5000)
            seq = "".join(rng.choice("ACGT") for _ in range(L))
            body = "\n".join(seq[j : j + 70] for j in range(0, L, 70))
            f.write(f">ctg{i} d\n{body}\n")
    oracle = read_fastx(p)
    names, seqs, _, _, _ = _collect_chunks([p], 11)
    assert names == [r.name for r in oracle]
    assert seqs == [r.seq for r in oracle]


def test_chunked_parse_multi_file_order(tmp_path):
    a, b = str(tmp_path / "a.fq"), str(tmp_path / "b.fq")
    _write_synth_fastq(a, 53, seed=1)
    _write_synth_fastq(b, 47, seed=2)
    oracle = read_fastx(a) + read_fastx(b)
    names, _, _, _, _ = _collect_chunks([a, b], 20)
    assert names == [r.name for r in oracle]


def test_chunked_parse_fuzz_pathological_inputs(tmp_path):
    """Randomized pathological files (CRLF, blank lines, plus-less FASTQ
    records, empty sequences, mixed FASTA/FASTQ) must parse identically
    through the native chunked parser and the Python oracle, at several
    chunk sizes."""
    rng = random.Random(1234)
    for trial in range(6):
        parts = []
        n = rng.randint(1, 60)
        for i in range(n):
            kind = rng.choice(["fa", "fq", "fq_noplus"])
            L = rng.randint(0, 200)
            seq = "".join(rng.choice("ACGTNacgtnRYx") for _ in range(L))
            eol = rng.choice(["\n", "\r\n"])
            blank = rng.choice(["", eol])
            if kind == "fa":
                body = eol.join(seq[j : j + 13] for j in range(0, L, 13)) if L else ""
                parts.append(f">{kind}{trial}_{i} extra words{eol}{body}{eol}{blank}")
            elif kind == "fq":
                qual = "".join(chr(33 + rng.randrange(40)) for _ in range(L))
                parts.append(f"@{kind}{trial}_{i}{eol}{seq}{eol}+{eol}{qual}{eol}{blank}")
            else:
                # '@' record without the '+' line: next line is lookahead
                parts.append(f"@{kind}{trial}_{i}{eol}{seq}{eol}")
        p = str(tmp_path / f"fuzz{trial}.fx")
        with open(p, "w", newline="") as f:
            f.write("".join(parts))
        oracle = read_fastx(p)
        for chunk_reads in (1, 3, 10**9):
            names, seqs, quals, lens, _ = _collect_chunks([p], chunk_reads)
            assert names == [r.name for r in oracle], (trial, chunk_reads)
            assert seqs == [r.seq for r in oracle], (trial, chunk_reads)
            assert quals == [r.qual for r in oracle], (trial, chunk_reads)


def test_stream_chunked_output_byte_identical(tmp_path):
    from rkmh_tpu.commands.stream import StreamConfig, run

    refs = read_fastx(f"{DATA}/zika.refs.fa")[:5]
    rp = str(tmp_path / "refs.fa")
    with open(rp, "wb") as f:
        for r in refs:
            f.write(b">" + r.name.encode() + b"\n" + r.seq + b"\n")
    reads = read_fastx(f"{DATA}/z1.fq")[:300]
    fp = str(tmp_path / "reads.fq")
    with open(fp, "wb") as f:
        for r in reads:
            f.write(b"@" + r.name.encode() + b"\n" + r.seq + b"\n+\n"
                    + (r.qual or b"I" * len(r.seq)) + b"\n")

    def go(chunk_reads):
        buf = io.StringIO()
        run(StreamConfig(ref_files=[rp], read_files=[fp], ks=(12,),
                         sketch_size=200, batch_size=32,
                         chunk_reads=chunk_reads), out=buf)
        return buf.getvalue()

    whole = go(10**9)
    assert go(67) == whole
    assert whole.count("\n") == 300


def test_stream_output_buffering_bounded(tmp_path):
    """Lines must be written as chunks complete — peak buffered lines stays
    far below the input size (the round-1 implementation held all N)."""
    import rkmh_tpu.commands.stream as sm
    from rkmh_tpu.commands.stream import StreamConfig, run

    refs = read_fastx(f"{DATA}/zika.refs.fa")[:2]
    rp = str(tmp_path / "refs.fa")
    with open(rp, "wb") as f:
        for r in refs:
            f.write(b">" + r.name.encode() + b"\n" + r.seq + b"\n")
    fp = str(tmp_path / "many.fq")
    total = 8192
    _write_synth_fastq(fp, total, minlen=60, maxlen=120, alphabet="ACGT")

    buf = io.StringIO()
    run(StreamConfig(ref_files=[rp], read_files=[fp], ks=(12,), sketch_size=50,
                     batch_size=64, chunk_reads=256), out=buf)
    assert buf.getvalue().count("\n") == total
    # residency bound: the in-flight batch window plus ~2 chunks — grows
    # with the pipelining constants, never with the input size
    bound = (2 * sm.FETCH_GROUP + 1) * 64 + 2 * 256
    assert 0 < sm.last_peak_buffered_lines <= bound
    assert bound < total / 2


def test_hash_count_search_chunked_identical(tmp_path):
    """hash / count --dump / search output must not depend on the
    streaming window size."""
    import io as _io

    from rkmh_tpu.commands.hash_cmd import HashConfig, run as hash_run
    from rkmh_tpu.commands.count_cmd import CountConfig, run as count_run
    from rkmh_tpu.commands.search_cmd import SearchConfig, run as search_run

    fp = str(tmp_path / "reads.fq")
    _write_synth_fastq(fp, 157, minlen=30, maxlen=90, alphabet="ACGTN")

    def capture(fn, cfg):
        buf = _io.StringIO()
        fn(cfg, out=buf)
        return buf.getvalue()

    whole = capture(hash_run, HashConfig(read_files=[fp], ks=(12,), batch_size=32,
                                         chunk_reads=10**9))
    chunked = capture(hash_run, HashConfig(read_files=[fp], ks=(12,), batch_size=32,
                                           chunk_reads=13))
    assert chunked == whole and whole.count("\n") == 157

    whole = capture(count_run, CountConfig(read_files=[fp], ks=(12,), batch_size=32,
                                           counter_size=4096, dump=True,
                                           chunk_reads=10**9))
    chunked = capture(count_run, CountConfig(read_files=[fp], ks=(12,), batch_size=32,
                                             counter_size=4096, dump=True,
                                             chunk_reads=13))
    assert chunked == whole and whole

    # search: reference kmer list from the first read's kmers
    from rkmh_tpu.io.fastx import read_fastx as _rf

    first = _rf(fp)[0].seq.decode()
    kp = str(tmp_path / "kmers.txt")
    with open(kp, "w") as f:
        for j in range(0, max(1, len(first) - 12), 3):
            f.write(first[j : j + 12] + "\n")
    whole = capture(search_run, SearchConfig(ref_files=[kp], read_files=[fp],
                                             ks=(12,), chunk_reads=10**9))
    chunked = capture(search_run, SearchConfig(ref_files=[kp], read_files=[fp],
                                               ks=(12,), chunk_reads=13))
    assert chunked == whole and whole


def test_two_pass_commands_fifo_input_not_dropped(tmp_path):
    """-M commands read their input twice; non-seekable inputs (FIFOs,
    stdin) must be buffered for the second pass, not silently drained by
    the counter pass (the regression dropped every read)."""
    import threading

    from rkmh_tpu.commands.filter_cmd import FilterConfig, run as filter_run
    from rkmh_tpu.commands.stream import StreamConfig, run as stream_run

    refs = read_fastx(f"{DATA}/zika.refs.fa")[:2]
    rp = str(tmp_path / "refs.fa")
    with open(rp, "wb") as f:
        for r in refs:
            f.write(b">" + r.name.encode() + b"\n" + r.seq + b"\n")
    fp = str(tmp_path / "reads.fq")
    _write_synth_fastq(fp, 64, minlen=60, maxlen=100, alphabet="ACGT")
    payload = open(fp, "rb").read()

    def run_with_fifo(runner, make_cfg):
        fifo = str(tmp_path / f"pipe_{runner.__module__.split('.')[-1]}")
        if os.path.exists(fifo):
            os.unlink(fifo)
        os.mkfifo(fifo)
        t = threading.Thread(
            target=lambda: open(fifo, "wb").write(payload), daemon=True
        )
        t.start()
        buf = io.StringIO()
        runner(make_cfg(fifo), out=buf)
        t.join(timeout=30)
        return buf.getvalue()

    # stream -M from a FIFO == stream -M from the file
    file_out = io.StringIO()
    stream_run(StreamConfig(ref_files=[rp], read_files=[fp], ks=(12,),
                            sketch_size=50, min_kmer_occ=1,
                            counter_size=1 << 16, batch_size=32), out=file_out)
    fifo_out = run_with_fifo(
        stream_run,
        lambda fifo: StreamConfig(ref_files=[rp], read_files=[fifo], ks=(12,),
                                  sketch_size=50, min_kmer_occ=1,
                                  counter_size=1 << 16, batch_size=32),
    )
    assert fifo_out.count("\n") == 64
    assert fifo_out == file_out.getvalue()

    # filter -M from a FIFO == filter -M from the file
    file_out = io.StringIO()
    filter_run(FilterConfig(ref_files=[rp], read_files=[fp], ks=(12,),
                            sketch_size=50, min_kmer_occ=0,
                            counter_size=1 << 16, batch_size=32), out=file_out)
    fifo_out = run_with_fifo(
        filter_run,
        lambda fifo: FilterConfig(ref_files=[rp], read_files=[fifo], ks=(12,),
                                  sketch_size=50, min_kmer_occ=0,
                                  counter_size=1 << 16, batch_size=32),
    )
    assert fifo_out == file_out.getvalue()


@pytest.mark.slow
def test_stream_rss_bounded_subprocess(tmp_path):
    """Peak RSS of a chunked `stream` run stays a small constant over the
    interpreter baseline even when the input file is much larger than the
    streaming window (constant-memory claim, reference README.md:53-72)."""
    fp = str(tmp_path / "big.fq")
    _write_synth_fastq(fp, 250_000, minlen=180, maxlen=220, alphabet="ACGT")
    fsize = os.path.getsize(fp)
    assert fsize > 90 * 1024 * 1024  # the input really is big

    refs = read_fastx(f"{DATA}/zika.refs.fa")[:2]
    rp = str(tmp_path / "refs.fa")
    with open(rp, "wb") as f:
        for r in refs:
            f.write(b">" + r.name.encode() + b"\n" + r.seq + b"\n")

    prog = (
        "import resource, sys, io\n"
        "import rkmh_tpu\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss\n"
        "from rkmh_tpu.commands.stream import StreamConfig, run\n"
        f"cfg = StreamConfig(ref_files=[{rp!r}], read_files=[{fp!r}], ks=(12,),\n"
        "                   sketch_size=50, batch_size=4096, chunk_reads=16384)\n"
        "out = io.StringIO()\n"
        "run(cfg, out=out)\n"
        "assert out.getvalue().count('\\n') == 250_000\n"
        "peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss\n"
        "print((peak - base) // 1024)\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    grew_mb = int(r.stdout.strip().splitlines()[-1])
    # whole-file residency would add >= ~3x the file size (codes + blobs +
    # all output lines); the streamed run must stay well under one filesize
    assert grew_mb < fsize / 1024 / 1024, grew_mb


def test_panel_sketch_cache_roundtrip(tmp_path, monkeypatch):
    """The on-disk panel cache must produce byte-identical stream output
    on a hit, invalidate when parameters or ref bytes change, and stay
    off when RKMH_TPU_PANEL_CACHE=0."""
    from rkmh_tpu.commands.stream import StreamConfig, run

    refs = read_fastx(f"{DATA}/zika.refs.fa")[:4]
    rp = str(tmp_path / "refs.fa")
    with open(rp, "wb") as f:
        for r in refs:
            f.write(b">" + r.name.encode() + b"\n" + r.seq + b"\n")
    fp = str(tmp_path / "reads.fq")
    _write_synth_fastq(fp, 50, minlen=60, maxlen=90, alphabet="ACGT")

    cache = tmp_path / "panel_cache"
    monkeypatch.setenv("RKMH_TPU_PANEL_CACHE", str(cache))

    def go():
        buf = io.StringIO()
        run(StreamConfig(ref_files=[rp], read_files=[fp], ks=(12,),
                         sketch_size=100, batch_size=16), out=buf)
        return buf.getvalue()

    first = go()
    entries = list(cache.glob("*.npz"))
    assert len(entries) == 1  # panel was cached
    mtime = entries[0].stat().st_mtime_ns
    second = go()
    assert second == first
    assert entries[0].stat().st_mtime_ns == mtime  # hit, not rebuilt

    # different sketch size -> different key
    buf = io.StringIO()
    run(StreamConfig(ref_files=[rp], read_files=[fp], ks=(12,),
                     sketch_size=120, batch_size=16), out=buf)
    assert len(list(cache.glob("*.npz"))) == 2

    # changed ref bytes -> different key, and the new ref participates:
    # build it from the reads themselves so they classify to it
    read_seqs = [r.seq for r in read_fastx(fp)][:5]
    with open(rp, "ab") as f:
        f.write(b">extra\n" + b"".join(read_seqs) + b"\n")
    third = go()
    assert len(list(cache.glob("*.npz"))) == 3
    assert third != first
    assert "extra\t" in third

    # disabled -> no new entries
    monkeypatch.setenv("RKMH_TPU_PANEL_CACHE", "0")
    go()
    assert len(list(cache.glob("*.npz"))) == 3


def test_stream_resume_after_interruption(tmp_path):
    """Failure recovery: an interrupted `stream -o` run resumes by
    skipping already-emitted reads; the stitched output is byte-identical
    to an uninterrupted run, including with -M (whose counter pass must
    re-cover ALL reads) and with a torn final line."""
    from rkmh_tpu.commands.stream import StreamConfig, run

    refs = read_fastx(f"{DATA}/zika.refs.fa")[:3]
    rp = str(tmp_path / "refs.fa")
    with open(rp, "wb") as f:
        for r in refs:
            f.write(b">" + r.name.encode() + b"\n" + r.seq + b"\n")
    fp = str(tmp_path / "reads.fq")
    _write_synth_fastq(fp, 500, minlen=60, maxlen=90, alphabet="ACGT")

    def cfg(out_file="", resume=False, M=-1):
        return StreamConfig(ref_files=[rp], read_files=[fp], ks=(12,),
                            sketch_size=80, batch_size=32, chunk_reads=128,
                            min_kmer_occ=M, counter_size=1 << 16,
                            out_file=out_file, resume=resume)

    for M in (-1, 1):
        full = io.StringIO()
        run(cfg(M=M), out=full)
        full = full.getvalue()

        # simulate a crash: keep 173 complete lines plus a torn partial
        lines = full.splitlines(keepends=True)
        part = str(tmp_path / f"out{M}.txt")
        with open(part, "w") as f:
            f.write("".join(lines[:173]) + lines[173][: len(lines[173]) // 2])
        rc = run(cfg(out_file=part, resume=True, M=M))
        assert rc == 0
        assert open(part).read() == full, f"-M={M}"

    # resume on a COMPLETE file appends nothing
    done = str(tmp_path / "done.txt")
    with open(done, "w") as f:
        f.write(full)
    run(cfg(out_file=done, resume=True, M=1))
    assert open(done).read() == full


def test_stream_resume_after_injected_failure(tmp_path, monkeypatch):
    """End-to-end crash/recovery drill: RKMH_TPU_FAIL_AFTER_CHUNKS kills
    the pipeline mid-run (a real mid-emission crash, not a simulated
    truncation); --resume stitches the output byte-identically."""
    from rkmh_tpu.commands.stream import StreamConfig, run
    from rkmh_tpu.commands.recovery import InjectedFailure

    refs = read_fastx(f"{DATA}/zika.refs.fa")[:3]
    rp = str(tmp_path / "refs.fa")
    with open(rp, "wb") as f:
        for r in refs:
            f.write(b">" + r.name.encode() + b"\n" + r.seq + b"\n")
    fp = str(tmp_path / "reads.fq")
    _write_synth_fastq(fp, 400, minlen=60, maxlen=90, alphabet="ACGT")

    def cfg(out_file, resume=False):
        return StreamConfig(ref_files=[rp], read_files=[fp], ks=(12,),
                            sketch_size=80, batch_size=32, chunk_reads=100,
                            out_file=out_file, resume=resume)

    golden = str(tmp_path / "golden.txt")
    assert run(cfg(golden)) == 0
    full = open(golden).read()

    part = str(tmp_path / "part.txt")
    monkeypatch.setenv("RKMH_TPU_FAIL_AFTER_CHUNKS", "2")
    with pytest.raises(InjectedFailure):
        run(cfg(part))
    monkeypatch.delenv("RKMH_TPU_FAIL_AFTER_CHUNKS")
    crashed = open(part).read()
    assert 0 < len(crashed) < len(full)  # it really died mid-run

    assert run(cfg(part, resume=True)) == 0
    assert open(part).read() == full


def test_filter_resume_after_injected_failure(tmp_path, monkeypatch):
    """filter's output holds only PASSING reads, so recovery rides the
    .progress sidecar (reads consumed + output bytes per chunk): crash
    mid-run, resume, byte-identical — including with -M."""
    import numpy as np

    from rkmh_tpu.commands.filter_cmd import FilterConfig, run
    from rkmh_tpu.commands.recovery import InjectedFailure

    refs = read_fastx(f"{DATA}/zika.refs.fa")[:2]
    rp = str(tmp_path / "refs.fa")
    with open(rp, "wb") as f:
        for r in refs:
            f.write(b">" + r.name.encode() + b"\n" + r.seq + b"\n")
    # alternate real slices (pass) and random reads (fail) so the output
    # record count differs from the input read count
    rng = random.Random(5)
    fp = str(tmp_path / "reads.fq")
    with open(fp, "w") as f:
        for i in range(400):
            if i % 2 == 0:
                s = rng.randrange(0, len(refs[0].seq) - 150)
                seq = refs[0].seq[s : s + 150].decode()
            else:
                seq = "".join(rng.choice("ACGT") for _ in range(150))
            f.write(f"@q{i}\n{seq}\n+\n{'I' * 150}\n")

    def cfg(out_file="", resume=False, M=-1):
        return FilterConfig(ref_files=[rp], read_files=[fp], ks=(12,),
                            sketch_size=80, batch_size=32, chunk_reads=100,
                            min_kmer_occ=M, counter_size=1 << 16,
                            out_file=out_file, resume=resume)

    for M in (-1, 1):
        golden = str(tmp_path / f"golden{M}.fq")
        assert run(cfg(out_file=golden, M=M)) == 0
        full = open(golden, "rb").read()
        assert len(full) > 0  # the passing half actually passed

        part = str(tmp_path / f"part{M}.fq")
        monkeypatch.setenv("RKMH_TPU_FAIL_AFTER_CHUNKS", "2")
        with pytest.raises(InjectedFailure):
            run(cfg(out_file=part, M=M))
        monkeypatch.delenv("RKMH_TPU_FAIL_AFTER_CHUNKS")
        assert os.path.exists(part + ".progress")
        crashed = open(part, "rb").read()
        assert 0 < len(crashed) < len(full)

        assert run(cfg(out_file=part, resume=True, M=M)) == 0
        assert open(part, "rb").read() == full, f"-M={M}"

    # --resume with an output but no sidecar is refused (cannot infer the
    # input position from a filtered output)
    orphan = str(tmp_path / "orphan.fq")
    with open(orphan, "w") as f:
        f.write(">x\nACGT\n+\nIIII\n")
    assert run(cfg(out_file=orphan, resume=True)) == 1
    # --resume needs -o
    assert run(cfg(resume=True)) == 1
    # an output shorter than its sidecar claims was modified since the
    # run — refuse rather than zero-pad it back to the recorded size
    shrunk = str(tmp_path / "part-1.fq")   # from the M=-1 crash drill
    with open(shrunk, "r+b") as f:
        f.truncate(10)
    assert run(cfg(out_file=shrunk, resume=True)) == 1
