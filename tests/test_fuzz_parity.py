"""Randomized end-to-end parity fuzz: device pipeline vs scalar oracle.

Stresses the corners individual tests can miss together: non-ACGT bases
(0-sentinel windows), repeat-rich sequences (duplicate hashes in
sketches, multiset intersection), tiny sketches (tie-breaks), reads
shorter than k, and multi-k concatenation.
"""

import io

import numpy as np
import pytest

from rkmh_tpu import oracle
from rkmh_tpu.commands.stream import StreamConfig, run


def _rand_seq(rng, n, with_n=True):
    alphabet = list(b"ACGTN") if with_n else list(b"ACGT")
    probs = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    return bytes(rng.choice(alphabet, size=n, p=probs).tolist())


def _repeat_rich(rng, n):
    unit = _rand_seq(rng, max(8, n // 6), with_n=False)
    s = (unit * (n // len(unit) + 1))[:n]
    return s


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stream_fuzz_matches_oracle(tmp_path, seed):
    rng = np.random.default_rng(seed)
    ks = (7, 11) if seed % 2 else (9,)
    s = int(rng.integers(4, 40))

    refs = []
    for i in range(int(rng.integers(2, 9))):
        n = int(rng.integers(60, 400))
        seq = _repeat_rich(rng, n) if i % 2 else _rand_seq(rng, n)
        refs.append((f"ref{i}", seq))
    reads = []
    for i in range(24):
        n = int(rng.integers(3, 120))  # includes reads shorter than k
        seq = _repeat_rich(rng, n) if i % 3 == 0 else _rand_seq(rng, n)
        reads.append((f"read{i}", seq))

    rp = tmp_path / "refs.fa"
    rp.write_text("".join(f">{n}\n{s.decode()}\n" for n, s in refs))
    fp = tmp_path / "reads.fq"
    fp.write_text(
        "".join(f"@{n}\n{s.decode()}\n+\n{'I' * len(s)}\n" for n, s in reads)
    )

    # oracle expectation (stream semantics)
    ref_sk = [oracle.minhashes(oracle.calc_hashes(sq, list(ks)), s) for _, sq in refs]
    lines = []
    for name, sq in reads:
        mins = oracle.minhashes(oracle.calc_hashes(sq, list(ks)), s)
        shared = [oracle.intersection_size(mins, r) for r in ref_sk]
        mx, mi = -1, 0
        for j, c in enumerate(shared):
            if c > mx:
                mx, mi = c, j
        lines.append(f"{refs[mi][0]}\t{name}\t{mx}\t{s}\t\t\n")
    expected = "".join(lines)

    buf = io.StringIO()
    run(
        StreamConfig(ref_files=[str(rp)], read_files=[str(fp)], ks=ks,
                     sketch_size=s, batch_size=8),
        out=buf,
    )
    assert buf.getvalue() == expected


@pytest.mark.parametrize("seed", [3, 4])
def test_filter_fuzz_matches_oracle(tmp_path, seed):
    """filter file mode: keep decisions vs the filter-flavor oracle scan
    (running max starts at 0, unmatched reads dropped)."""
    from rkmh_tpu.commands.filter_cmd import FilterConfig, run as run_filter

    rng = np.random.default_rng(seed)
    ks = (8,)
    s = int(rng.integers(8, 30))
    min_matches = int(rng.integers(1, 4))

    refs = [(f"ref{i}", _rand_seq(rng, int(rng.integers(80, 300))))
            for i in range(int(rng.integers(2, 6)))]
    reads = [(f"rd{i}",
              (_repeat_rich(rng, 90) if i % 2 else
               refs[i % len(refs)][1][:60] + _rand_seq(rng, 30)))
             for i in range(20)]

    rp = tmp_path / "refs.fa"
    rp.write_text("".join(f">{n}\n{sq.decode()}\n" for n, sq in refs))
    fp = tmp_path / "reads.fq"
    fp.write_text("".join(f"@{n}\n{sq.decode()}\n+\n{'I' * len(sq)}\n"
                          for n, sq in reads))

    ref_sk = [oracle.minhashes(oracle.calc_hashes(sq, list(ks)), s) for _, sq in refs]
    keep = []
    for name, sq in reads:
        mins = oracle.minhashes(oracle.calc_hashes(sq, list(ks)), s)
        shared = [oracle.intersection_size(mins, r) for r in ref_sk]
        mx, pm = 0, 0
        for c in shared:
            if c > mx:
                pm, mx = mx, c
        diff_ok = (mx - pm) > 0
        depth_fail = len(mins) <= 0
        match_fail = mx < min_matches
        if not depth_fail and not match_fail and diff_ok:
            keep.append(name)

    buf = io.StringIO()
    rc = run_filter(
        FilterConfig(ref_files=[str(rp)], read_files=[str(fp)], ks=ks,
                     sketch_size=s, min_matches=min_matches, batch_size=8),
        out=buf,
    )
    assert rc == 0
    got = [l[1:] for l in buf.getvalue().splitlines() if l.startswith(">")]
    assert got == keep


@pytest.mark.parametrize("seed", [7, 8])
def test_stream_counter_fuzz_matches_oracle(tmp_path, seed):
    """-M/-I lossy-counter paths under fuzz: tiny counter tables force
    collisions, repeat-rich refs force duplicate hashes; random M-only /
    I-only / both combinations vs the oracle's exact `hash % C`
    replication (stream flavor: -I counts every occurrence,
    rkmh.cpp:828-837; -M masks read hashes, 903-917)."""
    rng = np.random.default_rng(seed)
    ks = (9,)
    s = int(rng.integers(8, 60))
    C = int(rng.integers(256, 4096))
    M = int(rng.integers(1, 4)) if rng.random() < 0.8 else -1
    I = int(rng.integers(1, 6)) if (M == -1 or rng.random() < 0.5) else None

    refs = []
    for i in range(int(rng.integers(2, 7))):
        n = int(rng.integers(80, 350))
        refs.append((f"ref{i}", _repeat_rich(rng, n) if i % 2 else _rand_seq(rng, n)))
    reads = [(f"rd{i}",
              _repeat_rich(rng, int(rng.integers(20, 150))) if i % 3 == 0
              else _rand_seq(rng, int(rng.integers(20, 150))))
             for i in range(20)]

    rp = tmp_path / "refs.fa"
    rp.write_text("".join(f">{n}\n{sq.decode()}\n" for n, sq in refs))
    fp = tmp_path / "reads.fq"
    fp.write_text("".join(f"@{n}\n{sq.decode()}\n+\n{'I' * len(sq)}\n"
                          for n, sq in reads))

    # oracle: lossy counters with exact modulo/collision semantics
    if I is not None:
        rtab = [0] * C
        for _, sq in refs:
            for h in oracle.calc_hashes(sq, list(ks)):
                rtab[h % C] += 1
        ref_sk = [
            oracle.minhashes(
                [h if 0 <= rtab[h % C] <= I else 0
                 for h in oracle.calc_hashes(sq, list(ks))], s)
            for _, sq in refs
        ]
    else:
        ref_sk = [oracle.minhashes(oracle.calc_hashes(sq, list(ks)), s)
                  for _, sq in refs]
    if M >= 0:
        mtab = [0] * C
        for _, sq in reads:
            for h in oracle.calc_hashes(sq, list(ks)):
                mtab[h % C] += 1

    lines = []
    for name, sq in reads:
        hashes = oracle.calc_hashes(sq, list(ks))
        if M >= 0:
            hashes = [h if mtab[h % C] >= M else 0 for h in hashes]
        mins = oracle.minhashes(hashes, s)
        shared = [oracle.intersection_size(mins, r) for r in ref_sk]
        mx, mi = -1, 0
        for j, c in enumerate(shared):
            if c > mx:
                mx, mi = c, j
        # default filters (min_diff=0, min_matches=-1): every tag empty
        # (depth = len <= -1 never; diff margin >= 1 always passes)
        lines.append(f"{refs[mi][0]}\t{name}\t{mx}\t{s}\t\t\n")
    expected = "".join(lines)

    buf = io.StringIO()
    rc = run(
        StreamConfig(ref_files=[str(rp)], read_files=[str(fp)], ks=ks,
                     sketch_size=s, min_kmer_occ=M,
                     max_samples=I, counter_size=C, batch_size=8),
        out=buf,
    )
    assert rc == 0
    assert buf.getvalue() == expected


@pytest.mark.parametrize("seed", [5, 6])
def test_call_fuzz_matches_oracle(tmp_path, seed):
    """call: random reference + reads carrying random planted SNPs (plus
    Ns and off-reference noise) — full VCF body vs the scalar call
    oracle (window truncation, 0.1/0.5/0.9 thresholds, off-by-one
    position, string-sorted records)."""
    from rkmh_tpu.commands.call_cmd import CallConfig, run as run_call

    rng = np.random.default_rng(seed)
    k = int(rng.integers(8, 14))
    L = int(rng.integers(150, 400))
    ref = _rand_seq(rng, L, with_n=False)
    # plant 1-3 SNPs, carried by most reads
    mutant = bytearray(ref)
    for _ in range(int(rng.integers(1, 4))):
        p = int(rng.integers(k, L - k))
        mutant[p] = ord(rng.choice([c for c in "ACGT" if ord(c) != mutant[p]]))
    mutant = bytes(mutant)

    reads = []
    for i in range(60):
        src = mutant if i % 8 else ref
        rl = int(rng.integers(40, 90))
        s0 = int(rng.integers(0, max(1, len(src) - rl)))
        sq = src[s0 : s0 + rl]
        if i % 11 == 0:  # sprinkle Ns (0-sentinel windows)
            b = bytearray(sq)
            b[int(rng.integers(0, len(b)))] = ord("N")
            sq = bytes(b)
        reads.append((f"rd{i}", sq))
    reads.append(("noise", _rand_seq(rng, 70, with_n=False)))

    rp = tmp_path / "ref.fa"
    rp.write_text(f">refA\n{ref.decode()}\n")
    fp = tmp_path / "reads.fq"
    fp.write_text("".join(f"@{n}\n{sq.decode()}\n+\n{'I' * len(sq)}\n"
                          for n, sq in reads))

    depth_map = oracle.read_depth_map([sq for _, sq in reads], k)
    want_calls, _ = oracle.call_variants("refA", ref, depth_map, k, 100)
    want_body = [
        f"{key}\t99\tPASS\tKC={v[0]};MD={v[1]};RD={v[2]};OD={v[3]}"
        for key, v in sorted(want_calls.items())
    ]

    buf = io.StringIO()
    rc = run_call(
        CallConfig(ref_files=[str(rp)], read_files=[str(fp)], ks=(k,)),
        out=buf,
    )
    assert rc == 0
    body = [l for l in buf.getvalue().splitlines() if not l.startswith("##")]
    assert body == want_body
    # non-vacuous for the pinned seeds: the planted SNPs must call
    if seed in (5, 6):
        assert want_body


@pytest.mark.parametrize("seed", [7])
def test_devices_fuzz_matches_single(tmp_path, seed):
    """Random (devices, tp, -M) geometries on the 8-device CPU mesh:
    stream and filter --devices must be byte-identical to their
    single-device runs (which the other fuzz cases pin to the oracle).
    Non-dividing tp / counter geometries exercise the warn-and-fallback
    path, which must also be byte-identical."""
    from rkmh_tpu.commands.filter_cmd import FilterConfig, run as run_filter

    rng = np.random.default_rng(seed + 77)
    ks = (7, 11) if seed % 2 else (9,)
    s = int(rng.integers(4, 40))
    devices = int(rng.choice([2, 4, 8]))
    tp = int(rng.choice([t for t in (1, 2, 4) if devices % t == 0]))
    use_m = bool(seed % 2)
    counter = int(rng.choice([4096, 4097, 100_000]))

    refs = [(f"ref{i}", _rand_seq(rng, int(rng.integers(60, 400))))
            for i in range(int(rng.integers(2, 9)))]
    reads = [(f"rd{i}", _rand_seq(rng, int(rng.integers(3, 120))))
             for i in range(24)]
    rp = tmp_path / "refs.fa"
    rp.write_text("".join(f">{n}\n{sq.decode()}\n" for n, sq in refs))
    fp = tmp_path / "reads.fq"
    fp.write_text("".join(f"@{n}\n{sq.decode()}\n+\n{'I' * len(sq)}\n"
                          for n, sq in reads))

    base = dict(ref_files=[str(rp)], read_files=[str(fp)], ks=ks,
                sketch_size=s, batch_size=8,
                min_kmer_occ=(2 if use_m else -1), counter_size=counter)
    one, many = io.StringIO(), io.StringIO()
    assert run(StreamConfig(**base), out=one) == 0
    assert run(StreamConfig(**base, devices=devices, tp=tp), out=many) == 0
    assert many.getvalue() == one.getvalue()

    fbase = dict(base, min_matches=1)
    one, many = io.StringIO(), io.StringIO()
    assert run_filter(FilterConfig(**fbase), out=one) == 0
    assert run_filter(FilterConfig(**fbase, devices=devices, tp=tp),
                      out=many) == 0
    assert many.getvalue() == one.getvalue()


@pytest.mark.parametrize("seed", [8])
def test_call_devices_fuzz_matches_single(tmp_path, seed):
    """call --devices on random genomes/reads: the position-sharded scan
    must produce the byte-identical VCF (the shard-boundary windows and
    the ppermute depth halo are where a bug would land).  devices=2 so
    ~600 bp genomes still clear the per-device window; an undersized
    genome exercises the fallback."""
    from rkmh_tpu.commands.call_cmd import CallConfig, run as run_call

    rng = np.random.default_rng(seed + 177)
    k = int(rng.choice([12, 16]))
    glen = int(rng.integers(450, 900))
    ref = _rand_seq(rng, glen, with_n=False)
    reads = []
    for i in range(30):  # overlapping slices + planted SNPs for depth
        st = int(rng.integers(0, max(1, glen - 120)))
        sq = bytearray(ref[st : st + 120])
        if i % 3 == 0 and len(sq) > 10:
            sq[int(rng.integers(5, len(sq) - 5))] = ord(
                rng.choice(list("ACGT")))
        reads.append((f"rd{i}", bytes(sq)))

    rp = tmp_path / "ref.fa"
    rp.write_text(f">refA\n{ref.decode()}\n")
    fp = tmp_path / "reads.fq"
    fp.write_text("".join(f"@{n}\n{sq.decode()}\n+\n{'I' * len(sq)}\n"
                          for n, sq in reads))
    base = dict(ref_files=[str(rp)], read_files=[str(fp)], ks=(k,))

    one, two = io.StringIO(), io.StringIO()
    assert run_call(CallConfig(**base), out=one) == 0
    assert run_call(CallConfig(**base, devices=2), out=two) == 0
    assert two.getvalue() == one.getvalue()

    # fallback: 8 devices cannot cover the window on this genome
    eight = io.StringIO()
    assert run_call(CallConfig(**base, devices=8), out=eight) == 0
    assert eight.getvalue() == one.getvalue()


# ---------------------------------------------------------------------------
# dist drains: randomized 2-process stripes + merge + mid-drain resume
# ---------------------------------------------------------------------------

def _launch_dist(args, env, n_procs=2):
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [_sys.executable, *args, "--dist-coordinator",
             f"localhost:{port}", "--dist-rank", str(p)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for p in range(n_procs)
    ]
    errs = [p.communicate(timeout=600)[1] for p in procs]
    assert all(p.returncode == 0 for p in procs), \
        "\n".join(e[-1500:] for e in errs)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dist_fuzz_matches_single(tmp_path, seed):
    """Randomized 2-process --dist-* drains (stream / filter / hpv16 by
    seed) on random panels/reads: merged stripes must byte-equal the
    single-process run, and (stream/hpv16) a mid-drain interruption —
    stripes truncated at random points, one with a torn tail — must
    resume to the identical merged output."""
    import os as _os

    rng = np.random.default_rng(seed + 1009)
    cmd = ["stream", "filter", "hpv16"][seed % 3]
    tp = int(rng.choice([1, 2]))
    ks = int(rng.choice([9, 11, 13]))
    s = int(rng.integers(8, 60))
    env = {
        "PATH": _os.environ.get("PATH", "/usr/bin:/bin"),
        "PYTHONPATH": "/root/repo",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "HOME": _os.environ.get("HOME", "/root"),
    }
    out = str(tmp_path / "out.txt")

    reads = [(f"rd{i}", _rand_seq(rng, int(rng.integers(3, 160))))
             for i in range(int(rng.integers(30, 70)))]
    fp = tmp_path / "reads.fq"
    fp.write_text("".join(f"@{n}\n{sq.decode()}\n+\n{'I' * len(sq)}\n"
                          for n, sq in reads))

    if cmd == "hpv16":
        # synthetic refpath (full PAVE panel is minutes per CPU process)
        n_types = int(rng.integers(3, 7))
        types = [_rand_seq(rng, int(rng.integers(300, 900)), with_n=False)
                 for _ in range(n_types)]
        (tmp_path / "all_pave_ref.fa").write_text("".join(
            f">TYPE{i}REF\n{t.decode()}\n" for i, t in enumerate(types)))
        subs = {}
        for name in ["A1", "A2", "B1", "C1"][: int(rng.integers(2, 5))]:
            b = bytearray(types[0])
            for p in rng.choice(len(b) - 1, size=8, replace=False):
                b[p] = ord(rng.choice(list("ACGT")))
            subs[name] = bytes(b)
        (tmp_path / "new_refs.fa").write_text("".join(
            f">{n}\n{sq.decode()}\n" for n, sq in subs.items()))
        args = ["-m", "rkmh_tpu.cli", "hpv16", "-f", str(fp),
                "-R", str(tmp_path), "-k", str(ks), "-s", str(s),
                "--batch-size", "16", "--tp", str(tp),
                "--dist-procs", "2", "-o", out]
    else:
        n_refs = int(rng.integers(2, 9))
        if tp > 1:
            n_refs += (-n_refs) % tp  # tp must divide the panel
        refs = [(f"ref{i}", _rand_seq(rng, int(rng.integers(80, 400))))
                for i in range(n_refs)]
        rp = tmp_path / "refs.fa"
        rp.write_text("".join(f">{n}\n{sq.decode()}\n" for n, sq in refs))
        args = ["-m", "rkmh_tpu.cli", cmd, "-r", str(rp), "-f", str(fp),
                "-k", str(ks), "-s", str(s), "--batch-size", "16",
                "--tp", str(tp), "--dist-procs", "2", "-o", out]
        if cmd == "filter":
            args += ["-N", "1"]

    _launch_dist(args, env)

    import contextlib

    from rkmh_tpu.commands.dist_stream import merge_main

    def merged_text():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            assert merge_main([f"{out}.0", f"{out}.1"]) == 0
        return buf.getvalue()

    full = merged_text()

    # single-process reference run
    single = io.StringIO()
    if cmd == "stream":
        assert run(StreamConfig(ref_files=[str(tmp_path / "refs.fa")],
                                read_files=[str(fp)], ks=(ks,),
                                sketch_size=s, batch_size=16),
                   out=single) == 0
    elif cmd == "filter":
        from rkmh_tpu.commands.filter_cmd import FilterConfig
        from rkmh_tpu.commands.filter_cmd import run as run_filter

        assert run_filter(
            FilterConfig(ref_files=[str(tmp_path / "refs.fa")],
                         read_files=[str(fp)], ks=(ks,), sketch_size=s,
                         batch_size=16, min_matches=1), out=single) == 0
    else:
        from rkmh_tpu.commands.hpv16_cmd import Hpv16Config
        from rkmh_tpu.commands.hpv16_cmd import run as run_hpv16

        cwd = _os.getcwd()
        _os.chdir(tmp_path)  # the .tst side-effect file
        try:
            assert run_hpv16(
                Hpv16Config(read_files=[str(fp)], refpath=str(tmp_path),
                            ks=(ks,), sketch_size=s, batch_size=16),
                out=single) == 0
        finally:
            _os.chdir(cwd)
    assert full == single.getvalue()

    if cmd in ("stream", "hpv16"):
        # mid-drain interruption: truncate each stripe at a random line
        # count (rank 1 with a torn tail), then --resume and re-merge
        for p in range(2):
            with open(f"{out}.{p}") as fh:
                lines = fh.readlines()
            keep = int(rng.integers(0, max(1, len(lines))))
            torn = lines[keep][: len(lines[keep]) // 2] \
                if p == 1 and keep < len(lines) else ""
            with open(f"{out}.{p}", "w") as fh:
                fh.writelines(lines[:keep])
                fh.write(torn)
        _launch_dist(args + ["--resume"], env)
        assert merged_text() == full


@pytest.mark.parametrize("seed", [3, 11])
def test_dist_call_fuzz_matches_single(tmp_path, seed):
    """Randomized 2-process `call --dist-*` scans (random genome, reads
    = mutated slices): merged partials byte-equal single-process; a
    truncated rank stripe REFUSES to merge (completeness check); then
    --resume reconverges to the identical VCF."""
    import contextlib
    import os as _os

    from rkmh_tpu.commands.call_cmd import CallConfig, run as run_call
    from rkmh_tpu.commands.dist_stream import merge_main

    rng = np.random.default_rng(seed + 4242)
    k = int(rng.choice([9, 11, 13]))
    genome = _rand_seq(rng, int(rng.integers(600, 1600)), with_n=False)
    ref = tmp_path / "ref.fa"
    ref.write_text(f">g\n{genome.decode()}\n")
    reads = []
    for i in range(int(rng.integers(20, 50))):
        ln = int(rng.integers(k + 5, 120))
        st = int(rng.integers(0, max(1, len(genome) - ln)))
        b = bytearray(genome[st : st + ln])
        for p in rng.choice(len(b), size=min(3, len(b)), replace=False):
            b[p] = ord(rng.choice(list("ACGT")))
        reads.append((f"rd{i}", bytes(b)))
    fp = tmp_path / "reads.fq"
    fp.write_text("".join(f"@{n}\n{sq.decode()}\n+\n{'I' * len(sq)}\n"
                          for n, sq in reads))

    env = {
        "PATH": _os.environ.get("PATH", "/usr/bin:/bin"),
        "PYTHONPATH": "/root/repo",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "HOME": _os.environ.get("HOME", "/root"),
    }
    out = str(tmp_path / "out.vcf")
    args = ["-m", "rkmh_tpu.cli", "call", "-r", str(ref), "-f", str(fp),
            "-k", str(k), "--dist-procs", "2", "-o", out]
    _launch_dist(args, env)

    def merged_text():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            assert merge_main([f"{out}.0", f"{out}.1"]) == 0
        return buf.getvalue()

    full = merged_text()
    single = io.StringIO()
    assert run_call(CallConfig(ref_files=[str(ref)], read_files=[str(fp)],
                               ks=(k,)), out=single) == 0
    assert full == single.getvalue()

    # truncate rank 1's stripe (drop its last line + add a torn tail):
    # the merge must refuse, and --resume must reconverge
    with open(f"{out}.1") as fh:
        lines = fh.readlines()
    with open(f"{out}.1", "w") as fh:
        fh.writelines(lines[:-1])
        fh.write(lines[-1][: len(lines[-1]) // 2])
    with pytest.raises(RuntimeError, match="ended early|disagree"):
        merge_main([f"{out}.0", f"{out}.1"])
    _launch_dist(args + ["--resume"], env)
    assert merged_text() == full
