"""Multi-host helpers + scaling harness mechanics (virtual CPU mesh),
plus a REAL 2-process jax.distributed run (localhost coordinator, Gloo
collectives) proving the multi-host path end to end — the one capability
axis the reference has no analog of (SURVEY.md §2.4)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np

from rkmh_tpu.parallel.distributed import host_read_shard, initialize


def test_host_read_shard_partitions_exactly():
    for n_proc in (1, 2, 3, 7, 8):
        for n_rec in (0, 1, 5, 100, 1001):
            spans = [
                host_read_shard(n_rec, process_id=p, num_processes=n_proc)
                for p in range(n_proc)
            ]
            # contiguous, disjoint, exhaustive
            assert spans[0][0] == 0
            assert spans[-1][1] == n_rec
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                assert a1 == b0
            sizes = [b - a for a, b in spans]
            assert max(sizes) - min(sizes) <= 1  # balanced


def test_initialize_single_process_noop():
    # no coordinator configured -> returns without touching jax.distributed
    initialize()


def test_two_process_distributed_classify_bit_identical(tmp_path):
    """Two OS processes x 4 virtual CPU devices each: initialize() brings
    up the distributed runtime, each process parses only its
    host_read_shard slice, and the tp=2-sharded shard_map classify runs
    over the 8-device GLOBAL mesh.  The merged per-read results must be
    bit-identical to the single-process engine."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    outs = [str(tmp_path / f"dist_{p}.json") for p in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"localhost:{port}", "2", str(p), outs[p]],
            env={
                "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
                "PYTHONPATH": "/root/repo",
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "HOME": os.environ.get("HOME", "/root"),
                "RKMH_TPU_INPUT_INDEX": str(tmp_path / "idxcache")
                if tmp_path else "0",
            },
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=600)
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), "\n".join(e[-1500:] for e in errs)

    merged = {}
    shards = []
    for o in outs:
        with open(o) as f:
            d = json.load(f)
        shards.append(tuple(d["shard"]))
        for k, v in d["rows"].items():
            i = int(k)
            if i in merged:
                assert merged[i] == v, f"row {i} disagrees between processes"
            merged[i] = v
    assert sorted(shards) == [(0, 32), (32, 64)]  # block partition held
    assert sorted(merged) == list(range(64))

    # single-process oracle: same refs/reads/params through the engine
    from rkmh_tpu.classify import engine
    from rkmh_tpu.io.fastx import read_fastx
    from rkmh_tpu.io.packing import encode_seqs
    from rkmh_tpu.utils import to_host

    DATA = "/root/reference/data"
    ks, s = (12,), 200
    refs = read_fastx(f"{DATA}/zika.refs.fa")[:8]
    ref_codes, _ = encode_seqs([r.seq for r in refs])
    ref_sk, ref_lens = engine.sketch_batch(ref_codes, ks, s)
    reads = read_fastx(f"{DATA}/z1.fq")[:64]
    codes, _ = encode_seqs([r.seq for r in reads], pad_to=256)
    best, shared, _, diff_ok, depth_fail, match_fail = to_host(
        engine.classify_batch(codes, ref_sk, ref_lens, ks, s)
    )
    for i in range(64):
        got = merged[i]
        assert got["best"] == int(best[i]), i
        assert got["shared"] == int(shared[i]), i
        assert got["diff_ok"] == int(diff_ok[i]), i
        assert got["depth_fail"] == int(depth_fail[i]), i
        assert got["match_fail"] == int(match_fail[i]), i


def test_scaling_harness_runs():
    out = subprocess.run(
        [sys.executable, "bench_scaling.py"],
        capture_output=True, text=True, timeout=900,
        env={
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "PYTHONPATH": "/root/repo",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "HOME": "/root",
        },
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-800:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    rows = [l for l in lines if "devices" in l]
    assert [r["devices"] for r in rows] == [1, 2, 4]
    assert all(r["reads_per_sec"] > 0 for r in rows)


def test_two_process_distributed_cli_stream(tmp_path):
    """The multi-host CLI surface end to end: two OS processes x 4
    virtual CPU devices run `stream --dist-*` (tp=2 panel sharding, so
    collectives genuinely cross the process boundary), each writes its
    rank stripe file, and rkmh-tpu-dist-merge reassembles output that is
    byte-identical to a plain single-process CLI run."""
    import io as _io

    from rkmh_tpu.commands.stream import StreamConfig, run as run_stream

    D = "/root/reference/data"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out = str(tmp_path / "out.rk")
    args = [
        "-m", "rkmh_tpu.cli", "stream",
        "-r", f"{D}/zika.refs.fa", "-f", f"{D}/z1.fq",
        "-k", "12", "-s", "1000", "--batch-size", "64", "--tp", "2",
        "--dist-coordinator", f"localhost:{port}", "--dist-procs", "2",
        "-o", out,
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, *args, "--dist-rank", str(p)],
            env={
                "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
                "PYTHONPATH": "/root/repo",
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "HOME": os.environ.get("HOME", "/root"),
                "RKMH_TPU_INPUT_INDEX": str(tmp_path / "idxcache")
                if tmp_path else "0",
            },
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=600)
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), "\n".join(e[-1500:] for e in errs)

    # geometry comes from the .dist.json sidecar the run wrote (global
    # batch 64: 8 global devices, dp=4, H=2 -> 64 already divides)
    import contextlib

    from rkmh_tpu.commands.dist_stream import merge_main

    merged = _io.StringIO()
    with contextlib.redirect_stdout(merged):
        assert merge_main([f"{out}.0", f"{out}.1"]) == 0

    single = _io.StringIO()
    assert run_stream(
        StreamConfig(ref_files=[f"{D}/zika.refs.fa"],
                     read_files=[f"{D}/z1.fq"], ks=(12,), sketch_size=1000,
                     batch_size=64),
        out=single,
    ) == 0
    assert merged.getvalue() == single.getvalue()


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("tp", [1, 2])
def test_two_process_distributed_cli_hpv16(tmp_path, tp):
    """hpv16 --dist-*: two processes x 4 virtual CPU devices over the
    real minION25 reads + PAVE panels; merged stripes byte-equal the
    single-process CLI run (one line per read, so the stream merge tool
    applies directly).  tp=2 additionally shards the type set table over
    the global mesh's tp axis (the single-host --tp memory class,
    VERDICT round-2 item 4) — byte-identical output either way."""
    import io as _io

    from rkmh_tpu.commands.hpv16_cmd import Hpv16Config, run as run_hpv16

    D = "/root/reference/data"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out = str(tmp_path / "out.hpv")
    args = [
        "-m", "rkmh_tpu.cli", "hpv16",
        "-f", f"{D}/minION25.fq", "-R", D, "-k", "16", "--batch-size", "8",
        "--dist-coordinator", f"localhost:{port}", "--dist-procs", "2",
        "--tp", str(tp),
        "-o", out,
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, *args, "--dist-rank", str(p)],
            cwd=str(tmp_path),  # .tst side-effect file lands here
            env={
                "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
                "PYTHONPATH": "/root/repo",
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "HOME": os.environ.get("HOME", "/root"),
                "RKMH_TPU_INPUT_INDEX": str(tmp_path / "idxcache")
                if tmp_path else "0",
            },
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=600)
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), "\n".join(e[-1500:] for e in errs)

    # the run rounds the global batch up to ndev*H = 16; the .dist.json
    # sidecar records it so the merge needs no hand-typed -b
    import contextlib

    from rkmh_tpu.commands.dist_stream import merge_main

    merged = _io.StringIO()
    with contextlib.redirect_stdout(merged):
        assert merge_main([f"{out}.0", f"{out}.1"]) == 0

    single = _io.StringIO()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert run_hpv16(
            Hpv16Config(read_files=[f"{D}/minION25.fq"], refpath=D,
                        ks=(16,), batch_size=8),
            out=single,
        ) == 0
    finally:
        os.chdir(cwd)
    assert merged.getvalue() == single.getvalue()


def test_two_process_distributed_cli_filter(tmp_path):
    """filter --dist-*: variable records per stripe (only passing reads
    are emitted), so the merge follows the per-rank .idx sidecars; the
    merged bytes equal a single-process CLI run."""
    import contextlib
    import io as _io

    from rkmh_tpu.commands.dist_stream import merge_main
    from rkmh_tpu.commands.filter_cmd import FilterConfig, run as run_filter

    D = "/root/reference/data"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out = str(tmp_path / "out.fq")
    args = [
        "-m", "rkmh_tpu.cli", "filter",
        "-r", f"{D}/hpv_16.fa", "-r", f"{D}/dengue.fa",
        "-f", f"{D}/minION25.fq",
        "-k", "16", "-s", "400", "-N", "5", "--batch-size", "8", "--tp", "2",
        "--dist-coordinator", f"localhost:{port}", "--dist-procs", "2",
        "-o", out,
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, *args, "--dist-rank", str(p)],
            env={
                "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
                "PYTHONPATH": "/root/repo",
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "HOME": os.environ.get("HOME", "/root"),
                "RKMH_TPU_INPUT_INDEX": str(tmp_path / "idxcache")
                if tmp_path else "0",
            },
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=600)
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), "\n".join(e[-1500:] for e in errs)

    merged = _io.StringIO()
    with contextlib.redirect_stdout(merged):
        assert merge_main([f"{out}.0", f"{out}.1"]) == 0

    single = _io.StringIO()
    assert run_filter(
        FilterConfig(ref_files=[f"{D}/hpv_16.fa", f"{D}/dengue.fa"],
                     read_files=[f"{D}/minION25.fq"], ks=(16,),
                     sketch_size=400, min_matches=5, batch_size=8),
        out=single,
    ) == 0
    assert merged.getvalue() == single.getvalue()
    assert merged.getvalue()  # some reads must pass for the test to bite


def test_two_process_distributed_cli_stream_resume(tmp_path):
    """dist --resume: after an interruption (simulated by truncating the
    rank stripes at different points), rerunning every rank with
    --resume appends exactly the missing lines — merged output is
    byte-identical to an uninterrupted single-process run."""
    import contextlib
    import io as _io

    from rkmh_tpu.commands.dist_stream import merge_main
    from rkmh_tpu.commands.stream import StreamConfig, run as run_stream

    D = "/root/reference/data"
    out = str(tmp_path / "out.rk")
    args = [
        "-m", "rkmh_tpu.cli", "stream",
        "-r", f"{D}/zika.refs.fa", "-f", f"{D}/z1.fq",
        "-k", "12", "-s", "1000", "--batch-size", "64", "--tp", "2",
        "--dist-procs", "2", "-o", out,
    ]
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "PYTHONPATH": "/root/repo",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "HOME": os.environ.get("HOME", "/root"),
                "RKMH_TPU_INPUT_INDEX": str(tmp_path / "idxcache")
                if tmp_path else "0",
    }

    def launch(extra):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [
            subprocess.Popen(
                [sys.executable, *args, "--dist-coordinator",
                 f"localhost:{port}", "--dist-rank", str(p), *extra],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True)
            for p in range(2)
        ]
        errs = [p.communicate(timeout=600)[1] for p in procs]
        assert all(p.returncode == 0 for p in procs), \
            "\n".join(e[-1500:] for e in errs)

    launch([])
    # interrupt: chop the two stripes at different (line-exact) points,
    # one of them mid-line to exercise torn-tail truncation
    for p, keep in ((0, 100), (1, 271)):
        with open(f"{out}.{p}") as fh:
            lines = fh.readlines()
        torn = lines[keep][: len(lines[keep]) // 2] if p == 1 else ""
        with open(f"{out}.{p}", "w") as fh:
            fh.writelines(lines[:keep])
            fh.write(torn)
    launch(["--resume"])

    merged = _io.StringIO()
    with contextlib.redirect_stdout(merged):
        assert merge_main([f"{out}.0", f"{out}.1"]) == 0
    single = _io.StringIO()
    assert run_stream(
        StreamConfig(ref_files=[f"{D}/zika.refs.fa"],
                     read_files=[f"{D}/z1.fq"], ks=(12,), sketch_size=1000,
                     batch_size=64),
        out=single,
    ) == 0
    assert merged.getvalue() == single.getvalue()


def test_distributed_filter_resume_idx_checkpoint(tmp_path):
    """filter dist --resume: the per-batch .idx sidecar is the
    checkpoint — the stripe truncates to the records the idx covers
    (dropping a torn tail past it) and resumed output is byte-identical
    to an uninterrupted run.  Single process over the 8-device mesh
    (the multi-rank mechanics are covered by the CLI tests)."""
    import io as _io

    from rkmh_tpu.commands.dist_stream import run_distributed_filter
    from rkmh_tpu.commands.filter_cmd import FilterConfig, run as run_filter

    D = "/root/reference/data"
    base = dict(ref_files=[f"{D}/hpv_16.fa", f"{D}/dengue.fa"],
                read_files=[f"{D}/minION25.fq"], ks=(16,), sketch_size=400,
                min_matches=5, batch_size=4, tp=2)
    single = _io.StringIO()
    assert run_filter(FilterConfig(**base), out=single) == 0

    p = str(tmp_path / "out.fq")
    assert run_distributed_filter(FilterConfig(**base, out_file=p)) == 0
    assert open(p).read() == single.getvalue()

    with open(f"{p}.idx") as fh:
        idx = fh.readlines()
    with open(f"{p}.idx", "w") as fh:
        fh.writelines(idx[:3])
    kept = sum(int(x) for x in idx[:3]) * 4
    with open(p) as fh:
        lines = fh.readlines()
    with open(p, "w") as fh:
        fh.writelines(lines[: kept + 2])  # torn tail past the idx

    assert run_distributed_filter(
        FilterConfig(**base, out_file=p, resume=True)) == 0
    assert open(p).read() == single.getvalue()
    assert len(open(f"{p}.idx").readlines()) == len(idx)


def test_dist_resume_geometry_guards(tmp_path):
    """--resume refuses a geometry change (batch size) and a missing
    sidecar next to an existing stripe; the filter merge refuses idx
    files that disagree (one rank interrupted earlier than its peers)."""
    import io as _io

    import pytest as _pytest

    from rkmh_tpu.commands.dist_stream import (
        merge_outputs_filter, run_distributed,
    )
    from rkmh_tpu.commands.stream import StreamConfig

    D = "/root/reference/data"
    p = str(tmp_path / "out.rk")
    base = dict(ref_files=[f"{D}/zika.refs.fa"], read_files=[f"{D}/z1.fq"],
                ks=(12,), sketch_size=1000, out_file=p)
    assert run_distributed(StreamConfig(**base, batch_size=64)) == 0

    # changed batch size -> rejected before any output is touched
    with _pytest.raises(RuntimeError, match="geometry mismatch"):
        run_distributed(StreamConfig(**base, batch_size=128, resume=True))

    # sidecar lost while the stripe exists -> rejected
    os.remove(f"{p}.dist.json")
    with _pytest.raises(RuntimeError, match="sidecar"):
        run_distributed(StreamConfig(**base, batch_size=64, resume=True))

    # filter merge: idx files of different batch counts -> rejected
    for r, counts in ((0, [1, 2]), (1, [1, 2, 3])):
        with open(tmp_path / f"f.{r}", "w") as fh:
            fh.write("x\n" * sum(counts) * 4)
        with open(tmp_path / f"f.{r}.idx", "w") as fh:
            fh.write("".join(f"{c}\n" for c in counts))
    with _pytest.raises(RuntimeError, match="ended early"):
        merge_outputs_filter([str(tmp_path / "f.0"), str(tmp_path / "f.1")],
                             out=_io.StringIO())


def test_call_merge_refuses_incomplete_stripes(tmp_path):
    """merge_outputs_call must raise (not silently drop position
    stripes) when a rank's drain ended early — detected either against
    the sidecar's refs_total or by cross-rank section disagreement."""
    import io as _io

    import pytest as _pytest

    from rkmh_tpu.commands.dist_stream import merge_outputs_call

    full = tmp_path / "c.0"
    short = tmp_path / "c.1"
    full.write_text('{"ref_done": "r1", "n": 0}\n'
                    '{"ref_done": "r2", "n": 0}\n')
    short.write_text('{"ref_done": "r1", "n": 0}\n')

    # refs_total check catches the truncated rank directly
    with _pytest.raises(RuntimeError, match="ended early"):
        merge_outputs_call([str(full), str(short)], "ref.fa",
                           out=_io.StringIO(), refs_total=2)
    # without refs_total (old sidecar), cross-rank disagreement catches it
    with _pytest.raises(RuntimeError, match="disagree"):
        merge_outputs_call([str(full), str(short)], "ref.fa",
                           out=_io.StringIO())
    # and ALL ranks short of refs_total is caught too
    with _pytest.raises(RuntimeError, match="ended early"):
        merge_outputs_call([str(short), str(short)], "ref.fa",
                           out=_io.StringIO(), refs_total=2)
    # complete stripes merge fine
    assert merge_outputs_call([str(full), str(full)], "ref.fa",
                              out=_io.StringIO(), refs_total=2) == 0


def test_two_process_distributed_cli_call(tmp_path):
    """call --dist-*: the positional scan sharded over 2 processes x 4
    virtual CPU devices; merged per-rank partial aggregates byte-equal
    the single-process VCF (aggregation commutes across disjoint
    position stripes)."""
    import contextlib
    import io as _io

    from rkmh_tpu.commands.call_cmd import CallConfig, run as run_call

    D = "/root/reference/data"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out = str(tmp_path / "out.vcf")
    args = [
        "-m", "rkmh_tpu.cli", "call",
        "-r", f"{D}/hpv_16.fa", "-f", f"{D}/minION25.fq", "-k", "16",
        "--dist-coordinator", f"localhost:{port}", "--dist-procs", "2",
        "-o", out,
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, *args, "--dist-rank", str(p)],
            cwd=str(tmp_path),
            env={
                "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
                "PYTHONPATH": "/root/repo",
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "HOME": os.environ.get("HOME", "/root"),
                "RKMH_TPU_INPUT_INDEX": str(tmp_path / "idxcache")
                if tmp_path else "0",
            },
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=600)
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), "\n".join(e[-1500:] for e in errs)

    from rkmh_tpu.commands.dist_stream import merge_main

    merged = _io.StringIO()
    with contextlib.redirect_stdout(merged):
        assert merge_main([f"{out}.0", f"{out}.1"]) == 0

    single = _io.StringIO()
    assert run_call(
        CallConfig(ref_files=[f"{D}/hpv_16.fa"],
                   read_files=[f"{D}/minION25.fq"], ks=(16,)),
        out=single,
    ) == 0
    assert merged.getvalue() == single.getvalue()
    assert merged.getvalue().count("\n") > 10


def _spawn_two(args, tmp_path=None):
    """Launch the 2-process CLI pair and assert both exit 0."""
    procs = [
        subprocess.Popen(
            [sys.executable, *args, "--dist-rank", str(p)],
            cwd=str(tmp_path) if tmp_path else None,
            env={
                "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
                "PYTHONPATH": "/root/repo",
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "HOME": os.environ.get("HOME", "/root"),
                "RKMH_TPU_INPUT_INDEX": str(tmp_path / "idxcache")
                if tmp_path else "0",
            },
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    outs, errs = [], []
    for p in procs:
        o, e = p.communicate(timeout=600)
        outs.append(o)
        errs.append(e)
    assert all(p.returncode == 0 for p in procs), \
        "\n".join(e[-1500:] for e in errs)
    return outs


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_cli_hash(tmp_path):
    """hash --dist-*: two processes x 4 virtual CPU devices; merged
    stripes must be byte-identical to a single-process run (per-read
    hash lines, the published hashing-throughput surface)."""
    import contextlib
    import io as _io

    from rkmh_tpu.commands.hash_cmd import HashConfig, run as run_hash

    D = "/root/reference/data"
    out = str(tmp_path / "hashes.txt")
    args = [
        "-m", "rkmh_tpu.cli", "hash",
        "-f", f"{D}/minION25.fq", "-k", "16", "--batch-size", "16",
        "--dist-coordinator", f"localhost:{_free_port()}",
        "--dist-procs", "2", "--out", out,
    ]
    _spawn_two(args)

    from rkmh_tpu.commands.dist_stream import merge_main

    merged = _io.StringIO()
    with contextlib.redirect_stdout(merged):
        assert merge_main([f"{out}.0", f"{out}.1"]) == 0

    single = _io.StringIO()
    assert run_hash(
        HashConfig(read_files=[f"{D}/minION25.fq"], ks=(16,),
                   batch_size=16),
        out=single,
    ) == 0
    assert merged.getvalue() == single.getvalue()
    assert merged.getvalue().count("\n") == 25


def test_two_process_distributed_cli_count(tmp_path):
    """count --dist-*: the dp-sharded global counter spans both
    processes; rank 0's --dump lines and the saved npz table must equal
    the single-process run exactly (scatter-adds commute)."""
    import io as _io

    from rkmh_tpu.commands.count_cmd import CountConfig, run as run_count

    D = "/root/reference/data"
    npz = str(tmp_path / "table.npz")
    args = [
        "-m", "rkmh_tpu.cli", "count",
        "-f", f"{D}/z1.fq", "-k", "12", "--counter-size", "64000",
        "--batch-size", "64", "--dump", "-o", npz,
        "--dist-coordinator", f"localhost:{_free_port()}",
        "--dist-procs", "2",
    ]
    outs = _spawn_two(args)

    def dump_lines(s):
        # Gloo prints connection chatter to stdout; keep only "slot\tcount"
        return "".join(
            ln + "\n" for ln in s.splitlines()
            if "\t" in ln and ln.split("\t")[0].isdigit())

    assert dump_lines(outs[1]) == ""  # only rank 0 emits

    single = _io.StringIO()
    snpz = str(tmp_path / "single.npz")
    assert run_count(
        CountConfig(read_files=[f"{D}/z1.fq"], ks=(12,),
                    counter_size=64000, batch_size=64, dump=True,
                    out_file=snpz),
        out=single,
    ) == 0
    assert dump_lines(outs[0]) == single.getvalue()
    with np.load(npz + ".npz" if not os.path.exists(npz) else npz) as da, \
            np.load(snpz + ".npz" if not os.path.exists(snpz) else snpz) as db:
        assert np.array_equal(da["table"], db["table"])
        assert int(da["size"]) == int(db["size"])


def test_two_process_distributed_cli_search(tmp_path):
    """search --dist-*: variable-length stripes (reads shorter than k
    emit nothing) reassembled via the .idx sidecars; merged output must
    be byte-identical to a single-process run."""
    import contextlib
    import io as _io

    from rkmh_tpu.commands.search_cmd import SearchConfig, run as run_search
    from rkmh_tpu.io.fastx import read_fastx

    D = "/root/reference/data"
    reads = read_fastx(f"{D}/z1.fq")[:40]
    fq = tmp_path / "mix.fq"
    with open(fq, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@{r.name}\n{r.seq.decode()}\n+\n"
                     f"{(r.qual or b'I' * len(r.seq)).decode()}\n")
            if i % 7 == 0:  # interleave reads SHORTER than k (emit nothing)
                fh.write(f"@short{i}\nACGTACG\n+\nIIIIIII\n")

    # reference kmer token file: k-mers of the first read + some misses
    k = 12
    seq = reads[0].seq.decode()
    ref_txt = tmp_path / "kmers.txt"
    with open(ref_txt, "w") as fh:
        for j in range(0, 60, 3):
            fh.write(f"{seq[j:j + k]}\textra tokens ignored\n")
        fh.write("A" * k + "\n")

    out = str(tmp_path / "search.out")
    args = [
        "-m", "rkmh_tpu.cli", "search",
        "-r", str(ref_txt), "-f", str(fq), "-k", str(k),
        "--dist-coordinator", f"localhost:{_free_port()}",
        "--dist-procs", "2", "-o", out,
    ]
    _spawn_two(args)

    from rkmh_tpu.commands.dist_stream import merge_main

    merged = _io.StringIO()
    with contextlib.redirect_stdout(merged):
        assert merge_main([f"{out}.0", f"{out}.1"]) == 0

    single = _io.StringIO()
    assert run_search(
        SearchConfig(ref_files=[str(ref_txt)], read_files=[str(fq)],
                     ks=(k,)),
        out=single,
    ) == 0
    assert merged.getvalue() == single.getvalue()
    assert merged.getvalue().count("\n") == 40  # short reads emit nothing


def test_resume_watermark_math():
    """_resume_watermark converts a rank's stripe line count into
    (complete leading batches, residual overhang lines) under the
    owned-block geometry, including zero-line trailing batches."""
    from rkmh_tpu.commands.dist_stream import _owned_lines, _resume_watermark

    # N=10, B=8, Bl=4: rank-1 owns rows [4,8) of batch 0 (4 lines) and
    # [12,16) of batch 1 (clipped by N -> 0 lines)
    assert [_owned_lines(b, 8, 4, 1, 10) for b in (0, 1)] == [4, 0]
    assert _resume_watermark(0, 10, 8, 4, 1, H=1) == (0, 0)
    assert _resume_watermark(2, 10, 8, 4, 1, H=1) == (0, 2)
    # a fully-emitted rank advances through the zero-line tail batch too
    assert _resume_watermark(4, 10, 8, 4, 1, H=1) == (2, 0)
    # rank 0: batch 0 rows [0,4), batch 1 rows [8,10) -> 2 lines
    assert [_owned_lines(b, 8, 4, 0, 10) for b in (0, 1)] == [4, 2]
    assert _resume_watermark(5, 10, 8, 4, 0, H=1) == (1, 1)
    assert _resume_watermark(6, 10, 8, 4, 0, H=1) == (2, 0)


def test_dist_stream_resume_watermark_skips_dispatches(tmp_path, monkeypatch):
    """dist --resume restarts device work at the batch watermark:
    batches every rank fully emitted are never dispatched again (not
    merely skipped at emission), and the resumed stripe is
    byte-identical to the uninterrupted run."""
    from rkmh_tpu.commands import dist_stream
    from rkmh_tpu.commands.stream import StreamConfig

    D = "/root/reference/data"
    p = str(tmp_path / "out.rk")
    base = dict(ref_files=[f"{D}/zika.refs.fa"], read_files=[f"{D}/z1.fq"],
                ks=(12,), sketch_size=1000, batch_size=64, out_file=p)
    assert dist_stream.run_distributed(StreamConfig(**base)) == 0
    full = open(p).read()
    lines = full.splitlines(keepends=True)
    assert len(lines) == 1000  # 16 batches of B=64 (last one short)
    with open(p, "w") as fh:  # crash after 5 full batches + 7 lines of #6
        fh.writelines(lines[: 5 * 64 + 7])

    dispatched = []
    orig = dist_stream._iter_owned_batches

    def counting(*a, **k):
        for tup in orig(*a, **k):
            dispatched.append(tup[0])
            yield tup

    monkeypatch.setattr(dist_stream, "_iter_owned_batches", counting)
    assert dist_stream.run_distributed(
        StreamConfig(**base, resume=True)) == 0
    assert open(p).read() == full
    assert dispatched == list(range(5, 16))  # watermark: 5 dispatches saved


def test_dist_mctr_checkpoint_skips_counter_pass(tmp_path, monkeypatch):
    """-M dist runs checkpoint the finished global counter per rank;
    --resume restores it instead of re-running the counting pass, so
    restarted device work is the classify remainder only."""
    import os as _os

    from rkmh_tpu.commands import dist_stream
    from rkmh_tpu.commands.stream import StreamConfig

    D = "/root/reference/data"
    p = str(tmp_path / "out.rk")
    base = dict(ref_files=[f"{D}/zika.refs.fa"], read_files=[f"{D}/z1.fq"],
                ks=(12,), sketch_size=1000, batch_size=64, out_file=p,
                min_kmer_occ=1, counter_size=64_000)
    assert dist_stream.run_distributed(StreamConfig(**base)) == 0
    full = open(p).read()
    ckpt = f"{p}.mctr.0.npz"
    assert _os.path.exists(ckpt)

    lines = full.splitlines(keepends=True)
    with open(p, "w") as fh:
        fh.writelines(lines[: 3 * 64])

    dispatched = []
    orig = dist_stream._iter_owned_batches

    def counting(*a, **k):
        for tup in orig(*a, **k):
            dispatched.append(tup[0])
            yield tup

    monkeypatch.setattr(dist_stream, "_iter_owned_batches", counting)
    assert dist_stream.run_distributed(
        StreamConfig(**base, resume=True)) == 0
    assert open(p).read() == full
    # counter pass skipped entirely (else range(16) would prefix this)
    assert dispatched == list(range(3, 16))

    # a changed input invalidates the checkpoint fingerprint
    from rkmh_tpu.commands.dist_stream import (
        _counter_fingerprint, _load_counter_ckpt,
    )

    fp = _counter_fingerprint([f"{D}/z1.fq"], (12,), 64_000, 8, 1, 0)
    bad = _counter_fingerprint([f"{D}/z1_long.fq"], (12,), 64_000, 8, 1, 0)
    assert fp != bad
    import jax

    from rkmh_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices(), dp=len(jax.devices()), tp=1)
    assert _load_counter_ckpt(mesh, p, bad, 64_000, 1, 0) is None
    restored = _load_counter_ckpt(mesh, p, fp, 64_000, 1, 0)
    assert restored is not None and restored.shape == (64_000,)


def test_distributed_search_resume_idx_checkpoint(tmp_path):
    """search dist --resume: the per-batch .idx line-count sidecar is
    the checkpoint (filter's recipe at 1 line/record) — stripe
    truncates to the idx coverage, dispatch restarts at the watermark,
    resumed output byte-identical to an uninterrupted run."""
    from rkmh_tpu.commands import dist_stream
    from rkmh_tpu.commands.search_cmd import SearchConfig
    from rkmh_tpu.io.fastx import read_fastx

    D = "/root/reference/data"
    reads = read_fastx(f"{D}/z1.fq")[:40]
    fq = tmp_path / "mix.fq"
    with open(fq, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@{r.name}\n{r.seq.decode()}\n+\n"
                     f"{(r.qual or b'I' * len(r.seq)).decode()}\n")
            if i % 7 == 0:
                fh.write(f"@short{i}\nACGTACG\n+\nIIIIIII\n")
    k = 12
    seq = reads[0].seq.decode()
    ref_txt = tmp_path / "kmers.txt"
    with open(ref_txt, "w") as fh:
        for j in range(0, 60, 3):
            fh.write(f"{seq[j:j + k]}\n")

    p = str(tmp_path / "search.out")
    base = dict(ref_files=[str(ref_txt)], read_files=[str(fq)], ks=(k,),
                batch_size=8, out_file=p)
    assert dist_stream.run_distributed_search(SearchConfig(**base)) == 0
    full = open(p).read()
    full_idx = open(f"{p}.idx").read()

    # crash after 2 complete batches + a torn stripe tail
    counts = [int(x) for x in full_idx.split()]
    with open(f"{p}.idx", "w") as fh:
        fh.write("".join(f"{c}\n" for c in counts[:2]))
    lines = full.splitlines(keepends=True)
    with open(p, "w") as fh:
        fh.writelines(lines[: sum(counts[:2])])
        fh.write("@torn-partial-line-without-newline")

    assert dist_stream.run_distributed_search(
        SearchConfig(**base, resume=True)) == 0
    assert open(p).read() == full
    assert open(f"{p}.idx").read() == full_idx


def test_distributed_hash_resume_watermark(tmp_path, monkeypatch):
    """hash dist --resume: line-counted stripes + the batch watermark,
    same recipe as stream (one line per read)."""
    from rkmh_tpu.commands import dist_stream
    from rkmh_tpu.commands.hash_cmd import HashConfig

    D = "/root/reference/data"
    p = str(tmp_path / "hashes.out")
    base = dict(read_files=[f"{D}/z1.fq"], ks=(12,), batch_size=64,
                out_file=p)
    assert dist_stream.run_distributed_hash(HashConfig(**base)) == 0
    full = open(p).read()
    lines = full.splitlines(keepends=True)
    assert len(lines) == 1000
    with open(p, "w") as fh:
        fh.writelines(lines[: 4 * 64 + 9])

    dispatched = []
    orig = dist_stream._iter_owned_batches

    def counting(*a, **k):
        for tup in orig(*a, **k):
            dispatched.append(tup[0])
            yield tup

    monkeypatch.setattr(dist_stream, "_iter_owned_batches", counting)
    assert dist_stream.run_distributed_hash(
        HashConfig(**base, resume=True)) == 0
    assert open(p).read() == full
    assert dispatched == list(range(4, 16))


def test_distributed_idx_overclaim_restarts_rank(tmp_path):
    """An idx sidecar claiming lines the stripe lost (half-lost files)
    is a corrupt checkpoint: the rank restarts from scratch instead of
    resuming around a hole, and output is still byte-identical."""
    from rkmh_tpu.commands import dist_stream
    from rkmh_tpu.commands.search_cmd import SearchConfig
    from rkmh_tpu.io.fastx import read_fastx

    D = "/root/reference/data"
    reads = read_fastx(f"{D}/z1.fq")[:40]
    fq = tmp_path / "mix.fq"
    with open(fq, "w") as fh:
        for r in reads:
            fh.write(f"@{r.name}\n{r.seq.decode()}\n+\n"
                     f"{(r.qual or b'I' * len(r.seq)).decode()}\n")
    k = 12
    seq = reads[0].seq.decode()
    ref_txt = tmp_path / "kmers.txt"
    with open(ref_txt, "w") as fh:
        for j in range(0, 60, 3):
            fh.write(f"{seq[j:j + k]}\n")

    p = str(tmp_path / "search.out")
    base = dict(ref_files=[str(ref_txt)], read_files=[str(fq)], ks=(k,),
                batch_size=8, out_file=p)
    assert dist_stream.run_distributed_search(SearchConfig(**base)) == 0
    full = open(p).read()
    full_idx = open(f"{p}.idx").read()

    # keep the idx whole but lose most of the stripe
    with open(p, "w") as fh:
        fh.write("".join(full.splitlines(keepends=True)[:3]))
    assert dist_stream.run_distributed_search(
        SearchConfig(**base, resume=True)) == 0
    assert open(p).read() == full
    assert open(f"{p}.idx").read() == full_idx
