"""`call` variant caller: device kernel + command vs the scalar oracle."""

import io

import numpy as np
import pytest

from rkmh_tpu import oracle

DATA = "/root/reference/data"


def _mutate(seq: bytes, pos: int, base: bytes) -> bytes:
    return seq[:pos] + base + seq[pos + 1 :]


@pytest.fixture(scope="module")
def synthetic():
    """240bp ref; reads overwhelmingly carry a SNP at 117, so the ref
    k-mers crossing 117 are low-depth and the alt k-mers rescue them."""
    rng = np.random.default_rng(7)
    ref = bytes(rng.choice(list(b"ACGT"), size=240).tolist())
    snp = _mutate(ref, 117, b"T" if ref[117:118] != b"T" else b"C")
    reads = []
    for i in range(8):
        s = int(rng.integers(0, len(ref) - 80))
        reads.append(ref[s : s + 80])
    for i in range(80):
        s = int(rng.integers(0, len(snp) - 80))
        reads.append(snp[s : s + 80])
    return ref, reads


def test_hashmap_exact(synthetic):
    from rkmh_tpu.ops.hashmap import build_hash_map, hashmap_get
    import jax.numpy as jnp

    ref, reads = synthetic
    d = oracle.read_depth_map(reads, 12)
    keys = np.array(sorted(d), dtype=np.uint64)
    vals = np.array([d[k] for k in keys.tolist()], dtype=np.int32)
    table = build_hash_map(keys, vals).device_arrays()

    got = np.asarray(hashmap_get(table, jnp.asarray(keys)))
    assert np.array_equal(got, vals)
    # missing keys -> 0
    miss = jnp.asarray(np.array([1, 2, 3, 10**18], dtype=np.uint64))
    present = set(keys.tolist())
    want = np.array([d.get(int(m), 0) if int(m) in present else 0 for m in miss])
    assert np.array_equal(np.asarray(hashmap_get(table, miss)), want)


def test_call_kernel_matches_oracle(synthetic):
    from rkmh_tpu import call_engine
    from rkmh_tpu.io.packing import bucket_length, encode_seqs
    from rkmh_tpu.ops.hashmap import build_hash_map

    ref, reads = synthetic
    k, w = 12, 100
    depth_map = oracle.read_depth_map(reads, k)
    keys = np.array(sorted(depth_map), dtype=np.uint64)
    vals = np.array([depth_map[x] for x in keys.tolist()], dtype=np.int32)
    table = build_hash_map(keys, vals).device_arrays()

    codes, _ = encode_seqs([ref], pad_to=bucket_length(len(ref)))
    res = call_engine.call_scan_ref(codes[0], table, k, w)
    P = len(ref) - k + 1

    want_calls, want_rows = oracle.call_variants("ref", ref, depth_map, k, w)
    avg = np.asarray(res["avg"])[:P]
    depth = np.asarray(res["depth"])[:P]
    rescue = np.asarray(res["max_rescue"])[:P]
    for j, (a, dpt, r) in enumerate(want_rows):
        assert (avg[j], depth[j], rescue[j]) == (a, dpt, r), f"row {j}"

    # reconstruct device-side calls the way the command does (windows
    # rebuilt host-side — the kernel no longer returns them)
    got_calls = {}
    row = codes[0]
    win = np.lib.stride_tricks.sliding_window_view(row, k)[:P]
    dpad = np.concatenate([np.full(1, 4, np.uint8), row])
    dwin = np.lib.stride_tricks.sliding_window_view(dpad, k + 1)[:P]
    snp_call = np.asarray(res["snp_call"])[:P]
    snp_depth = np.asarray(res["snp_depth"])[:P]
    del_call = np.asarray(res["del_call"])[:P]
    del_depth = np.asarray(res["del_depth"])[:P]

    def record(key, alt_depth, avg_d, dpt):
        e = got_calls.setdefault(key, [0, 0, 0, 0])
        e[0] += 1
        e[2] = max(e[2], avg_d)
        e[3] = max(e[3], dpt)
        if alt_depth > e[1]:
            e[1] = alt_depth

    B = "ACGT"
    for j, ap, b in zip(*np.nonzero(snp_call)):
        orig = B[win[j, ap]]
        alt = B[call_engine.ROT[win[j, ap], b]]
        record(f"ref\t{j + ap + 1}\t.\t{orig}\t{alt}",
               int(snp_depth[j, ap, b]), int(avg[j]), int(depth[j]))
    for j, api in zip(*np.nonzero(del_call)):
        ap = int(api) + 1
        record(f"ref\t{j + ap + 1}\t.\t{B[dwin[j, ap]] if dwin[j, ap] < 4 else 'N'}\t-",
               int(del_depth[j, api]), int(avg[j]), int(depth[j]))

    assert got_calls == want_calls
    assert want_calls, "synthetic SNP should produce at least one call"
    # the planted SNP position must be among the called positions
    assert any(f"\t{117 + 1}\t" in key for key in want_calls), sorted(want_calls)


def test_call_command_vcf(tmp_path, synthetic):
    from rkmh_tpu.commands.call_cmd import CallConfig, run

    ref, reads = synthetic
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(f">refA\n{ref.decode()}\n")
    reads_fq = tmp_path / "reads.fq"
    with open(reads_fq, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r.decode()}\n+\n{'I' * len(r)}\n")

    buf = io.StringIO()
    rc = run(
        CallConfig(ref_files=[str(ref_fa)], read_files=[str(reads_fq)], ks=(12,)),
        out=buf,
    )
    assert rc == 0
    out = buf.getvalue()

    # exact header bytes incl. the KD/KC mismatch and RD+OD one-liner
    assert out.startswith(
        "##fileformat=VCF4.2\n##source=rkmh\n"
        f"##reference={ref_fa}\n"
        '##INFO=<ID=KD,Number=1,Type=Integer,'
    )
    assert 'Description="Average depth in region">##INFO=<ID=OD' in out

    depth_map = oracle.read_depth_map(reads, 12)
    want_calls, _ = oracle.call_variants("refA", ref, depth_map, 12, 100)
    body = [l for l in out.splitlines() if not l.startswith("##")]
    want_body = [
        f"{key}\t99\tPASS\tKC={v[0]};MD={v[1]};RD={v[2]};OD={v[3]}"
        for key, v in sorted(want_calls.items())
    ]
    assert body == want_body


def test_call_show_depth(tmp_path, synthetic):
    from rkmh_tpu.commands.call_cmd import CallConfig, run

    ref, reads = synthetic
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(f">refA\n{ref.decode()}\n")
    reads_fq = tmp_path / "reads.fq"
    with open(reads_fq, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r.decode()}\n+\n{'I' * len(r)}\n")

    buf = io.StringIO()
    run(
        CallConfig(ref_files=[str(ref_fa)], read_files=[str(reads_fq)],
                   ks=(12,), show_depth=True),
        out=buf,
    )
    lines = buf.getvalue().splitlines()
    P = len(ref) - 12 + 1
    assert len(lines) == P
    depth_map = oracle.read_depth_map(reads, 12)
    _, rows = oracle.call_variants("refA", ref, depth_map, 12, 100)
    for j, (a, d, r) in enumerate(rows):
        shown = r if r > 0 else d
        assert lines[j] == f"{j}\t{a}\t{d}\t{shown}"


def test_call_on_zika_slice():
    """Real data smoke: truncated zika genome vs the z1 read set."""
    from rkmh_tpu.commands.call_cmd import CallConfig, run
    from rkmh_tpu.io.fastx import read_fastx
    import tempfile, os

    zika = read_fastx(f"{DATA}/zika.fa")[0]
    reads = [r.seq for r in read_fastx(f"{DATA}/z1.fq")]
    ref_seq = zika.seq[:1500]

    with tempfile.TemporaryDirectory() as td:
        ref_fa = os.path.join(td, "ref.fa")
        with open(ref_fa, "w") as fh:
            fh.write(f">zslice\n{ref_seq.decode()}\n")
        buf = io.StringIO()
        rc = run(
            CallConfig(ref_files=[ref_fa], read_files=[f"{DATA}/z1.fq"], ks=(16,)),
            out=buf,
        )
    assert rc == 0
    body = [l for l in buf.getvalue().splitlines() if not l.startswith("##")]

    depth_map = oracle.read_depth_map(reads, 16)
    want_calls, _ = oracle.call_variants("zslice", ref_seq, depth_map, 16, 100)
    want_body = [
        f"{key}\t99\tPASS\tKC={v[0]};MD={v[1]};RD={v[2]};OD={v[3]}"
        for key, v in sorted(want_calls.items())
    ]
    assert body == want_body


def test_hashmap_build_scales_without_doubling():
    """The vectorized cuckoo build must place a large key set at load
    ~0.5 without the straggler walk timing out and forcing a table
    doubling (regression: a random-side walk bounced keys between their
    two slots and doubled 1M-key maps to 2x the memory)."""
    import numpy as np
    from rkmh_tpu.ops.hashmap import build_hash_map

    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, np.iinfo(np.uint64).max,
                                  size=200_000, dtype=np.uint64))
    vals = rng.integers(1, 100, size=len(keys)).astype(np.int32)
    from rkmh_tpu.utils import next_pow2

    hm = build_hash_map(keys, vals)
    assert len(hm.used) == next_pow2(2 * len(keys)), (
        f"table doubled spuriously: T={len(hm.used)} for n={len(keys)}")
    # every key retrievable with its value
    recon = (hm.hash_hi.astype(np.uint64) << np.uint64(32)) | hm.hash_lo.astype(np.uint64)
    d = {int(k): int(v) for k, v, u in zip(recon, hm.values, hm.used) if u}
    assert len(d) == len(keys)
    idx = rng.integers(0, len(keys), size=512)
    for k, v in zip(keys[idx].tolist(), vals[idx].tolist()):
        assert d[k] == v


def test_call_devices_parity(tmp_path):
    """call --devices: the position-sharded scan (k-halo slices +
    window_len depth halo over ppermute) is byte-identical to the
    single-device VCF on real data, in both VCF and -d depth modes;
    genomes too short for the per-device window fall back, also
    byte-identical."""
    from rkmh_tpu.commands.call_cmd import CallConfig, run

    base = dict(ref_files=[f"{DATA}/hpv_16.fa"],
                read_files=[f"{DATA}/minION25.fq"], ks=(16,))
    for extra in ({}, {"show_depth": True}):
        single, sharded = io.StringIO(), io.StringIO()
        assert run(CallConfig(**base, **extra), out=single) == 0
        assert run(CallConfig(**base, **extra, devices=8), out=sharded) == 0
        assert sharded.getvalue() == single.getvalue(), extra
        assert single.getvalue()

    # tiny genome: P/devices < window_len -> single-device fallback
    ref = tmp_path / "tiny.fa"
    from rkmh_tpu.io.fastx import read_fastx

    seq = read_fastx(f"{DATA}/hpv_16.fa")[0].seq[:600]
    ref.write_text(f">tiny\n{seq.decode()}\n")
    single, sharded = io.StringIO(), io.StringIO()
    base_t = dict(ref_files=[str(ref)], read_files=[f"{DATA}/minION25.fq"],
                  ks=(16,))
    assert run(CallConfig(**base_t), out=single) == 0
    assert run(CallConfig(**base_t, devices=8), out=sharded) == 0
    assert sharded.getvalue() == single.getvalue()


# ---------------------------------------------------------------------------
# --resume: per-ref partial-aggregate checkpointing
# ---------------------------------------------------------------------------

def test_call_resume_after_injected_crash(tmp_path, monkeypatch):
    """Crash after 20 of 60 refs, resume, and the final VCF is
    byte-identical to an uninterrupted run (aggregation commutes; the
    .progress sidecar replays completed refs)."""
    from rkmh_tpu.commands.call_cmd import CallConfig, run
    from rkmh_tpu.commands.recovery import InjectedFailure

    D = "/root/reference/data"
    kw = dict(ref_files=[f"{D}/zika.refs.fa"], read_files=[f"{D}/z1.fq"],
              ks=(12,), window_len=50)

    clean = tmp_path / "clean.vcf"
    assert run(CallConfig(out_file=str(clean), **kw)) == 0

    crashed = tmp_path / "crashed.vcf"
    monkeypatch.setenv("RKMH_TPU_FAIL_AFTER_CHUNKS", "20")
    with pytest.raises(InjectedFailure):
        run(CallConfig(out_file=str(crashed), **kw))
    monkeypatch.delenv("RKMH_TPU_FAIL_AFTER_CHUNKS")
    assert not crashed.exists()          # died before the final write
    progress = tmp_path / "crashed.vcf.progress"
    assert progress.exists()

    assert run(CallConfig(out_file=str(crashed), resume=True, **kw)) == 0
    assert crashed.read_text() == clean.read_text()
    assert clean.read_text().count("\n") > 10


def test_call_resume_requires_out_file():
    from rkmh_tpu.commands.call_cmd import CallConfig, run

    D = "/root/reference/data"
    assert run(CallConfig(ref_files=[f"{D}/hpv_16.fa"],
                          read_files=[f"{D}/minION25.fq"],
                          ks=(16,), resume=True)) == 1
