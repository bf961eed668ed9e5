"""Shipped model_docker artifacts: the 4 trained VW models + run_models.sh.

The reference distributes 4 pre-trained models applied by
model_docker/run_models.sh (run_models.sh:3-10); this repo ships the
equivalent .npz artifacts (scripts/train_models.py).  These tests hold
the artifacts to their job: held-out simulated samples (different seed
than training) must score correctly with ZERO training steps, and the
shell script itself must run end to end.
"""

import io
import os
import stat
import subprocess
import sys

import numpy as np
import pytest

DATA = "/root/reference/data"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELDIR = os.path.join(REPO, "model_docker")

pytestmark = pytest.mark.slow

_COMP = bytes.maketrans(b"ACGT", b"TGCA")


def _simulate(seq, n, rng, read_len=900, err=0.03):
    arr = np.frombuffer(seq, np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = []
    for _ in range(n):
        s = int(rng.integers(0, max(1, len(arr) - read_len)))
        r = arr[s : s + read_len].copy()
        ne = rng.binomial(len(r), err)
        if ne:
            pos = rng.choice(len(r), size=ne, replace=False)
            r[pos] = bases[rng.integers(0, 4, size=ne)]
        b = r.tobytes()
        if rng.random() < 0.5:
            b = b.translate(_COMP)[::-1]
        out.append(b)
    return out


@pytest.fixture(scope="module")
def refs():
    from rkmh_tpu.io.fastx import read_fastx

    return {r.name: r.seq for r in read_fastx(f"{DATA}/new_refs.fa")}


def _sample_vw(tmp_path, name, seqs):
    """reads -> stream vs new_refs.fa -> vwize --format stream line."""
    from rkmh_tpu.commands.stream import StreamConfig, run
    from rkmh_tpu.scripts.vwize import main as vwize

    fq = tmp_path / f"{name}.fq"
    with open(fq, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@{name}_{i}\n{s.decode()}\n+\n{'I' * len(s)}\n")
    buf = io.StringIO()
    assert run(StreamConfig(ref_files=[f"{DATA}/new_refs.fa"],
                            read_files=[str(fq)], ks=(18,),
                            sketch_size=4000), out=buf) == 0
    rk = tmp_path / f"{name}.rk"
    rk.write_text(buf.getvalue())
    out = io.StringIO()
    assert vwize(argv=["-n", "--format", "stream",
                       "-s", "A1", "A2", "A3", "A4", "B1", "B2", "C1",
                       "D1", "D2", "D3", "-i", str(rk), "-C", "0"],
                 stdout=out) == 0
    return out.getvalue()


def _predict(model, vw_text):
    from rkmh_tpu.ml.wabbit import main as wabbit

    out = io.StringIO()
    rc = wabbit(argv=["-", "-i", os.path.join(MODELDIR, model), "-t",
                      "-p", "/dev/stdout"],
                stdin=io.StringIO(vw_text), stdout=out)
    assert rc == 0
    return [float(l.split()[0]) for l in out.getvalue().splitlines() if l]


REF_BLOBS = "/root/reference/model_docker"
_BLOBS = {
    "coinf_binary": "hpv16.k18.s4000.coinf.binary.model",
    "coinf_interactions": "hpv16.k18.s4000.coinf.interactions.binary.model",
    "lineage_ect": "hpv.k18.s4000.lineage.ect.model",
    "sublineage_ect": "hpv16.k18.s4000.sublineage.ect.model",
}

_needs_blobs = pytest.mark.skipif(
    not os.path.isdir(REF_BLOBS), reason="reference model blobs not mounted")


def test_murmur32_golden_vectors():
    """Public MurmurHash3_x86_32 test vectors (the hash vw uses for
    namespaces and non-numeric feature names)."""
    from rkmh_tpu.ml.vw_model import murmur3_x86_32

    assert murmur3_x86_32(b"", 0) == 0
    assert murmur3_x86_32(b"", 1) == 0x514E28B7
    assert murmur3_x86_32(b"hello", 0) == 0x248BFA47
    assert murmur3_x86_32(b"hello, world", 0) == 0x149BBB7F
    assert murmur3_x86_32(
        b"The quick brown fox jumps over the lazy dog", 0x9747B28C
    ) == 0x2FA826CD


@_needs_blobs
def test_vw_blob_headers_and_layout():
    """All 4 reference blobs parse: 8.3.1 headers, 18-bit space, the
    expected reduction kind/wpp, and the structural fingerprints of the
    interleaved slot layout (ect4 leaves residue 3 (mod 4) empty; the
    vv-interactions model is exactly the dense 0..2^18-1 sequence)."""
    from rkmh_tpu.ml.vw_model import is_vw_model, load_vw_model

    want = {
        "coinf_binary": ("binary", 0, 1, []),
        "coinf_interactions": ("binary", 0, 1, ["vv"]),
        "lineage_ect": ("ect", 4, 4, []),
        "sublineage_ect": ("ect", 9, 8, []),
    }
    for key, fname in _BLOBS.items():
        path = os.path.join(REF_BLOBS, fname)
        assert is_vw_model(path), fname
        m = load_vw_model(path)
        kind, k, wpp, inter = want[key]
        assert (m.version, m.bits) == ("8.3.1", 18), fname
        assert (m.kind, m.ect_k, m.wpp, m.interactions) == \
            (kind, k, wpp, inter), fname
        nz = np.nonzero(m.weights)[0]
        if key == "coinf_interactions":
            assert len(nz) == 1 << 18  # dense: every slot nonzero
        if key == "lineage_ect":
            # 3 problems interleaved at wpp=4: residue 3 must be empty
            assert not np.any(nz % 4 == 3)
    # and an npz model must NOT sniff as a vw blob
    assert not is_vw_model(os.path.join(MODELDIR, "coinf_binary.npz"))


@_needs_blobs
def test_vw_constant_slot_nonzero_validates_hashing():
    """vw always updates the constant feature, so slot
    (11650396 * wpp + p) mod 2^18 must be nonzero in EVERY blob at EVERY
    problem offset — 8 independent ~0.2-0.5-probability events under a
    wrong constant/layout, so jointly this pins both the constant index
    and the interleaved slot formula."""
    from rkmh_tpu.ml.vw_model import CONSTANT_FEATURE, load_vw_model

    for fname in _BLOBS.values():
        m = load_vw_model(os.path.join(REF_BLOBS, fname))
        mask = (1 << m.bits) - 1
        for p in range(m.num_problems):
            slot = (CONSTANT_FEATURE * m.wpp + p) & mask
            assert m.weights[slot] != 0, (fname, p)


@_needs_blobs
def test_vw_blob_predictions_and_npz_agreement(tmp_path, refs):
    """The 4 shipped reference blobs drive predictions end to end (the
    run_models.sh:3-10 pipeline: per-read k=18 s=4000 wabbit vectors ->
    vw model), deterministically and in range; agreement with the
    npz-trained models on the same samples is recorded as a confusion
    summary.  (The blobs' nonzero features are dominated by
    sample-specific sequencing-error k-mers of the reference's own
    unpublished minION runs — measured chance-level feature overlap
    with the bundled data, PARITY.md — so label agreement is reported,
    not asserted.)"""
    import io as _io

    from rkmh_tpu.commands.hash_cmd import HashConfig
    from rkmh_tpu.commands.hash_cmd import run as hash_run
    from rkmh_tpu.ml.wabbit import main as wabbit

    rng = np.random.default_rng(5)
    fq = tmp_path / "b1.fq"
    with open(fq, "w") as fh:
        for i, s in enumerate(_simulate(refs["B1"], 40, rng)):
            fh.write(f"@r{i}\n{s.decode()}\n+\n{'I' * len(s)}\n")
    wab = _io.StringIO()
    assert hash_run(HashConfig(read_files=[str(fq)], ks=(18,),
                               sketch_size=4000, wabbitize=True),
                    out=wab) == 0
    wab_text = wab.getvalue()
    assert len(wab_text.splitlines()) == 40

    blob_preds = {}
    for key, fname in _BLOBS.items():
        out = _io.StringIO()
        rc = wabbit(argv=["-", "-i", os.path.join(REF_BLOBS, fname),
                          "-t", "-p", "/dev/stdout"],
                    stdin=_io.StringIO(wab_text), stdout=out)
        assert rc == 0, key
        vals = [float(l.split()[0]) for l in out.getvalue().splitlines()]
        assert len(vals) == 40, key
        if key.endswith("_ect"):
            k = {"lineage_ect": 4, "sublineage_ect": 9}[key]
            assert all(v == int(v) and 1 <= v <= k for v in vals), key
        else:
            assert all(np.isfinite(v) for v in vals), key
        # deterministic re-run
        out2 = _io.StringIO()
        assert wabbit(argv=["-", "-i", os.path.join(REF_BLOBS, fname),
                            "-t", "-p", "/dev/stdout"],
                      stdin=_io.StringIO(wab_text), stdout=out2) == 0
        assert out2.getvalue() == out.getvalue(), key
        blob_preds[key] = vals

    # sample-level agreement record vs the npz models (count-feature
    # pipeline) on the same sample
    sample_vw = _sample_vw(tmp_path, "b1agree", _simulate(refs["B1"], 60, rng))
    agree = {}
    for key in _BLOBS:
        npz_pred = _predict(f"{key}.npz", sample_vw)[0]
        vals = blob_preds[key]
        if key.endswith("_ect"):
            from collections import Counter

            blob_label = Counter(int(v) for v in vals).most_common(1)[0][0]
        else:
            blob_label = 1 if np.mean(vals) > 0 else -1
            npz_pred = 1 if npz_pred > 0 else -1
        agree[key] = (blob_label, npz_pred, blob_label == npz_pred)
    sys.stderr.write(f"blob-vs-npz agreement (label, npz, match): {agree}\n")


def test_models_exist():
    for m in ("coinf_binary", "coinf_interactions", "lineage_ect",
              "sublineage_ect"):
        assert os.path.exists(os.path.join(MODELDIR, f"{m}.npz")), m


def test_shipped_models_score_heldout_samples(tmp_path, refs):
    rng = np.random.default_rng(7)  # NOT the training seed
    # single-strain samples from two different lineages + one mix
    a1 = _sample_vw(tmp_path, "a1single", _simulate(refs["A1"], 150, rng))
    d3 = _sample_vw(tmp_path, "d3single", _simulate(refs["D3"], 150, rng))
    mix = _sample_vw(
        tmp_path, "mix",
        _simulate(refs["A1"], 90, rng) + _simulate(refs["C1"], 60, rng))

    # plain linear coinf model: a linear function of normalized strain
    # proportions scores a mix BETWEEN its component singles, so it can
    # reject singles but cannot reliably flag mixes — the structural
    # reason the reference ships the --interactions variant alongside it.
    pa, pd = (_predict("coinf_binary.npz", t)[0] for t in (a1, d3))
    assert pa < 0 and pd < 0, (pa, pd)              # singles -> not coinf

    # quadratic (vv) interactions give the A1xC1 cross term: both calls
    pa, pd, pm = (_predict("coinf_interactions.npz", t)[0]
                  for t in (a1, d3, mix))
    assert pa < 0 and pd < 0, (pa, pd)
    assert pm > 0, pm

    # lineage ECT: classes A=1 .. D=4, coinfected=5
    assert _predict("lineage_ect.npz", a1)[0] == 1
    assert _predict("lineage_ect.npz", d3)[0] == 4
    assert _predict("lineage_ect.npz", mix)[0] == 5
    # sublineage ECT: A1=1 ... D3=10, coinfected=11
    assert _predict("sublineage_ect.npz", a1)[0] == 1
    assert _predict("sublineage_ect.npz", d3)[0] == 10
    assert _predict("sublineage_ect.npz", mix)[0] == 11


def test_run_models_sh_end_to_end(tmp_path, refs):
    """The shell artifact itself: zero-training application of the
    shipped models, via PATH shims for the console entry points."""
    rng = np.random.default_rng(11)
    fq = tmp_path / "sample.fq"
    seqs = _simulate(refs["B1"], 120, rng)
    with open(fq, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@r{i}\n{s.decode()}\n+\n{'I' * len(s)}\n")

    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    shims = {
        "rkmh-tpu": "from rkmh_tpu.cli import main",
        "rkmh-tpu-vwize": "from rkmh_tpu.scripts.vwize import main",
        "rkmh-tpu-wabbit": "from rkmh_tpu.ml.wabbit import main",
    }
    for name, imp in shims.items():
        sh = bin_dir / name
        sh.write_text(f"#!{sys.executable}\nimport sys\nsys.path.insert(0, {REPO!r})\n"
                      f"{imp}\nraise SystemExit(main())\n")
        sh.chmod(sh.stat().st_mode | stat.S_IEXEC)

    env = dict(os.environ,
               PATH=f"{bin_dir}:{os.environ['PATH']}",
               JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        ["bash", os.path.join(MODELDIR, "run_models.sh"), str(fq), DATA],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=1200,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    outlines = res.stdout.splitlines()
    for m in ("coinf_binary", "coinf_interactions", "lineage_ect",
              "sublineage_ect"):
        assert f"== {m} ==" in outlines, res.stdout
    # B1 single sample: binary says not-coinfected, lineage says B (2),
    # sublineage says B1 (5)
    preds = {}
    for i, l in enumerate(outlines):
        if l.startswith("== "):
            preds[l.strip("= ")] = float(outlines[i + 1].split()[0])
    assert preds["coinf_binary"] < 0
    assert preds["lineage_ect"] == 2
    assert preds["sublineage_ect"] == 5
