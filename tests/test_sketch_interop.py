"""Mash / sourmash JSON sketch interop (io/sketch_json.py).

The reference *declares* "compatible with existing JSON output from
Mash and sourmash" (/root/reference/README.md:13) but its loader exits
unimplemented (rkmh.cpp:552-561).  Here the interop is real and tested
against an external-format fixture: sourmash's documented
`sourmash_signature` schema (hash_function 0.murmur64 == rkmh's
MurmurHash3_x64_128 low-64/seed-42/canonical scheme, so mins interop
bit-for-bit) and mash's `info -d` dump schema (which rkmh's
dump_hash_json mirrors per record, rkmh.cpp:489-525).
"""

import io
import json

import pytest

from rkmh_tpu.io.sketch_json import (
    SketchRecord,
    dump_sourmash,
    load_sketches,
)

FIXTURE = "tests/fixtures/sourmash_hpv16_slices.sig"


def test_sourmash_fixture_mins_match_oracle_hashing():
    """The checked-in .sig carries bottom-20 mins at k=21 for the first
    2000 bp of the A1/A2 sublineage genomes; re-sketching those slices
    with the oracle (SMHasher-golden murmur3, canonical, seed 42) must
    reproduce the mins exactly — the hashing schemes are identical, so
    a real sourmash sketch of the same sequence interops bit-for-bit."""
    from rkmh_tpu.io.fastx import read_fastx
    from rkmh_tpu.oracle import calc_hashes, minhashes

    with open(FIXTURE) as fh:
        recs = load_sketches(fh)
    assert [r.name for r in recs] == ["A1 first2000", "A2 first2000"]
    assert all(r.ks == [21] and r.sketch_size == 20 for r in recs)

    genomes = read_fastx("/root/reference/data/new_refs.fa")[:2]
    for r, g in zip(recs, genomes):
        mins = minhashes(calc_hashes(g.seq[:2000], 21), 20)
        assert r.hashes == sorted(int(m) for m in mins if m != 0)


def test_sourmash_fixture_builds_a_panel():
    from rkmh_tpu.io.sketch_json import panel_from_sketches

    with open(FIXTURE) as fh:
        panel = panel_from_sketches(load_sketches(fh))
    assert panel.num_refs == 2
    assert panel.keys == ["A1 first2000", "A2 first2000"]


def test_sourmash_roundtrip_and_refusals():
    recs = [SketchRecord("r1", [3, 5, 11], [16], 200, seq_len=100)]
    buf = io.StringIO()
    dump_sourmash(recs, buf)
    sig = json.loads(buf.getvalue())
    assert sig[0]["class"] == "sourmash_signature"
    assert sig[0]["signatures"][0]["seed"] == 42
    buf.seek(0)
    back = load_sketches(buf)
    assert back[0].hashes == [3, 5, 11]
    assert back[0].ks == [16] and back[0].sketch_size == 200

    # multi-k sketches interleave hashes across k — not representable
    with pytest.raises(ValueError, match="multi-k"):
        dump_sourmash([SketchRecord("r", [1], [12, 16], 10)], io.StringIO())

    # wrong hashing scheme is refused loudly, never silently mis-merged
    bad = sig[0] | {"hash_function": "0.murmur32"}
    with pytest.raises(ValueError, match="murmur64"):
        load_sketches(io.StringIO(json.dumps([bad])))
    bad = json.loads(buf.getvalue())
    bad[0]["signatures"][0]["seed"] = 13
    with pytest.raises(ValueError, match="seed 13"):
        load_sketches(io.StringIO(json.dumps(bad)))
    bad = json.loads(buf.getvalue())
    bad[0]["signatures"][0]["molecule"] = "protein"
    with pytest.raises(ValueError, match="protein"):
        load_sketches(io.StringIO(json.dumps(bad)))


def test_sourmash_scaled_signature_loads():
    sig = [{"class": "sourmash_signature", "hash_function": "0.murmur64",
            "name": "scaled", "signatures": [
                {"ksize": 31, "max_hash": 9999999, "num": 0, "seed": 42,
                 "mins": [7, 2, 5], "molecule": "dna"}]}]
    (rec,) = load_sketches(io.StringIO(json.dumps(sig)))
    assert rec.hashes == [2, 5, 7]
    assert rec.sketch_size == 3  # every retained hash participates


def test_mash_info_dump_loads():
    dump = {"kmer": 21, "alphabet": "ACGT", "preserveCase": False,
            "canonical": True, "sketchSize": 1000,
            "hashType": "MurmurHash3_x64_128", "hashBits": 64,
            "hashSeed": 42,
            "sketches": [
                {"name": "g1", "length": 1000, "comment": "",
                 "hashes": [9, 1, 4]},
                {"name": "g2", "length": 1000, "hashes": [8, 2]},
            ]}
    recs = load_sketches(io.StringIO(json.dumps(dump)))
    assert [(r.name, r.hashes, r.ks, r.sketch_size) for r in recs] == [
        ("g1", [1, 4, 9], [21], 1000), ("g2", [2, 8], [21], 1000)]

    with pytest.raises(ValueError, match="hashBits 32"):
        load_sketches(io.StringIO(json.dumps(dump | {"hashBits": 32})))
    with pytest.raises(ValueError, match="hashSeed 7"):
        load_sketches(io.StringIO(json.dumps(dump | {"hashSeed": 7})))


def test_hash_sourmash_flag_feeds_classify(tmp_path):
    """User loop: `hash --sourmash -o P` writes P.sig; `stream
    --ref-sketches P.sig` classifies byte-identically to sketching the
    refs directly — the external schema is a first-class panel source."""
    import io as _io

    from rkmh_tpu.commands.hash_cmd import HashConfig, run as run_hash
    from rkmh_tpu.commands.stream import StreamConfig, run as run_stream

    D = "/root/reference/data"
    prefix = str(tmp_path / "zika_refs")
    assert run_hash(HashConfig(read_files=[f"{D}/zika.refs.fa"], ks=(12,),
                               sketch_size=1000, sourmash_out=True,
                               out_prefix=prefix)) == 0
    sig_path = f"{prefix}.sig"
    with open(sig_path) as fh:
        assert json.load(fh)[0]["class"] == "sourmash_signature"

    direct, via_sig = _io.StringIO(), _io.StringIO()
    base = dict(read_files=[f"{D}/z1.fq"], ks=(12,), sketch_size=1000)
    assert run_stream(StreamConfig(**base, ref_files=[f"{D}/zika.refs.fa"]),
                      out=direct) == 0
    assert run_stream(StreamConfig(**base, ref_sketches=sig_path),
                      out=via_sig) == 0
    assert via_sig.getvalue() == direct.getvalue()
    assert direct.getvalue().count("\n") == 1000
