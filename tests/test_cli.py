"""CLI wiring tests: every subcommand through the real argv surface.

Runs rkmh_tpu.cli.main() in-process (argparse -> config -> command), the
layer unit tests skip — this is where silently-dropped flags hide.
"""

import io
import json
import contextlib

import pytest

from rkmh_tpu.cli import main

DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    td = tmp_path_factory.mktemp("cli")
    refs = td / "refs.fa"
    refs.write_text(">r1\nACGTACGTACGTACGTACGTACGT\n>r2\nTTTTACGTACGTGGGGACGTCCCC\n")
    reads = td / "reads.fq"
    reads.write_text("@q1\nACGTACGTACGTACGT\n+\nIIIIIIIIIIIIIIII\n")
    empty = td / "empty.fa"
    empty.write_text("")
    return td, str(refs), str(reads), str(empty)


def run_cli(argv, stdin_text=None):
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        rc = main(argv)
    return rc, out.getvalue(), err.getvalue()


def test_cli_stream(tiny):
    td, refs, reads, _ = tiny
    rc, out, err = run_cli(["stream", "-r", refs, "-f", reads, "-k", "8", "-s", "16"])
    assert rc == 0
    assert out.count("\n") == 1 and out.startswith("r1\tq1\t")


def test_cli_classify_alias(tiny):
    td, refs, reads, _ = tiny
    rc, out, err = run_cli(["classify", "-r", refs, "-f", reads, "-k", "8", "-s", "16"])
    assert rc == 0 and "alias of stream" in err


def test_cli_stream_dead_flags_warn(tiny):
    td, refs, reads, _ = tiny
    rc, out, err = run_cli(["stream", "-r", refs, "-f", reads, "-k", "8", "-s", "16", "-z"])
    assert rc == 0 and "dead in rkmh" in err


def test_cli_filter_counter_size_forwarded(tiny):
    td, refs, reads, _ = tiny
    rc, out, err = run_cli(
        ["filter", "-r", refs, "-f", reads, "-k", "8", "-s", "16",
         "-M", "1", "--counter-size", "4096"]
    )
    assert rc == 0
    assert out.startswith(">q1\n")  # read passes, re-emitted as 4-line record


def test_cli_hash_and_kmers(tiny):
    td, refs, reads, _ = tiny
    rc, out, _ = run_cli(["hash", "-f", reads, "-k", "8"])
    assert rc == 0 and out.startswith("q1\t")
    rc, out, _ = run_cli(["hash", "-f", reads, "-k", "8", "-K"])
    assert rc == 0 and out.splitlines()[0] == "ACGTACGT\tq1"


def test_cli_hash_dead_flags_warn(tiny):
    td, refs, reads, _ = tiny
    rc, out, err = run_cli(["hash", "-f", reads, "-k", "8", "-M", "2"])
    assert rc == 0 and "dead in rkmh" in err


def test_cli_count_dump(tiny):
    td, refs, reads, _ = tiny
    rc, out, _ = run_cli(["count", "-f", reads, "-k", "8", "--counter-size", "512", "--dump"])
    assert rc == 0
    for line in out.splitlines():
        slot, n = line.split("\t")
        assert 0 <= int(slot) < 512 and int(n) >= 1


def test_cli_search(tiny, tmp_path):
    td, refs, reads, _ = tiny
    mers = tmp_path / "mers.txt"
    mers.write_text("ACGTACGT\n")
    rc, out, _ = run_cli(["search", "-r", str(mers), "-f", reads, "-k", "8"])
    assert rc == 0 and out.startswith("q1\tACGTACGT")


def test_cli_call(tiny):
    td, refs, reads, _ = tiny
    rc, out, _ = run_cli(["call", "-r", refs, "-f", reads, "-k", "8"])
    assert rc == 0 and out.startswith("##fileformat=VCF4.2")


def test_cli_metrics_flag(tiny):
    td, refs, reads, _ = tiny
    rc, out, err = run_cli(
        ["stream", "-r", refs, "-f", reads, "-k", "8", "-s", "16", "--metrics"]
    )
    assert rc == 0
    line = json.loads(err.strip().splitlines()[-1])
    assert line["command"] == "stream" and line["reads"] >= 1


def test_cli_empty_reads(tiny):
    td, refs, _, empty = tiny
    rc, out, _ = run_cli(["stream", "-r", refs, "-f", empty, "-k", "8", "-s", "16"])
    assert rc == 0 and out == ""
    rc, out, _ = run_cli(["filter", "-r", refs, "-f", empty, "-k", "8", "-s", "16"])
    assert rc == 0 and out == ""


def test_cli_ref_sketches_roundtrip(tiny, tmp_path, monkeypatch):
    td, refs, reads, _ = tiny
    monkeypatch.chdir(tmp_path)
    rc, *_ = run_cli(["hash", "-f", refs, "-k", "8", "-s", "16", "-o", "panel"])
    assert rc == 0
    rc1, out1, _ = run_cli(["stream", "-r", refs, "-f", reads, "-k", "8", "-s", "16"])
    rc2, out2, _ = run_cli(
        ["stream", "--ref-sketches", "panel.rkmh.json", "-f", reads, "-k", "8", "-s", "16"]
    )
    assert rc1 == rc2 == 0 and out1 == out2
    # rkmh's -R/--pre-references (parsed-but-dead upstream) is a live
    # alias for the same capability
    rc3, out3, _ = run_cli(
        ["stream", "-R", "panel.rkmh.json", "-f", reads, "-k", "8", "-s", "16"]
    )
    assert rc3 == 0 and out3 == out1
    # both given: --ref-sketches wins, with a warning
    rc4, out4, err4 = run_cli(
        ["stream", "-R", "nonexistent.json", "--ref-sketches",
         "panel.rkmh.json", "-f", reads, "-k", "8", "-s", "16"]
    )
    assert rc4 == 0 and out4 == out1 and "using --ref-sketches" in err4


def test_cli_reference_dead_flags_accepted(tiny, tmp_path, monkeypatch):
    """Every flag rkmh's getopt tables accept must parse here too —
    -F/-p/-q/-d (stream/filter) and -m/-T (hash) are dead in the
    reference (rkmh.cpp:744-769 commented out, 2040-2111 unused) but an
    rkmh invocation using them must not crash."""
    td, refs, reads, _ = tiny
    rc, out, err = run_cli(
        ["stream", "-r", refs, "-f", reads, "-k", "8", "-s", "16",
         "-F", "pre.fa", "-p", "rmap", "-q", "qmap", "-d"])
    assert rc == 0 and out.count("\n") == 1
    assert err.count("dead in rkmh") == 3
    rc, out, err = run_cli(
        ["filter", "-r", refs, "-f", reads, "-k", "8", "-s", "16",
         "-F", "pre.fa"])
    assert rc == 0 and "dead in rkmh" in err
    rc, out, err = run_cli(["hash", "-f", reads, "-k", "8", "-m", "-T"])
    assert rc == 0 and err.count("dead in rkmh") == 2
    monkeypatch.chdir(tmp_path)  # hpv16 writes its .tst side-effect to cwd
    rp = td / "hpv_refpath"
    rp.mkdir(exist_ok=True)
    (rp / "all_pave_ref.fa").write_text(">HPV16|X|t1\nACGTACGTACGTACGTACGTACGT\n")
    (rp / "new_refs.fa").write_text(">A1\nACGTACGTACGTACGTACGTACGT\n>B1\nTTTTACGTACGTGGGGACGTCCCC\n")
    rc, out, err = run_cli(["hpv16", "-f", reads, "-R", str(rp), "-k", "8",
                            "-s", "16", "-N", "3", "-D", "1"])
    assert rc == 0 and "hpv16 -N/-D" in err


def test_cli_hash_json_stdout(tiny):
    td, refs, reads, _ = tiny
    rc, out, _ = run_cli(["hash", "-f", reads, "-k", "8", "-s", "4", "--json"])
    assert rc == 0
    data = json.loads(out)
    assert data[0]["hash_type"] == "MurmurHash3_x64_128"
    assert len(data[0]["sketches"]) <= 4


def test_cli_missing_file_clean_error(capsys):
    from rkmh_tpu.cli import main

    rc = main(["stream", "-r", "/nonexistent/refs.fa", "-f", "/nonexistent/reads.fq",
               "-k", "12"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "nonexistent" in err and "Traceback" not in err


def test_cli_stream_in_stream(tiny, monkeypatch):
    """stream -i classifies stdin (live here; dead in the reference)."""
    import sys
    import types

    td, refs, reads, _ = tiny
    fq = open(reads, "rb").read()
    monkeypatch.setattr(
        sys, "stdin", types.SimpleNamespace(buffer=io.BytesIO(fq))
    )
    rc, out, err = run_cli(["stream", "-r", refs, "-i", "-k", "8", "-s", "16"])
    assert rc == 0 and "dead in rkmh" not in err
    rc2, out2, _ = run_cli(["stream", "-r", refs, "-f", reads, "-k", "8", "-s", "16"])
    assert out == out2 and out.count("\n") == 1
