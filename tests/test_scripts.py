"""Post-processing script suite (rkmh_tpu.scripts) — unit + e2e."""

import argparse
import os
import io
import json

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# score_real_classification
# ---------------------------------------------------------------------------

def _hpv_line(name, match, total, lin, sub, lin_counts, sub_counts):
    lins = "".join(f"{n}:{s};" for n, s in lin)
    subs = "".join(f"{n}:{s};" for n, s in sub)
    lc = "".join(f"{c};" for c in lin_counts)
    sc = "".join(f"{c};" for c in sub_counts)
    return f"{name}\ttypeX\t{match}/{total}\t{lins}\t{subs}\t{lc}\t{sc}\n"


def test_score_real_basic():
    from rkmh_tpu.scripts.score_real_classification import main

    lin = [("A", 0.02), ("B", 0.0), ("C", 0.0), ("D", 0.0)]
    sub = [("A1", 0.01), ("A2", 0.0), ("B1", 0.0)]
    lines = [
        _hpv_line(f"r{i}", 100, 2000, lin, sub, [20, 0, 0, 0], [9, 0, 0])
        for i in range(4)
    ]
    # filtered out: too few kmers / too few matches
    lines.append(_hpv_line("short", 100, 30, lin, sub, [20, 0, 0, 0], [9, 0, 0]))
    lines.append(_hpv_line("weak", 5, 2000, lin, sub, [20, 0, 0, 0], [9, 0, 0]))

    out = io.StringIO()
    main(stdin=io.StringIO("".join(lines)), stdout=out, stderr=io.StringIO())
    fields = out.getvalue().split()
    assert fields[0] == "A:1.0"
    assert fields[1] == "A1:1.0"
    assert fields[2] == "A1:4"
    assert fields[3] == "WARN:low_lineage_counts:4"


def test_score_real_ambiguous_and_mismatch():
    from rkmh_tpu.scripts.score_real_classification import main

    # two lineages above threshold -> the FIRST still wins (the reference
    # breaks out but keeps l_match; its reset is commented out, l.40-42)
    lin = [("A", 0.02), ("B", 0.02), ("C", 0.0), ("D", 0.0)]
    sub = [("A1", 0.01), ("B1", 0.0)]
    ambiguous = _hpv_line("amb", 100, 2000, lin, sub, [20, 20, 0, 0], [9, 0])

    # lineage D but top sublineage A1, second D1 strong -> corrected to D1
    lin2 = [("D", 0.03), ("A", 0.0), ("B", 0.0), ("C", 0.0)]
    sub2 = [("A1", 0.02), ("D1", 0.01), ("B1", 0.0)]
    mism = _hpv_line("mis", 100, 2000, lin2, sub2, [30, 0, 0, 0], [9, 8, 0])

    out, err = io.StringIO(), io.StringIO()
    main(stdin=io.StringIO(ambiguous + mism), stdout=out, stderr=err)
    fields = out.getvalue().split()
    assert fields[0] == "A:0.5;D:0.5"    # ambiguous read votes its first lineage
    assert fields[1] == "D1:0.5;A1:0.5" or fields[1] == "A1:0.5;D1:0.5"
    assert "mistmatch" in err.getvalue()  # reference's typo'd log line


# ---------------------------------------------------------------------------
# score_test_data / crunch_score truth parsing
# ---------------------------------------------------------------------------

def test_truth_from_filename():
    from rkmh_tpu.scripts.score_test_data import truth_from_filename

    t = truth_from_filename("1088_D3_0-0.25_C_0-0.20_A4_0-0.54_4941_.fq")
    assert t["D3"] == 0.25 and t["C1"] == 0.20 and t["A4"] == 0.54
    assert t["B1"] == 0.0


def test_score_test_data(tmp_path):
    from rkmh_tpu.scripts.score_test_data import main

    name = "1000_A1_0-0.7_D3_0-0.3_500_.fq"
    p = tmp_path / name
    lines = []
    for i in range(70):
        lines.append(f"r{i}\tT\t10/100\tA:0.02;B:0;C:0;D:0;\tA1:0.02;D3:0;\t1;\t1;\n")
    for i in range(30):
        lines.append(f"s{i}\tT\t10/100\tD:0.02;A:0;B:0;C:0;\tD3:0.02;A1:0;\t1;\t1;\n")
    p.write_text("".join(lines))

    out = io.StringIO()
    main(argv=[str(p)], stdout=out)
    f = out.getvalue().split()
    assert f[0] == "True" and f[1] == "True" and f[2] == "False"  # primary/secondary/flipped


def test_crunch_score(tmp_path):
    from rkmh_tpu.scripts.crunch_score import main

    name = "1000_A1_0-0.6_B2_0-0.4_200_.score"
    p = tmp_path / name
    p.write_text("A1 0.55\nB2 0.45\nC1 0.0\n")
    out = io.StringIO()
    main(argv=[str(p)], stdout=out)
    lines = out.getvalue().splitlines()
    assert lines[0].startswith("A1 0.6 0.55")
    assert lines[1].startswith("B2 0.4 0.45")
    assert abs(float(lines[-1]) - 0.1) < 1e-9


# ---------------------------------------------------------------------------
# process_cls + score_cls chain
# ---------------------------------------------------------------------------

def test_process_and_score_cls(tmp_path):
    from rkmh_tpu.scripts.process_cls import main as process
    from rkmh_tpu.scripts.score_cls import main as score

    cls = tmp_path / "x.cls"
    rows = []
    for i in range(8):
        rows.append(f"gi|1|A1_read{i}|x\tT\tA1:0.02;B1:0;\tA1:0.02;B1:0;\n")
    rows.append("gi|1|rand_read|x\tT\tA1:0.02;\tA1:0.02;\n")  # skipped
    cls.write_text("".join(rows))

    buf = io.StringIO()
    process(argv=[str(cls)], stdout=buf)
    processed = buf.getvalue()
    assert len(processed.splitlines()) == 8
    assert processed.splitlines()[0] == "A1 A1:0.02 A1:0.02"

    out = io.StringIO()
    score(stdin=io.StringIO(processed), stdout=out)
    text = out.getvalue()
    assert "A1 1.0 1.0" in text
    assert "Estimated sublineage composition" in text


# ---------------------------------------------------------------------------
# VW chain: vwize -> collapse; json_to_wabbit; conf_mat; interpret
# ---------------------------------------------------------------------------

def test_vwize_and_collapse(tmp_path):
    from rkmh_tpu.scripts.vwize import main as vwize
    from rkmh_tpu.scripts.collapse_subtypes import collapse_line

    f = tmp_path / "A1_sample.cls"
    f.write_text(
        "Sample: r\tResult: A1\ty\n" * 3 + "Sample: r\tResult: B1\ty\n"
    )
    out = io.StringIO()
    vwize(argv=["-i", str(f), "-C", "0", "-s", "A1", "B1"], stdout=out)
    line = out.getvalue().strip()
    assert line.startswith("-1 1.0 'hpv |vir")
    assert "A1:3" in line and "B1:1" in line

    collapsed = collapse_line(line)
    assert "A:0.75" in collapsed and "B:0.25" in collapsed


def test_json_to_wabbit(tmp_path):
    from rkmh_tpu.scripts.json_to_wabbit import main

    f = tmp_path / "s.json"
    f.write_text(json.dumps([{"name": "a|b", "sketches": [11, 22, 22]}]))
    out = io.StringIO()
    main(argv=["-i", str(f), "-c", "-k"], stdout=out)
    assert out.getvalue().strip() == "1 1.0 `a_b |f 11:1 22:2"


def test_conf_mat(tmp_path):
    from rkmh_tpu.scripts.conf_mat import main

    f = tmp_path / "preds.txt"
    f.write_text("1.5 hpv\n-0.3 hpv\n-2.0 coinf\n0.7 coinf\n")
    out = io.StringIO()
    main(argv=[str(f)], stdout=out)
    lines = out.getvalue().splitlines()
    assert lines[0] == "status correct"
    assert sorted(lines[1:]) == sorted(
        ["pure correct", "pure incorrect", "coinf correct", "coinf incorrect"]
    )


def test_interpret_wabbit(tmp_path):
    from rkmh_tpu.scripts.interpret_wabbit import main

    f = tmp_path / "logits.txt"
    f.write_text("2.0 sampleA\n-1.0 sampleB\n")
    out = io.StringIO()
    main(argv=["-i", str(f), "-T", "BINARY"], stdout=out)
    lines = out.getvalue().splitlines()
    assert lines[0].startswith("STATUS:COINF. Sample sampleA")
    assert lines[1].startswith("STATUS:PURE. Sample sampleB")


# ---------------------------------------------------------------------------
# make_mix + quant
# ---------------------------------------------------------------------------

def test_make_mix_random(tmp_path, monkeypatch):
    from rkmh_tpu.scripts.make_mix import main
    from rkmh_tpu.io.fastx import read_fastx

    rng = np.random.default_rng(5)
    for label in ("A1", "B1"):
        with open(tmp_path / f"{label}.fq", "w") as fh:
            for i in range(200):
                seq = "".join(np.random.default_rng(i).choice(list("ACGT"), 60))
                fh.write(f"@{label}_{i}\n{seq}\n+\n{'I' * 60}\n")
    table = tmp_path / "strains.tsv"
    table.write_text(f"A1\t{tmp_path}/A1.fq\nB1\t{tmp_path}/B1.fq\n")

    monkeypatch.chdir(tmp_path)
    rc = main(argv=["--random", str(table), "-n", "2", "-l", "500", "-m", "100"])
    assert rc == 0
    mixes = sorted(tmp_path.glob("*_.fq"))
    assert len(mixes) == 2
    recs = read_fastx(str(mixes[0]))
    assert recs, "mix file should contain reads"
    # filename encodes the truth score_test_data can parse
    from rkmh_tpu.scripts.score_test_data import truth_from_filename

    truth = truth_from_filename(mixes[0].name)
    assert abs(sum(truth.values()) - 1.0) < 1e-6


def test_quant_by_ref():
    from rkmh_tpu.scripts.quant import main

    data = "refA\tr1\t5\t1000\t\t\nrefA\tr2\t6\t1000\t\t\nrefB\tr3\t1\t1000FAIL:DEPTH\t\t\n"
    out = io.StringIO()
    main(argv=["-", "--by-ref"], stdin=io.StringIO(data), stdout=out)
    lines = out.getvalue().splitlines()
    assert lines == ["2\trefA\t1"]  # FAIL line excluded


# ---------------------------------------------------------------------------
# e2e: hpv16 output -> score_real_classification
# ---------------------------------------------------------------------------

def test_e2e_hpv16_to_sample_score(tmp_path, monkeypatch):
    """Real minION reads through hpv16, piped into the sample scorer."""
    from rkmh_tpu.commands.hpv16_cmd import Hpv16Config, run
    from rkmh_tpu.scripts.score_real_classification import main as score

    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    rc = run(
        Hpv16Config(read_files=["/root/reference/data/minION25.fq"],
                    refpath="/root/reference/data", ks=(16,), batch_size=32),
        out=buf,
    )
    assert rc == 0
    assert len(buf.getvalue().splitlines()) == 25

    out, err = io.StringIO(), io.StringIO()
    score(stdin=io.StringIO(buf.getvalue()), stdout=out, stderr=err)
    fields = out.getvalue().split()
    assert len(fields) == 5
    # 25 reads -> low-count warnings, and some lineage got votes
    assert fields[3].startswith("WARN:low_lineage_counts:")
    assert ":" in fields[0]


def test_cwl_generator_matches_checked_in_tools():
    """cwl/make_tool.py is the Rmd-equivalent tool-object generator
    (reference cwl/rkmh.Rmd builds its CWL JSON programmatically); the
    checked-in tool files must be exactly its output."""
    import importlib.util
    import json as _json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "cwl_make_tool", os.path.join(repo, "cwl", "make_tool.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cmds = sorted(c for c in mod.TOOLS if c != "stream")
    assert cmds == ["call", "classify", "count", "filter", "hash",
                    "hpv16", "search"]
    for cmd in cmds:
        path = os.path.join(repo, "cwl", f"rkmh_tpu_{cmd}.json")
        with open(path) as fh:
            assert _json.load(fh) == mod.make_tool(cmd), cmd
    # every wrapped base command must exist on the real CLI surface
    from rkmh_tpu.cli import build_parser

    parser = build_parser()
    (sub,) = [a for a in parser._actions
              if isinstance(a, argparse._SubParsersAction)]
    for cmd in cmds:
        base = mod.TOOLS[cmd]["base"]
        assert base[0] == "rkmh-tpu" and base[1] in sub.choices, cmd
