"""ML extension end to end: vwize -> wabbit train -> predict -> conf_mat.

The reference gates this pipeline on an external vw binary
(scripts/train_the_wabbit.sh, model_docker/run_models.sh:3-10); here the
clean-room jax trainer (rkmh_tpu.ml.wabbit) runs the whole loop in CI,
and a skip-if-absent test cross-checks format compatibility against a
real `vw` when one is on PATH.
"""

import io
import os
import random
import shutil
import subprocess
import sys

import pytest

from rkmh_tpu.ml import wabbit
from rkmh_tpu.scripts import vwize, conf_mat

STRAINS = ["A1", "A2", "B1", "B2", "C1", "D1"]


def _write_sample(path, rng, strains_present):
    """A fake per-read classification file: field 1 token 1 is the strain."""
    with open(path, "w") as f:
        for i in range(120):
            s = rng.choice(strains_present)
            f.write(f"read{i}\tx {s}\t40/2000\tmore\tstuff\n")


def _make_dataset(tmp_path, rng, n_pure, n_coinf, prefix):
    files, coinf_flags = [], []
    for i in range(n_pure):
        s = rng.choice(STRAINS)
        p = str(tmp_path / f"{s}_{prefix}_pure{i}.cls")
        _write_sample(p, rng, [s])
        files.append(p)
        coinf_flags.append(0)
    for i in range(n_coinf):
        a, b = rng.sample(STRAINS, 2)
        p = str(tmp_path / f"{a}_{prefix}_coinf{i}.cls")
        _write_sample(p, rng, [a, b])
        files.append(p)
        coinf_flags.append(1)
    return files, coinf_flags


def _vwize(files, flags, extra=()):
    out = io.StringIO()
    vwize.main(
        ["-i", *files, "-C", *[str(c) for c in flags], "-n",
         "-s", *STRAINS, *extra],
        stdout=out,
    )
    return out.getvalue()


def test_parse_example_formats():
    ex = wabbit.parse_example("1 1.0 'hpv |vir A1:0.5 B2:0.25")
    assert ex.label == 1.0 and ex.tag == "hpv"
    assert ex.namespaces == [("vir", [("A1", 0.5), ("B2", 0.25)])]
    ex = wabbit.parse_example("XYX 1.0 `k|vir 123:1 |sketch k:16 s:200")
    assert ex.label is None
    assert ex.namespaces[1] == ("sketch", [("k", 16.0), ("s", 200.0)])


def test_binary_coinf_train_apply_confmat(tmp_path):
    rng = random.Random(11)
    train_files, train_flags = _make_dataset(tmp_path, rng, 24, 24, "tr")
    test_files, test_flags = _make_dataset(tmp_path, rng, 10, 10, "te")

    train_vw = tmp_path / "train.vw"
    train_vw.write_text(_vwize(train_files, train_flags))
    test_vw = tmp_path / "test.vw"
    test_vw.write_text(_vwize(test_files, test_flags))

    model = str(tmp_path / "coinf.npz")
    preds = str(tmp_path / "preds.txt")
    assert wabbit.main(["-d", str(train_vw), "-f", model, "--passes", "80",
                        "--interactions", "vv"]) == 0
    assert wabbit.main(["-d", str(test_vw), "-i", model, "-t",
                        "-p", preds]) == 0

    margins = [float(l) for l in open(preds)]
    assert len(margins) == len(test_flags)
    correct = sum(
        (m > 0) == bool(c) for m, c in zip(margins, test_flags)
    )
    assert correct >= 18, (correct, margins)

    # conf_mat integration (its convention: positive logit = pure, label
    # token 'hpv' = pure / 'coinf' = coinfected)
    cm_in = tmp_path / "cm.txt"
    with open(cm_in, "w") as f:
        for m, c in zip(margins, test_flags):
            f.write(f"{-m} {'coinf' if c else 'hpv'}\n")
    out = io.StringIO()
    conf_mat.main([str(cm_in)], stdout=out)
    rows = out.getvalue().splitlines()
    assert rows[0] == "status correct"
    n_correct = sum(r.endswith(" correct") for r in rows[1:])
    assert n_correct == correct


def test_multiclass_ect_train_apply(tmp_path):
    rng = random.Random(5)
    # pure samples named <strain>_... -> lineage letter -> classes 1..4;
    # coinfected -> class 5 (scripts/vwize.py MULTICLASS map)
    train_files, train_flags = _make_dataset(tmp_path, rng, 32, 8, "tr")
    test_files, test_flags = _make_dataset(tmp_path, rng, 12, 3, "te")

    train_vw = tmp_path / "train.vw"
    train_vw.write_text(_vwize(train_files, train_flags, extra=["-M"]))
    test_vw = tmp_path / "test.vw"
    test_vw.write_text(_vwize(test_files, test_flags, extra=["-M"]))

    truth = [int(l.split()[0]) for l in open(test_vw)]
    model = str(tmp_path / "multi.npz")
    preds = str(tmp_path / "preds.txt")
    assert wabbit.main(["-d", str(train_vw), "-f", model, "--ect", "5",
                        "--passes", "120"]) == 0
    assert wabbit.main(["-d", str(test_vw), "-i", model, "-t",
                        "-p", preds]) == 0
    got = [int(l) for l in open(preds)]
    acc = sum(g == t for g, t in zip(got, truth)) / len(truth)
    assert acc >= 0.8, (acc, list(zip(got, truth)))


@pytest.mark.skipif(shutil.which("vw") is None,
                    reason="vowpal wabbit binary not on PATH")
def test_real_vw_accepts_our_vectors(tmp_path):
    """Format-compat cross-check against the actual vw binary when present
    (the reference's train_the_wabbit.sh invocation)."""
    rng = random.Random(3)
    files, flags = _make_dataset(tmp_path, rng, 8, 8, "tr")
    vwfile = tmp_path / "t.vw"
    vwfile.write_text(_vwize(files, flags))
    model = tmp_path / "m.vw"
    r = subprocess.run(
        ["vw", "--passes", "25", "--cache_file", str(tmp_path / "c"),
         "--binary", "--interactions", "vv", "-f", str(model),
         "-d", str(vwfile)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert model.exists()
