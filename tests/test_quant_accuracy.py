"""Closed-loop coinfection quantification accuracy.

The reference's de-facto acceptance harness: simulate read mixes at
known proportions (scripts/make_mix.py:33), classify with `hpv16`, and
score the estimated sublineage composition against the filename-encoded
truth with the published detection tolerances — primary detected iff
its estimate is > 5% and within 10% absolute of truth, secondary iff
within 10% absolute (/root/reference/scripts/score_test_data.py:86-87).
Format parity is pinned elsewhere (tests/golden); this closes the loop
on the *science*: the proportions themselves must come out right.
"""

import io
import os
import subprocess
import pytest
import sys

import numpy as np

from rkmh_tpu.io.fastx import read_fastx

DATA = "/root/reference/data"
READ_LEN = 400
STRIDE = 7  # ~1070 simulated reads per ~7.9kb genome — enough to
            # sample the largest mixes below without replacement


def _simulate_strain_reads(tmp_path, noise: float = 0.0, seed: int = 99):
    """Cut each of the 10 sublineage genomes (new_refs.fa, keys A1..D3)
    into READ_LEN windows, optionally with i.i.d. substitution noise.

    Measured collapse curve of the vote-count estimator (3 seed-11
    mixes per level, noise seed 99 — the round-5 sweep, recorded in
    PARITY.md): detections 3/3 at every level through 2%, mean summed
    |est-truth| 0.073 (clean) -> 0.085 (0.1%) -> 0.087 (0.3%) -> 0.081
    (0.5%) -> 0.104 (1%) -> 0.118 (2%).  (The recorded sweep drew
    replacements uniformly from ACGT, so its EFFECTIVE substitution
    rates are 0.75x those labels; this generator draws from the 3
    non-identity bases, so CI asserts TRUE rates — strictly harder
    than the sweep at the same label.)  The 50/50 saturation documented
    in round 4 (errors at SNP sites convert strain-A k-mers into
    strain-B's *unique* alleles until every read votes for both) needs
    ~5% noise to break the tolerances (a 95/5 C1/D2 mix scored 0.90
    there).  The reference's per-read voting is identical
    (rkmh.cpp:2656-2718), and its published accuracy is on real minION
    reads — the 0.3-1% regime asserted below is the realistic-noise
    claim, the 5% collapse the algorithm's boundary."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    table = tmp_path / "strains.tsv"
    with open(table, "w") as tfh:
        for rec in read_fastx(f"{DATA}/new_refs.fa"):
            strain = rec.name[:2]
            p = tmp_path / f"{strain}.reads.fq"
            with open(p, "w") as fh:
                g = np.frombuffer(rec.seq, np.uint8)
                for j, start in enumerate(
                        range(0, len(g) - READ_LEN + 1, STRIDE)):
                    r = g[start : start + READ_LEN]
                    if noise:
                        # TRUE substitutions: draw from the 3 non-identity
                        # bases (a uniform-ACGT draw would leave 1/4 of
                        # "error" sites unchanged, making the effective
                        # rate 0.75x nominal)
                        r = r.copy()
                        ne = rng.binomial(len(r), noise)
                        if ne:
                            pos = rng.choice(len(r), size=ne, replace=False)
                            # bases is ascending ASCII; non-ACGT chars
                            # clip to an arbitrary slot and still mutate
                            cur = np.clip(
                                np.searchsorted(bases, r[pos]), 0, 3)
                            r[pos] = bases[
                                (cur + rng.integers(1, 4, size=ne)) % 4]
                    seq = r.tobytes().decode()
                    fh.write(f"@{strain}_{j}\n{seq}\n+\n{'I' * len(seq)}\n")
            tfh.write(f"{strain}\t{p}\n")
    return table


def _score_mixes(tmp_path, mixes):
    """hpv16-classify + score each mix; returns the per-mix
    (correct_primary, primary_det, secondary_det, total_err) tuples."""
    from rkmh_tpu.commands.hpv16_cmd import Hpv16Config, run
    from rkmh_tpu.scripts import score_test_data

    rows = []
    for mix in mixes:
        cls = tmp_path / "cls" / mix
        os.makedirs(cls.parent, exist_ok=True)
        buf = io.StringIO()
        assert run(Hpv16Config(read_files=[mix], refpath=DATA, ks=(16,),
                               tst_file=False), out=buf) == 0
        with open(cls, "w") as fh:
            fh.write(buf.getvalue())
        sbuf = io.StringIO()
        assert score_test_data.main([str(cls)], stdout=sbuf) == 0
        toks = sbuf.getvalue().split()
        rows.append((toks[0] == "True", toks[3] == "True",
                     toks[4] == "True", float(toks[8]), sbuf.getvalue()))
    return rows


def test_simulated_mix_quantification_within_reference_tolerances(
        tmp_path, monkeypatch):
    from rkmh_tpu.scripts.make_mix import main as make_mix_main

    table = _simulate_strain_reads(tmp_path)
    monkeypatch.chdir(tmp_path)  # mixes + the .tst side-effect land here

    # -l 20 scales reads-per-coverage down (cov 1000..10000 -> <=800
    # reads/mix) so the CPU-mesh run stays test-sized; proportions and
    # the truth-encoding filename are untouched
    assert make_mix_main(argv=["--random", str(table), "-n", "3",
                               "-l", "20", "--seed", "11"]) == 0
    mixes = sorted(p for p in os.listdir(tmp_path) if p.endswith("_.fq"))
    assert len(mixes) == 3

    rows = _score_mixes(tmp_path, mixes)
    for mix, (cp, pd, sd, err, raw) in zip(mixes, rows):
        assert cp, (mix, raw)
        assert pd, (mix, raw)      # >5% and ±10% abs
        assert sd, (mix, raw)      # ±10% abs

    # composition error across all 10 sublineage bins, summed |est-truth|:
    # noise-free reads should land well inside the detection tolerances
    total_errs = [r[3] for r in rows]
    assert float(np.mean(total_errs)) < 0.25, total_errs


@pytest.mark.slow
@pytest.mark.parametrize("noise", [0.003, 0.01])
def test_quant_tolerances_hold_under_substitution_noise(
        tmp_path, monkeypatch, noise):
    """VERDICT r4 item 5: the reference's published accuracy is on real
    (noisy) minION reads, so 'clean reads only' was a weaker claim.
    Assert the passing regime measured in the round-5 sweep: at 0.3%
    and 1% i.i.d. substitution noise every detection tolerance still
    holds and the summed composition error stays in its measured
    envelope (0.087 / 0.104 means; see _simulate_strain_reads)."""
    from rkmh_tpu.scripts.make_mix import main as make_mix_main

    table = _simulate_strain_reads(tmp_path, noise=noise, seed=99)
    monkeypatch.chdir(tmp_path)
    assert make_mix_main(argv=["--random", str(table), "-n", "3",
                               "-l", "20", "--seed", "11"]) == 0
    mixes = sorted(p for p in os.listdir(tmp_path) if p.endswith("_.fq"))
    assert len(mixes) == 3
    rows = _score_mixes(tmp_path, mixes)
    for mix, (cp, pd, sd, err, raw) in zip(mixes, rows):
        assert cp and pd and sd, (noise, mix, raw)
    errs = [r[3] for r in rows]
    assert float(np.mean(errs)) < 0.20, (noise, errs)


@pytest.mark.slow
def test_ten_mix_sweep_continuously_verified(tmp_path, monkeypatch):
    """The ROUND4-recorded 10-mix sweep (seed 4), promoted from a
    one-time prose record into CI: 10 random 2-strain mixes must ALL
    pass the reference detection tolerances, with the summed
    composition error in the recorded envelope (round-4 measured mean
    0.057, max 0.167)."""
    from rkmh_tpu.scripts.make_mix import main as make_mix_main

    table = _simulate_strain_reads(tmp_path)
    monkeypatch.chdir(tmp_path)
    assert make_mix_main(argv=["--random", str(table), "-n", "10",
                               "-l", "20", "--seed", "4"]) == 0
    mixes = sorted(p for p in os.listdir(tmp_path) if p.endswith("_.fq"))
    assert len(mixes) == 10

    rows = _score_mixes(tmp_path, mixes)
    for mix, (cp, pd, sd, err, raw) in zip(mixes, rows):
        assert cp and pd and sd, (mix, raw)
    total_errs = [r[3] for r in rows]
    assert float(np.mean(total_errs)) < 0.12, total_errs
    assert float(np.max(total_errs)) < 0.30, total_errs


def test_quant_loop_cli_surface(tmp_path):
    """The same loop through the installed console entries (the user's
    path: rkmh-tpu-make-mix | rkmh-tpu hpv16 | rkmh-tpu-score-test-data),
    one explicit 70/30 A1/D3 mix via --sample-file."""
    table = _simulate_strain_reads(tmp_path)
    sample = tmp_path / "mix.tsv"
    paths = dict(line.split("\t") for line in
                 open(table).read().splitlines())
    with open(sample, "w") as fh:
        fh.write(f"A1\t0.7\t15\t{paths['A1']}\n"
                 f"D3\t0.3\t15\t{paths['D3']}\n\n")

    env = {**os.environ, "JAX_PLATFORMS": "cpu",  # cpu: PYTHONPATH is safe
           "PYTHONPATH": "/root/repo",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    r = subprocess.run(
        [sys.executable, "-m", "rkmh_tpu.scripts.make_mix",
         "-i", str(sample), "-l", "1000"],
        cwd=tmp_path, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    (mix,) = [p for p in os.listdir(tmp_path) if p.endswith("_.fq")]
    assert mix.startswith("15_A1_0-0.7_D3_0-0.3_")

    cls = tmp_path / "out" / mix
    os.makedirs(cls.parent, exist_ok=True)
    r = subprocess.run(
        [sys.executable, "-m", "rkmh_tpu.cli", "hpv16", "-f", mix,
         "-R", DATA, "-k", "16", "-o", str(cls)],
        cwd=tmp_path, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, "-m", "rkmh_tpu.scripts.score_test_data",
         str(cls)], env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    toks = r.stdout.split()
    assert toks[0] == "True" and toks[3] == "True" and toks[4] == "True", \
        r.stdout
