"""Train the 4 shipped model_docker VW models from simulated mixes.

The reference ships 4 pre-trained Vowpal Wabbit models
(/root/reference/model_docker/: coinf binary, coinf interactions,
lineage ECT, sublineage ECT; applied by run_models.sh) but not their
training data (.MISSING_LARGE_BLOBS).  This reproduces the pipeline
end-to-end with the in-repo tooling and ONLY the bundled reference
genomes:

  1. simulate per-sublineage nanopore-ish read files from
     data/new_refs.fa (random windows, revcomp half, ~3% substitutions);
  2. build single-strain + coinfected samples (rkmh_tpu.scripts.make_mix
     machinery, seeded);
  3. classify each sample against the 10 sublineage references
     (stream, k=18 s=4000 — the config in the reference model names);
  4. vwize --format stream -> VW vectors with filename-encoded truth;
  5. train with the jax VW trainer (rkmh_tpu.ml.wabbit) and write
     model_docker/{coinf_binary,coinf_interactions,lineage_ect,
     sublineage_ect}.npz, the artifacts run_models.sh applies.

Deterministic (seed 42).  Run from /root/repo (CPU is fine):

    JAX_PLATFORMS=cpu python scripts/train_models.py [outdir]
"""

import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/data"
KS, S = (18,), 4000
READ_LEN, ERR = 900, 0.03
SUBLINEAGES = ["A1", "A2", "A3", "A4", "B1", "B2", "C1", "D1", "D2", "D3"]
SUBLIN_CLASSES = {s: str(i + 1) for i, s in enumerate(SUBLINEAGES)}
SUBLIN_CLASSES["coinfected"] = str(len(SUBLINEAGES) + 1)

_COMP = bytes.maketrans(b"ACGT", b"TGCA")


def simulate_reads(seq: bytes, n: int, rng) -> list:
    """Random READ_LEN windows with ~ERR substitutions; half revcomp."""
    L = len(seq)
    out = []
    arr = np.frombuffer(seq, np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for i in range(n):
        start = int(rng.integers(0, max(1, L - READ_LEN)))
        r = arr[start : start + READ_LEN].copy()
        nerr = rng.binomial(len(r), ERR)
        if nerr:
            pos = rng.choice(len(r), size=nerr, replace=False)
            r[pos] = bases[rng.integers(0, 4, size=nerr)]
        b = r.tobytes()
        if rng.random() < 0.5:
            b = b.translate(_COMP)[::-1]
        out.append(b)
    return out


def write_fastq(path, seqs, tag):
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@{tag}_{i}\n{s.decode()}\n+\n{'I' * len(s)}\n")


def classify_sample(fq: str, out_cls: str):
    from rkmh_tpu.commands.stream import StreamConfig, run

    buf = io.StringIO()
    rc = run(StreamConfig(ref_files=[f"{DATA}/new_refs.fa"],
                          read_files=[fq], ks=KS, sketch_size=S), out=buf)
    assert rc == 0
    with open(out_cls, "w") as fh:
        fh.write(buf.getvalue())


def main():
    from rkmh_tpu.io.fastx import read_fastx
    from rkmh_tpu.scripts.make_mix import num_reads
    from rkmh_tpu.scripts.vwize import main as vwize
    from rkmh_tpu.ml.wabbit import main as wabbit

    outdir = sys.argv[1] if len(sys.argv) > 1 else "model_docker"
    os.makedirs(outdir, exist_ok=True)
    work = os.path.join(outdir, ".train_work")
    os.makedirs(work, exist_ok=True)
    rng = np.random.default_rng(42)

    refs = {r.name: r.seq for r in read_fastx(f"{DATA}/new_refs.fa")}
    assert sorted(refs) == SUBLINEAGES

    # --- per-strain read pools -----------------------------------------
    pools = {}
    for s in SUBLINEAGES:
        pools[s] = simulate_reads(refs[s], 2000, rng)

    # --- samples: filename encodes truth (make_mix convention) ---------
    samples = []  # (cls_path, coinf)
    for s in SUBLINEAGES:
        for j in range(10):
            cov = float(rng.uniform(3, 10))
            n = num_reads(cov, len(refs[s]), 1.0)
            seqs = [pools[s][int(i)] for i in
                    rng.choice(len(pools[s]), size=min(n, 600), replace=False)]
            fq = os.path.join(work, f"{s}_single_{j}_.fq")
            write_fastq(fq, seqs, f"{s}_{j}")
            samples.append((fq, 0))
    for j in range(80):
        k = int(rng.integers(2, 4))
        strains = list(rng.choice(SUBLINEAGES, size=k, replace=False))
        props = rng.dirichlet(np.ones(k) * 1.5)
        cov = float(rng.uniform(4, 12))
        seqs = []
        for s, p in zip(strains, props):
            n = min(int(num_reads(cov, len(refs[s]), float(p))), 400)
            seqs += [pools[s][int(i)] for i in
                     rng.choice(len(pools[s]), size=n, replace=False)]
        name = "_".join(f"{s}_0-{p:.2f}" for s, p in zip(strains, props))
        fq = os.path.join(work, f"1088_{name}_{j}_.fq")
        write_fastq(fq, seqs, f"mix{j}")
        samples.append((fq, 1))

    # --- classify + vwize ----------------------------------------------
    print(f"classifying {len(samples)} samples vs new_refs.fa "
          f"(k={KS[0]} s={S}) ...", file=sys.stderr)
    cls_files, coinfs = [], []
    for fq, coinf in samples:
        cls = fq[:-3] + ".cls"
        classify_sample(fq, cls)
        cls_files.append(cls)
        coinfs.append(coinf)

    def vw_file(path, extra):
        out = io.StringIO()
        argv = (["-n", "--format", "stream", "-s", *SUBLINEAGES,
                 "-i", *cls_files, "-C", *map(str, coinfs)] + extra)
        assert vwize(argv=argv, stdout=out) == 0
        with open(path, "w") as fh:
            fh.write(out.getvalue())

    submap = os.path.join(work, "sublineage_classes.tsv")
    with open(submap, "w") as fh:
        for k, v in SUBLIN_CLASSES.items():
            fh.write(f"{k}\t{v}\n")

    binary_vw = os.path.join(work, "binary.vw")
    lineage_vw = os.path.join(work, "lineage.vw")
    sublin_vw = os.path.join(work, "sublineage.vw")
    vw_file(binary_vw, [])
    vw_file(lineage_vw, ["-M"])            # A..D + coinfected = 1..5
    vw_file(sublin_vw, ["-P", submap])     # A1..D3 + coinfected = 1..11

    # --- train the 4 models --------------------------------------------
    jobs = [
        ("coinf_binary", binary_vw, ["--binary"]),
        ("coinf_interactions", binary_vw, ["--binary", "--interactions", "vv"]),
        ("lineage_ect", lineage_vw, ["--ect", "5"]),
        ("sublineage_ect", sublin_vw, ["--ect", str(len(SUBLINEAGES) + 1)]),
    ]
    for name, data, extra in jobs:
        out = os.path.join(outdir, f"{name}.npz")
        rc = wabbit(argv=[data, "-f", out, "--passes", "150"] + extra)
        assert rc == 0, name
        print(f"wrote {out}", file=sys.stderr)

    # --- self-check: training-set accuracy ------------------------------
    for name, data, _ in jobs:
        out = io.StringIO()
        rc = wabbit(argv=[data, "-i", os.path.join(outdir, f"{name}.npz"),
                          "-t", "-p", "/dev/null"], stdout=out)
        assert rc == 0
    print("done.", file=sys.stderr)


if __name__ == "__main__":
    main()
