"""Benchmark: classify throughput on the canonical zika config
(BASELINE.json config 1: -r data/zika.refs.fa -f data/z1.fq -k 12 -s 1000).

Measures the full per-batch pipeline a user sees: device hashing ->
bottom-s sketch -> intersection counts vs all 60 refs -> argmax/filters ->
device-to-host transfer -> output-line formatting.  Reference parsing and
panel sketching are one-time setup (as in rkmh) and excluded, matching
how rkmh's README throughput numbers are quoted (reads/s sustained).

Baseline derivation (BASELINE.md): rkmh publishes >400 7kb-reads/s
(~2,500,000 bp/s) hashing throughput and <20 s for 1000 minION reads
classify under OpenMP (threads unspecified; README.md:143-148).  The
driver target is reads/sec/chip vs rkmh 16-thread on this exact zika
config, which is not directly published; we use 2.5 Mbp/s / 150 bp =
16,667 reads/s as the documented stand-in baseline.
"""

import json
import sys
import time

import numpy as np


def main():
    import rkmh_tpu  # noqa: F401 (x64 on)
    import jax

    from rkmh_tpu.classify import engine
    from rkmh_tpu.io.fastx import read_fastx
    from rkmh_tpu.io.packing import encode_seqs
    from rkmh_tpu.commands.stream import format_lines

    DATA = "/root/reference/data"
    ks, s = (12,), 1000

    refs = read_fastx(f"{DATA}/zika.refs.fa")
    reads = read_fastx(f"{DATA}/z1.fq")

    ref_codes, _ = encode_seqs([r.seq for r in refs])
    ref_sk, ref_lens = engine.sketch_batch(ref_codes, ks, s)
    ref_keys = [r.name for r in refs]

    platform = jax.devices()[0].platform
    tile = 8 if platform != "cpu" else 4  # 8k reads/batch on accelerator
    recs = reads * tile
    batch = len(recs)
    codes, lens = encode_seqs([r.seq for r in recs], granularity=32)
    total_bp = int(lens.sum())

    def step(codes):
        return engine.classify_batch(codes, ref_sk, ref_lens, ks, s)

    # warmup / compile
    out = step(codes)
    jax.block_until_ready(out)
    _ = format_lines(ref_keys, recs, out[0], out[1], out[2], out[3], out[4], out[5], s)

    iters = 10 if platform != "cpu" else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(codes)
        best, shared, sk_lens, diff_ok, depth_fail, match_fail = out
        text = format_lines(
            ref_keys, recs, best, shared, sk_lens, diff_ok, depth_fail, match_fail, s
        )
    dt = time.perf_counter() - t0

    reads_per_sec = batch * iters / dt
    bp_per_sec = total_bp * iters / dt
    baseline = 16667.0  # see module docstring
    result = {
        "metric": "classify reads/sec/chip (zika, k=12, s=1000, 60 refs)",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / baseline, 2),
    }
    print(json.dumps(result))
    print(
        f"# platform={platform} batch={batch} iters={iters} "
        f"bp/s={bp_per_sec:.0f} lines={len(text.splitlines())}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
