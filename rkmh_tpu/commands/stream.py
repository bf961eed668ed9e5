"""`stream` / `classify` command — per-read MinHash classification.

Byte-identical output to the reference's hot loop (rkmh.cpp:891-893):

    ref \t read \t max_shared \t sketch_size[FAIL:DEPTH] \t [FAIL:MATCHES] \t [FAIL:DIFF]

with rkmh's exact argmax/diff semantics (scan max starting at -1, strict
>, first-reference tie-break; see classify.engine.argmax_stream).  The
deprecated `classify` subcommand forwards here just like rkmh.cpp:2744-47.

-M (min k-mer depth) and -I (max samples / informative k-mers) use the
device HashCounter with rkmh's lossy-modulo table sizes (2e8,
rkmh.cpp:739-742) by default.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from rkmh_tpu.classify import engine
from rkmh_tpu.commands.common import (
    DEFAULT_BATCH,
    DEFAULT_KMER,
    DEFAULT_SKETCH,
    build_ref_panel,
    batch_iter,
    load_records,
    log,
)
from rkmh_tpu.ops.counter import HashCounter


@dataclass
class StreamConfig:
    ref_files: list = field(default_factory=list)
    read_files: list = field(default_factory=list)
    ks: tuple = ()
    sketch_size: int = DEFAULT_SKETCH
    min_kmer_occ: int = -1       # -M; <0 disables
    min_matches: int = -1        # -N
    min_diff: int = 0            # -D
    max_samples: int | None = None  # -I; None disables
    counter_size: int = 200_000_000  # rkmh.cpp:739-742
    batch_size: int = DEFAULT_BATCH
    threads: int = 1             # accepted for CLI parity; no-op on TPU
    ref_sketches: str = ""       # JSON panel dump (hash -o) to load


def format_lines(ref_keys, chunk, best, shared, sk_lens, diff_ok, depth_fail, match_fail, sketch_size):
    from rkmh_tpu.utils import to_host

    best, shared, diff_ok, depth_fail, match_fail = to_host(
        (best, shared, diff_ok, depth_fail, match_fail)
    )
    out = []
    for i, rec in enumerate(chunk):
        out.append(
            f"{ref_keys[int(best[i])]}\t{rec.name}\t{int(shared[i])}\t{sketch_size}"
            f"{'FAIL:DEPTH' if depth_fail[i] else ''}\t"
            f"{'FAIL:MATCHES' if match_fail[i] else ''}\t"
            f"{'' if diff_ok[i] else 'FAIL:DIFF'}\n"
        )
    return "".join(out)


def run(cfg: StreamConfig, out=None) -> int:
    out = out or sys.stdout
    ks = tuple(cfg.ks) if cfg.ks else (DEFAULT_KMER,)
    if not cfg.ks:
        log("No kmer size(s) provided. Will use a default kmer size of 16.")

    reads = load_records(cfg.read_files)

    if cfg.ref_sketches:
        from rkmh_tpu.io.sketch_json import load_sketches, panel_from_sketches

        with open(cfg.ref_sketches) as fh:
            panel = panel_from_sketches(load_sketches(fh), cfg.sketch_size)
    else:
        refs = load_records(cfg.ref_files)
        panel = build_ref_panel(
            refs,
            ks,
            cfg.sketch_size,
            max_samples=cfg.max_samples,
            counter_size=cfg.counter_size,
        )

    read_counter = None
    if cfg.min_kmer_occ >= 0:
        # first pass: global read-kmer depth (rkmh.cpp:903-910)
        read_counter = HashCounter(cfg.counter_size)
        for chunk, codes, lens in batch_iter(reads, cfg.batch_size):
            hashes, mask = engine.hash_batch_with_mask(codes, lens, ks)
            read_counter.add(hashes, mask)

    for chunk, codes, lens in batch_iter(reads, cfg.batch_size):
        if read_counter is not None:
            sk, sk_lens = engine.sketch_batch_depth_filtered(
                codes, lens, read_counter.table, ks, cfg.sketch_size, cfg.min_kmer_occ
            )
        else:
            sk, sk_lens = engine.sketch_batch(codes, ks, cfg.sketch_size)
        best, shared, diff_ok, depth_fail, match_fail = engine.classify_sketches_table(
            sk, sk_lens, *panel.table, panel.lens,
            num_refs=panel.num_refs, min_diff=cfg.min_diff, min_matches=cfg.min_matches,
        )
        out.write(
            format_lines(
                panel.keys, chunk, best, shared, np.asarray(sk_lens), diff_ok,
                depth_fail, match_fail, cfg.sketch_size,
            )
        )
    return 0
