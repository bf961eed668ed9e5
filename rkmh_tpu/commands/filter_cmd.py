"""`filter` command — emit reads that pass classification thresholds.

Mirrors rkmh main_filter (rkmh.cpp:996-1424):

* File mode: reads passing depth/match/diff filters are re-emitted as
  4-line records with a '>' header over a FASTQ body — yes, '>' — exactly
  as the reference writes them (rkmh.cpp:1298-1302).
* -i streaming mode: reads from STDIN are classified one batch at a time
  and reported as "Sample: <name>\tResult: <ref>\t<shared>\t<union>\t..."
  lines (rkmh.cpp:1397-1399) — the only live STDIN path in the reference
  binary.
* -I counts each hash once per reference sample (set semantics,
  rkmh.cpp:340-357), unlike stream -I which counts every occurrence.
* Classification uses the filter-flavor argmax (running max starts at 0;
  a read matching nothing gets sample "" and fails the diff filter; see
  classify.engine.argmax_filter / equiv.hpp:324-353).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from rkmh_tpu.classify import engine
from rkmh_tpu.commands.common import (
    DEFAULT_BATCH,
    DEFAULT_KMER,
    batch_iter,
    load_records,
    log,
)
from rkmh_tpu.io.fastx import iter_batches
from rkmh_tpu.io.packing import encode_seqs
from rkmh_tpu.ops.counter import HashCounter
from rkmh_tpu.ops.sketch import SENTINEL


@dataclass
class FilterConfig:
    ref_files: list = field(default_factory=list)
    read_files: list = field(default_factory=list)
    ks: tuple = ()
    sketch_size: int = 1000
    min_kmer_occ: int = -1          # -M
    min_matches: int = -1           # -N
    min_diff: int = 0               # -D
    max_samples: int | None = None  # -I
    in_stream: bool = False         # -i
    counter_size: int = 10_000_000  # rkmh.cpp:1187-1188
    batch_size: int = DEFAULT_BATCH


def _build_panel(refs, ks, cfg):
    codes, lens = encode_seqs([r.seq for r in refs])
    if cfg.max_samples is not None:
        hc = HashCounter(cfg.counter_size)
        x, first = engine.distinct_hash_mask(codes, lens, ks)
        hc.add(x, first)
        sk, sk_lens = engine.sketch_batch_informative(
            codes, hc.table, ks, cfg.sketch_size, cfg.max_samples
        )
    else:
        sk, sk_lens = engine.sketch_batch(codes, ks, cfg.sketch_size)
    return sk, sk_lens


def run(cfg: FilterConfig, out=None, stdin=None) -> int:
    out = out or sys.stdout
    ks = tuple(cfg.ks) if cfg.ks else (DEFAULT_KMER,)
    if not cfg.ks:
        log("No kmer size(s) provided. Will use a default kmer size of 16.")

    refs = load_records(cfg.ref_files)
    ref_sk, ref_lens = _build_panel(refs, ks, cfg)
    ref_keys = [r.name for r in refs]

    read_counter = None
    reads = load_records(cfg.read_files) if cfg.read_files else []

    if cfg.min_kmer_occ >= 0:
        # counter exists (possibly empty) whenever -M is given, matching the
        # reference where an unpopulated counter fails every streamed read
        read_counter = HashCounter(cfg.counter_size)
        for chunk, codes, lens in batch_iter(reads, cfg.batch_size):
            hashes, mask = engine.hash_batch_with_mask(codes, lens, ks)
            read_counter.add(hashes, mask)

    def classify(codes, lens):
        if read_counter is not None:
            sk, sk_lens = engine.sketch_batch_depth_filtered(
                codes, lens, read_counter.table, ks, cfg.sketch_size, cfg.min_kmer_occ
            )
        else:
            sk, sk_lens = engine.sketch_batch(codes, ks, cfg.sketch_size)
        return engine.filter_sketches(
            sk, sk_lens, ref_sk, ref_lens, cfg.min_diff, cfg.min_matches
        )

    # ---- file mode: emit passing reads ------------------------------------
    for chunk, codes, lens in batch_iter(reads, cfg.batch_size):
        best, shared, tu, keep, *_ = classify(codes, lens)
        keep = np.asarray(keep)
        for i, rec in enumerate(chunk):
            if keep[i]:
                qual = rec.qual if rec.qual is not None else b"I" * len(rec.seq)
                out.write(
                    f">{rec.name}\n{rec.seq.decode()}\n+\n{qual.decode()}\n"
                )

    # ---- -i: STDIN streaming classification (rkmh.cpp:1329-1414) ----------
    if cfg.in_stream:
        src = stdin if stdin is not None else "-"
        for chunk in iter_batches(src, cfg.batch_size):
            seqs = [r.seq for r in chunk]
            if len(seqs) < cfg.batch_size:
                pass  # variable last batch: accept one extra compile
            codes, lens = encode_seqs(seqs)
            best, shared, tu, keep, depth_fail, match_fail, diff_ok = classify(
                codes, lens
            )
            best = np.asarray(best)
            shared = np.asarray(shared)
            tu = np.asarray(tu)
            depth_fail = np.asarray(depth_fail)
            match_fail = np.asarray(match_fail)
            diff_ok = np.asarray(diff_ok)
            for i, rec in enumerate(chunk):
                name = ref_keys[int(best[i])] if best[i] >= 0 else ""
                out.write(
                    f"Sample: {rec.name}\tResult: {name}\t{int(shared[i])}\t{int(tu[i])}\t"
                    f"{'FAIL:DEPTH' if depth_fail[i] else ''}\t"
                    f"{'FAIL:MATCHES' if match_fail[i] else ''}\t"
                    f"{'' if diff_ok[i] else 'FAIL:DIFF'}\n"
                )
    return 0
