"""`hash` command — emit per-read k-mer hashes / k-mers / sketches.

Reference behavior (rkmh.cpp:1931-2116): stream reads in buffered chunks;
with -K print each read's raw k-mers (print_kmers), otherwise hash every
k-mer (calc_hashes, multi-k concatenated) and print them (print_hashes).
The reference's -M/-I branch is an empty block (rkmh.cpp:2109-2111), its
-w wabbitize flag parses but never calls print_wabbit (rkmh.cpp:463-487),
and its JSON dump/load (rkmh.cpp:489-582) is dead or stubbed.  Here all
three are wired for real:

* default      — one line per read: ``name\\th1 h2 h3 ...`` (hashes in
  sequence order, 0 = invalid-kmer sentinel, multi-k concatenated).  The
  exact print_hashes layout lives in the non-vendored mkmh submodule, so
  this is a clean-room format: token[0] = name, whitespace-separated
  values, one record per line — the shape `search` consumes.
* -K           — one line per k-mer: ``kmer\\tname`` (sequence order).
* -s S         — emit the bottom-S sketch instead of all hashes.
* -w           — Vowpal Wabbit vectors, byte-matching print_wabbit
  (rkmh.cpp:463-487): ``XYX 1.0 `key|vir h:1 ... |sketch k:K s:S`` with
  '|' in names replaced by '_'.
* --json / -o  — rkmh dump_hashes JSON schema (io/sketch_json.py), loadable
  by `stream/filter --ref-sketches`.

Hashing runs on device in fixed-shape batches; formatting is host-side.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from rkmh_tpu.classify import engine
from rkmh_tpu.commands.common import (
    DEFAULT_KMER,
    iter_packed_chunks,
    packed_batches,
    resolve_chunk_reads,
    log,
)
from rkmh_tpu.io.sketch_json import SketchRecord, dump_sketches


@dataclass
class HashConfig:
    read_files: list = field(default_factory=list)
    ks: tuple = ()
    sketch_size: int = 0          # 0 = all hashes (reference default)
    output_kmers: bool = False    # -K
    wabbitize: bool = False       # -w
    output_counts: bool = False   # -c: wabbit features carry multiset counts
    json_out: bool = False        # --json to stdout
    sourmash_out: bool = False    # --sourmash: sourmash_signature schema
    out_prefix: str = ""          # -o prefix -> prefix.rkmh.json / .sig
    batch_size: int = 2048
    chunk_reads: int = 0          # streaming window; 0 = default
    devices: int = 0              # --devices: dp-shard hashing; 0 = single
    out_file: str = ""            # --out: hash lines here (dist rank stripes)
    resume: bool = False          # --resume: line-counted append (single or dist)
    dist_coordinator: str = ""    # --dist-coordinator host:port (multi-host)
    dist_procs: int = 0           # --dist-procs: process count (multi-host)
    dist_rank: int = -1           # --dist-rank: this process's id


def _wabbit_line(name: str, mins: list[int], ks, sketch_size: int,
                 counts: list[int] | None = None,
                 label: str = "XYX", nspace: str = "vir") -> str:
    """print_wabbit format (rkmh.cpp:463-487); with counts (-c) the
    features carry per-hash counts instead of :1."""
    key = "_".join(name.split("|"))
    if counts:
        feats = " ".join(f"{m}:{c}" for m, c in zip(mins, counts))
    else:
        feats = " ".join(f"{m}:1" for m in mins)
    return f"{label} 1.0 `{key}|{nspace} {feats} |sketch k:{ks[0]} s:{sketch_size}\n"


def _multiset_counts(sorted_vals: list[int]) -> list[int]:
    """Per-element multiplicity of each value within the (sorted) list."""
    from collections import Counter

    c = Counter(sorted_vals)
    return [c[v] for v in sorted_vals]


def run(cfg: HashConfig, out=None, _resume_skip: int = 0) -> int:
    import os

    if (cfg.dist_procs > 1 or cfg.dist_coordinator
            or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        from rkmh_tpu.commands.dist_stream import run_distributed_hash

        return run_distributed_hash(cfg, out)

    if cfg.resume and not cfg.out_file:
        log("hash --resume requires -o/--out (resume state is the partial "
            "output itself); refusing to re-hash to stdout")
        return 1
    if out is None and cfg.out_file:
        if cfg.resume and (cfg.output_kmers or cfg.json_out
                           or cfg.sourmash_out or cfg.out_prefix):
            # -K emits a variable number of lines per read and the JSON
            # modes write one document, so line-counted resume cannot
            # apply; refuse rather than silently restart
            log("hash --resume supports the line-per-read output modes "
                "only (not -K or the JSON/sourmash dumps)")
            return 1
        # every resume-supported hash mode emits exactly one line per
        # read, so skip the finished reads at the INPUT (no device work
        # re-done), stream/hpv16-style — unlike search, whose
        # short-read line skips need the line-dropping writer
        from rkmh_tpu.commands.recovery import count_complete_lines

        if cfg.resume and os.path.exists(cfg.out_file):
            skip = count_complete_lines(cfg.out_file)
            if skip:
                log(f"Resuming: {skip} reads already hashed in "
                    f"{cfg.out_file}")
            with open(cfg.out_file, "a") as fh:
                return run(cfg, fh, _resume_skip=skip)
        with open(cfg.out_file, "w") as fh:
            return run(cfg, fh)
    out = out or sys.stdout
    from rkmh_tpu.commands.common import resolve_batch_size

    cfg.batch_size = resolve_batch_size(cfg.batch_size)
    ks = tuple(cfg.ks) if cfg.ks else (DEFAULT_KMER,)
    if not cfg.ks:
        log("Using default kmer size of 16.")
    else:
        log(f"Using a kmer size of {ks[0]}")

    json_records: list[SketchRecord] = []
    want_json = cfg.json_out or cfg.sourmash_out or bool(cfg.out_prefix)
    chunk_reads = resolve_chunk_reads(cfg.chunk_reads)

    from rkmh_tpu.commands.common import DpCtx

    dpc = DpCtx.maybe(cfg.devices)
    if dpc is not None:
        cfg.batch_size = dpc.round_batch(cfg.batch_size)

    # input is consumed in bounded chunks (KSEQ_Reader semantics,
    # rkmh.cpp:2058-2073) and per-read lines are written as each batch is
    # fetched, so memory stays constant in the file size (JSON mode is the
    # exception: the dump schema needs every record)
    def chunks():
        it = iter_packed_chunks(cfg.read_files, chunk_reads)
        if _resume_skip:
            from rkmh_tpu.commands.recovery import skip_reads

            it = skip_reads(it, _resume_skip)
        return it

    if cfg.output_kmers:
        # -K: raw k-mer strings need no device pass (rkmh.cpp:2078) and
        # suppress every other output mode (the pre-chunking early return)
        k = ks[0]
        for chunk in chunks():
            for name, seq in zip(chunk.names, chunk.seqs):
                for i in range(max(0, len(seq) - k + 1)):
                    out.write(f"{seq[i:i + k].decode()}\t{name}\n")
        return 0

    for chunk in chunks():
        names = chunk.names

        for s, e, codes, lens in packed_batches(chunk, cfg.batch_size):
            if dpc is not None:
                codes, lens = dpc.put(codes, lens)
            if cfg.sketch_size > 0:
                from rkmh_tpu.commands.common import fetch_rows

                sk, sk_lens = engine.sketch_batch(codes, ks, cfg.sketch_size)
                sk_np, lens_np = fetch_rows((sk, sk_lens), e - s)
                for i in range(e - s):
                    name, seq_len = names[s + i], int(chunk.lens[s + i])
                    mins = sk_np[i, : lens_np[i]].tolist()
                    if cfg.wabbitize:
                        counts = _multiset_counts(mins) if cfg.output_counts else None
                        out.write(_wabbit_line(name, mins, ks, cfg.sketch_size, counts))
                    elif want_json:
                        json_records.append(
                            SketchRecord(name, mins, list(ks), cfg.sketch_size, seq_len)
                        )
                    else:
                        out.write(f"{name}\t{' '.join(map(str, mins))}\n")
            else:
                from rkmh_tpu.commands.common import fetch_rows

                hashes, mask = engine.hash_batch_with_mask(codes, lens, ks)
                h_np, m_np = fetch_rows((hashes, mask), e - s)
                if not cfg.wabbitize and not want_json:
                    # default dump: native block formatter (the python
                    # str join capped the published hashing metric)
                    from rkmh_tpu.io.native import format_hash_lines_block

                    blk = format_hash_lines_block(
                        np.asarray(h_np)[: e - s],
                        np.asarray(m_np)[: e - s], names[s:e])
                    if blk is not None:
                        out.write(blk.decode())
                        continue
                for i in range(e - s):
                    name, seq_len = names[s + i], int(chunk.lens[s + i])
                    vals = h_np[i][m_np[i]].tolist()
                    if cfg.wabbitize:
                        mins = sorted(v for v in vals if v != 0)
                        counts = _multiset_counts(mins) if cfg.output_counts else None
                        out.write(_wabbit_line(name, mins, ks, cfg.sketch_size, counts))
                    elif want_json:
                        json_records.append(
                            SketchRecord(
                                name, sorted(v for v in vals if v != 0),
                                list(ks), cfg.sketch_size, seq_len,
                            )
                        )
                    else:
                        out.write(f"{name}\t{' '.join(map(str, vals))}\n")

    if want_json:
        if cfg.sourmash_out:
            from rkmh_tpu.io.sketch_json import dump_sourmash as writer

            ext = ".sig"
        else:
            writer, ext = dump_sketches, ".rkmh.json"
        if cfg.out_prefix:
            with open(f"{cfg.out_prefix}{ext}", "w") as fh:
                writer(json_records, fh)
            log(f"Wrote {len(json_records)} sketches to {cfg.out_prefix}{ext}")
        else:
            writer(json_records, out)
    return 0
