"""`search` command — report which query k-mers appear in a reference set.

Reference behavior (rkmh.cpp:2124-2256): reference files are *text* files
whose lines start with a k-mer token; each token[0] is canonically hashed
(calc_hash) into a HASHTCounter.  Each read is kmerized and every k-mer
present in the reference set is collected; output is one line per read
with >=1 k-mer window:

    name\\tkmer1,kmer2,...\\n          (empty k-mer list -> "name\\t")

The reference's membership test is broken — ``htc.get(kmers.kmers[j] > 0)``
passes a bool as the key (rkmh.cpp:2231; SURVEY.md §8 B2), so it compares
against slot 1 for every k-mer.  We implement the evident intent
(``htc.get(calc_hash(kmer)) > 0``), with exact membership instead of the
lossy table so there are no collision false-positives.

Device path: canonical window hashes for the whole batch in one pass,
membership via searchsorted against the sorted reference hash array; the
matching k-mer strings are sliced host-side from the read.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from rkmh_tpu import oracle
from rkmh_tpu.commands.common import (
    DEFAULT_KMER,
    iter_packed_chunks,
    packed_batches,
    resolve_chunk_reads,
    log,
)
from rkmh_tpu.ops.hashing import kmer_window_hashes


@dataclass
class SearchConfig:
    ref_files: list = field(default_factory=list)   # text: kmer per line
    read_files: list = field(default_factory=list)  # fasta/fastq
    ks: tuple = ()
    batch_size: int = 2048
    chunk_reads: int = 0            # streaming window; 0 = default
    devices: int = 0                # --devices: dp-shard hashing; 0 = single
    out_file: str = ""              # -o: lines here (dist rank stripes)
    resume: bool = False            # --resume: line-counted append (single or dist)
    dist_coordinator: str = ""      # --dist-coordinator host:port (multi-host)
    dist_procs: int = 0             # --dist-procs: process count (multi-host)
    dist_rank: int = -1             # --dist-rank: this process's id


def load_ref_kmers(paths) -> np.ndarray:
    """Hash token[0] of every line of every ref file (rkmh.cpp:2191-2199)."""
    hashes = set()
    for p in paths:
        with open(p) as fh:
            for line in fh:
                tok = line.split()
                if tok:
                    h = oracle.calc_hash(tok[0])
                    if h:
                        hashes.add(h)
    return np.asarray(sorted(hashes), dtype=np.uint64)


def run(cfg: SearchConfig, out=None) -> int:
    import os

    if (cfg.dist_procs > 1 or cfg.dist_coordinator
            or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        from rkmh_tpu.commands.dist_stream import run_distributed_search

        return run_distributed_search(cfg, out)

    if cfg.resume and not cfg.out_file:
        log("search --resume requires -o/--out (resume state is the "
            "partial output itself); refusing to re-search to stdout")
        return 1
    if out is None and cfg.out_file:
        from rkmh_tpu.commands.recovery import open_line_resume

        fh, wrapped = open_line_resume(cfg.out_file, cfg.resume)
        with fh:
            return run(cfg, wrapped)
    out = out or sys.stdout
    from rkmh_tpu.commands.common import resolve_batch_size

    cfg.batch_size = resolve_batch_size(cfg.batch_size)
    ks = tuple(cfg.ks) if cfg.ks else (DEFAULT_KMER,)
    if not cfg.ks:
        log("Using default kmer size of 16.")
    k = ks[0]  # reference kmerizes with kmer[0] only (rkmh.cpp:2228)

    ref_hashes = load_ref_kmers(cfg.ref_files)
    log(f"Loaded {len(ref_hashes)} reference kmers.")
    ref_dev = jnp.asarray(ref_hashes)

    from rkmh_tpu.commands.common import DpCtx

    dpc = DpCtx.maybe(cfg.devices)
    if dpc is not None:
        cfg.batch_size = dpc.round_batch(cfg.batch_size)

    # bounded-memory chunked input (the reference's task-per-read streaming
    # loop, rkmh.cpp:2210-2218)
    for chunk in iter_packed_chunks(cfg.read_files, resolve_chunk_reads(cfg.chunk_reads)):
        names, seqs = chunk.names, chunk.seqs
        for s, e, codes, lens in packed_batches(chunk, cfg.batch_size):
            if dpc is not None:
                codes = dpc.put(codes)
            wh = kmer_window_hashes(codes, k)                       # [B, W]
            if ref_hashes.size:
                pos = jnp.searchsorted(ref_dev, wh)
                pos = jnp.clip(pos, 0, len(ref_hashes) - 1)
                found = (ref_dev[pos] == wh) & (wh != np.uint64(0))
            else:
                found = jnp.zeros(wh.shape, dtype=bool)
            from rkmh_tpu.commands.common import fetch_rows

            (found_np,) = fetch_rows((found,), e - s)
            for i in range(e - s):
                seq = seqs[s + i]
                nwin = len(seq) - k + 1
                if nwin <= 0:
                    continue  # reference emits nothing for reads shorter than k
                idx = np.nonzero(found_np[i, :nwin])[0]
                mers = ",".join(seq[j : j + k].decode() for j in idx)
                out.write(f"{names[s + i]}\t{mers}\n")
    return 0
