"""`count` command — streaming k-mer depth counting into a lossy table.

Reference behavior (rkmh.cpp:2268-2360): hash every k-mer of every read
into a HASHTCounter(640000) ... and then exit without printing anything —
the counter is built and discarded (the "outputs their counts in a map"
comment is aspirational; SURVEY.md §8 B2).  We replicate the counting
exactly (same lossy ``hash % size`` table, zeros included) and make the
result actually usable:

* default        — count silently, print a one-line summary to stderr
  (parity: stdout stays empty, like the reference).
* -o table.npz   — save the counter table (+ size/ks metadata); stream's
  -M/-I paths and `call` can reuse it.
* --dump         — print ``slot\\tcount`` for occupied slots to stdout.

Counting is a single device scatter-add per batch (ops/counter.py).
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
from rkmh_tpu.ops.counter import HashCounter


@dataclass
class CountConfig:
    read_files: list = field(default_factory=list)
    ks: tuple = ()
    counter_size: int = 640_000     # rkmh.cpp:2322
    batch_size: int = 2048
    out_file: str = ""              # -o: save table as npz
    dump: bool = False              # --dump: print occupied slots
    chunk_reads: int = 0            # streaming window; 0 = default
    devices: int = 0                # --devices: dp-shard hashing; 0 = single
    dist_coordinator: str = ""      # --dist-coordinator host:port (multi-host)
    dist_procs: int = 0             # --dist-procs: process count (multi-host)
    dist_rank: int = -1             # --dist-rank: this process's id


def run(cfg: CountConfig, out=None) -> int:
    import os

    if (cfg.dist_procs > 1 or cfg.dist_coordinator
            or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        from rkmh_tpu.commands.dist_stream import run_distributed_count

        return run_distributed_count(cfg, out)

    out = out or sys.stdout
    from rkmh_tpu.commands.common import resolve_batch_size

    cfg.batch_size = resolve_batch_size(cfg.batch_size)
    ks = tuple(cfg.ks) if cfg.ks else (DEFAULT_KMER,)
    if not cfg.ks:
        log("Using default kmer size of 16.")

    from rkmh_tpu.commands.common import DpCtx

    dpc = DpCtx.maybe(cfg.devices)
    if dpc is not None:
        cfg.batch_size = dpc.round_batch(cfg.batch_size)

    hc = HashCounter(cfg.counter_size)
    total_kmers = 0
    total_reads = 0
    # bounded-memory chunked input (KSEQ_Reader semantics, rkmh.cpp:2323-2337)
    for chunk in iter_packed_chunks(cfg.read_files, resolve_chunk_reads(cfg.chunk_reads)):
        total_reads += len(chunk)
        for s, e, codes, lens in packed_batches(chunk, cfg.batch_size):
            if dpc is not None:
                codes, lens = dpc.put(codes, lens)
            hashes, mask = engine.hash_batch_with_mask(codes, lens, ks)
            hc.add(hashes, mask)
            # window count is a host-side function of lens — no D2H needed
            total_kmers += int(
                sum(np.maximum(lens.astype(np.int64) - (k - 1), 0).sum() for k in ks)
            )

    table = hc.to_numpy()
    occupied = int((table > 0).sum())
    log(f"Counted {total_kmers} kmers from {total_reads} reads into "
        f"{cfg.counter_size}-slot table ({occupied} slots occupied).")

    if cfg.out_file:
        np.savez_compressed(
            cfg.out_file, table=table, size=cfg.counter_size, ks=np.asarray(ks)
        )
        log(f"Saved counter table to {cfg.out_file}")
    if cfg.dump:
        (nz,) = np.nonzero(table)
        for slot in nz:
            out.write(f"{slot}\t{int(table[slot])}\n")
    return 0
