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

from rkmh_tpu.classify import engine
from rkmh_tpu.commands.common import (
    DEFAULT_BATCH,
    DEFAULT_KMER,
    iter_packed_chunks,
    load_packed,
    packed_batches,
    resolve_chunk_reads,
    log,
)
from rkmh_tpu.io.fastx import iter_batches
from rkmh_tpu.io.packing import encode_seqs
from rkmh_tpu.ops.counter import HashCounter


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
    ref_sketches: str = ""          # JSON panel dump (hash -o) to load
    chunk_reads: int = 0            # streaming window; 0 = default
    out_file: str = ""              # -o: write here instead of stdout
    resume: bool = False            # --resume: continue an interrupted -o run
    devices: int = 0                # --devices: SPMD over N local devices
    tp: int = 1                     # --tp: panel shards (devices = dp * tp)
    dist_coordinator: str = ""      # --dist-coordinator host:port (multi-host)
    dist_procs: int = 0             # --dist-procs: process count (multi-host)
    dist_rank: int = -1             # --dist-rank: this process's id


def run(cfg: FilterConfig, out=None, stdin=None) -> int:
    import os

    if (cfg.dist_procs > 1 or cfg.dist_coordinator
            or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        # multi-host (flags OR the standard JAX_* env vars): lockstep
        # global-batch drain; variable-record stripes merge via the
        # per-rank .idx sidecars (rkmh-tpu-dist-merge)
        from rkmh_tpu.commands.dist_stream import run_distributed_filter

        return run_distributed_filter(cfg, out)

    from rkmh_tpu.commands.recovery import Progress

    # failure recovery: filter emits records only for PASSING reads, so
    # the output alone cannot say how far the input got — a sidecar
    # progress file tracks (reads consumed, output bytes) per chunk (see
    # commands.recovery; rkmh has no analog, it restarts from scratch)
    resume_skip = 0
    progress = None
    close_out = False
    if cfg.resume and not cfg.out_file:
        log("filter --resume requires -o <file>; refusing to re-filter "
            "to stdout")
        return 1
    if cfg.resume and cfg.in_stream:
        log("filter --resume cannot combine with -i: a stream is not "
            "re-readable, so skipped reads cannot be matched up")
        return 1
    if out is None and cfg.out_file:
        progress = Progress(cfg.out_file)
        if cfg.resume and os.path.exists(cfg.out_file):
            state = progress.load()
            if state is None:
                log(f"filter --resume: no readable progress sidecar at "
                    f"{progress.path}; cannot infer how many reads the "
                    f"partial output covers — rerun without --resume")
                return 1
            resume_skip, out_bytes = state
            if os.path.getsize(cfg.out_file) < out_bytes:
                log(f"filter --resume: {cfg.out_file} is shorter than the "
                    f"{out_bytes} bytes its progress sidecar covers — the "
                    f"output was modified since the run; rerun without "
                    f"--resume")
                return 1
            with open(cfg.out_file, "r+b") as fh:
                fh.truncate(out_bytes)  # drop the interrupted chunk's tail
            log(f"Resuming: {resume_skip} reads already filtered into "
                f"{cfg.out_file}")
            out = open(cfg.out_file, "a")
        else:
            out = open(cfg.out_file, "w")
        close_out = True
    out = out or sys.stdout
    try:
        return _run(cfg, out, stdin, resume_skip, progress)
    finally:
        if close_out:
            out.close()


def _run(cfg: FilterConfig, out, stdin, resume_skip: int, progress) -> int:
    import os

    from rkmh_tpu.commands.recovery import skip_reads
    from rkmh_tpu.commands.common import resolve_batch_size

    cfg.batch_size = resolve_batch_size(cfg.batch_size)
    ks = tuple(cfg.ks) if cfg.ks else (DEFAULT_KMER,)
    if not cfg.ks:
        log("No kmer size(s) provided. Will use a default kmer size of 16.")

    if cfg.ref_sketches:
        from rkmh_tpu.io.sketch_json import load_sketches, panel_from_sketches

        with open(cfg.ref_sketches) as fh:
            panel = panel_from_sketches(load_sketches(fh), cfg.sketch_size)
    else:
        from rkmh_tpu.commands.common import build_ref_panel_from_files

        panel = build_ref_panel_from_files(
            cfg.ref_files, ks, cfg.sketch_size,
            max_samples=cfg.max_samples, counter_size=cfg.counter_size,
            distinct_counter=True,  # filter -I counts once per sample
        )
    ref_keys = panel.keys

    from rkmh_tpu.commands.common import (
        ChunkedPipeline, ChunkState, ShardedCtx, two_pass_chunks,
    )

    chunk_reads = resolve_chunk_reads(cfg.chunk_reads)

    # ---- --devices N [--tp T]: SPMD classify over a (dp, tp) mesh ---------
    # decided before the -M pass because with --devices the depth counter
    # itself shards over dp (parallel/ep.py).  Byte-identical output
    # (mesh.sharded_filter[_depth]_table_fn share engine.argmax_filter and
    # the [5, B] packed wire); invalid geometries warn and fall back.
    sharded = None
    if cfg.devices > 1:
        import jax

        from rkmh_tpu.commands.common import sharded_geometry_reason

        reason = sharded_geometry_reason(
            cfg.devices, cfg.tp, panel.num_refs, len(jax.devices()),
            cfg.min_kmer_occ, cfg.counter_size)
        if reason is not None:
            log(f"filter --devices ignored ({reason}); running single-device")
        else:
            sharded = ShardedCtx(panel, ks, cfg.devices, cfg.tp,
                                 cfg.counter_size, cfg.batch_size)

    classify_chunks = None
    read_counter = None
    if cfg.min_kmer_occ >= 0:
        # counter exists (possibly empty) whenever -M is given, matching the
        # reference where an unpopulated counter fails every streamed read.
        # First pass over plain files is chunked (constant memory) and the
        # classify pass re-reads them; stdin/FIFO inputs are buffered so the
        # second pass still sees every read (two_pass_chunks).
        pass1, pass2 = two_pass_chunks(cfg.read_files or [], chunk_reads)
        if sharded is not None:
            sharded.build_counter(pass1)
        else:
            read_counter = HashCounter(cfg.counter_size)
            for chunk in pass1:
                for s, e, codes, lens in packed_batches(chunk, cfg.batch_size):
                    hashes, mask = engine.hash_batch_with_mask(codes, lens, ks)
                    read_counter.add(hashes, mask)
        classify_chunks = pass2()

    def classify(codes, lens, packed: bool = False):
        # codes ship 2-bit packed on accelerators (engine.pack4_ok)
        L = codes.shape[1]
        pack4 = engine.pack4_ok(L)
        if pack4:
            from rkmh_tpu.io.packing import pack_codes4

            pk, vb = pack_codes4(codes)
        if read_counter is not None:
            if pack4:
                sk, sk_lens = engine.sketch_packed4_depth_filtered(
                    pk, vb, lens, read_counter.table, L, ks,
                    cfg.sketch_size, cfg.min_kmer_occ,
                )
            else:
                sk, sk_lens = engine.sketch_batch_depth_filtered(
                    codes, lens, read_counter.table, ks, cfg.sketch_size,
                    cfg.min_kmer_occ,
                )
        elif pack4:
            sk, sk_lens = engine.sketch_packed4(pk, vb, L, ks, cfg.sketch_size)
        else:
            sk, sk_lens = engine.sketch_batch(codes, ks, cfg.sketch_size)
        fn = engine.filter_sketches_table_packed if packed else engine.filter_sketches_table
        return fn(
            sk, sk_lens, *panel.table, panel.lens,
            num_refs=panel.num_refs, min_diff=cfg.min_diff, min_matches=cfg.min_matches,
        )

    if sharded is not None:
        from rkmh_tpu.parallel.mesh import sharded_filter_table_fn

        use_counter = sharded.counter is not None
        sfn = sharded_filter_table_fn(
            sharded.mesh, ks, cfg.sketch_size, sharded.rps,
            cfg.min_diff, cfg.min_matches,
            counter_size=cfg.counter_size if use_counter else None,
            min_occ=cfg.min_kmer_occ)
        extra = (sharded.counter,) if use_counter else ()

        def classify(codes, lens, packed: bool = True):
            codes, _ = sharded.pad_rows(codes)  # pad rows have keep=0 and
            # fall off: consumers index only the real rows
            return sfn(codes, sharded.tables, sharded.ref_lens, *extra)

    # ---- file mode: emit passing reads ------------------------------------
    # length-bucketed + pipelined + group-fetched like stream; the keep
    # mask lands in an index buffer so records emit in input order
    from collections import deque

    from rkmh_tpu.commands.common import bucketed_batches
    from rkmh_tpu.utils import to_host

    if cfg.read_files:
        if classify_chunks is None:
            classify_chunks = iter_packed_chunks(cfg.read_files, chunk_reads)
        if resume_skip:
            # the -M counter pass above still covered ALL reads (global
            # depths must match the uninterrupted run exactly); only the
            # classify/emit pass skips
            classify_chunks = skip_reads(classify_chunks, resume_skip)

        class _Chunk(ChunkState):
            __slots__ = ("chunk", "keep")

            def __init__(self, chunk):
                super().__init__(len(chunk))
                self.chunk = chunk
                self.keep = np.zeros(len(chunk), dtype=bool)

        reads_done = resume_skip

        def emit(st):
            names, seqs, quals = st.chunk.names, st.chunk.seqs, st.chunk.quals
            for i in np.nonzero(st.keep)[0]:
                seq = seqs[i]
                qual = quals[i] if quals[i] is not None else b"I" * len(seq)
                out.write(f">{names[i]}\n{seq.decode()}\n+\n{qual.decode()}\n")
            if progress is not None:
                nonlocal reads_done
                reads_done += st.n
                # flush before the sidecar update: everything the sidecar
                # points at must already be in the kernel
                out.flush()
                progress.save(reads_done, os.fstat(out.fileno()).st_size)

        def on_result(st, rows, arr):
            st.keep[rows] = arr[3, : len(rows)].astype(bool)
            st.filled += len(rows)

        # smaller fetch group than stream: every pending batch pins its
        # whole chunk (filter re-emits seqs/quals, so they can't be
        # dropped at dispatch like stream's names-only states) — a
        # 48-batch window would hold ~12 nanopore chunks of raw reads
        pipeline = ChunkedPipeline(on_result=on_result, emit=emit, group=8)
        pipeline.run(
            classify_chunks,
            make_state=_Chunk,
            dispatch=lambda st, rows, codes, lens: (
                rows, classify(codes, lens, packed=True)
            ),
            batch_size=cfg.batch_size,
        )

    # ---- -i: STDIN streaming classification (rkmh.cpp:1329-1414) ----------
    # a reader thread fills a bounded queue (the KSEQ_Reader producer /
    # omp-task consumer split of the reference, rkmh.cpp:1334-1351) while
    # the main thread encodes, dispatches, and drains pipelined batches
    if cfg.in_stream:
        import queue as _queue
        import threading

        src = stdin if stdin is not None else "-"
        q: _queue.Queue = _queue.Queue(maxsize=4)

        def _reader():
            try:
                for chunk in iter_batches(src, cfg.batch_size):
                    q.put(chunk)
            finally:
                q.put(None)

        threading.Thread(target=_reader, daemon=True).start()

        def emit(chunk, arr):
            best, shared, tu, keep, flags = (a.tolist() for a in arr)
            for i, rec in enumerate(chunk):
                name = ref_keys[best[i]] if best[i] >= 0 else ""
                f = flags[i]
                out.write(
                    f"Sample: {rec.name}\tResult: {name}\t{shared[i]}\t{tu[i]}\t"
                    f"{'FAIL:DEPTH' if f & 1 else ''}\t"
                    f"{'FAIL:MATCHES' if f & 2 else ''}\t"
                    f"{'' if f & 4 else 'FAIL:DIFF'}\n"
                )

        spending = deque()
        while True:
            chunk = q.get()
            if chunk is None:
                break
            codes, lens = encode_seqs([r.seq for r in chunk])
            spending.append((chunk, classify(codes, lens, packed=True)))
            if len(spending) > 2:
                c, res = spending.popleft()
                emit(c, to_host(res))
        while spending:
            c, res = spending.popleft()
            emit(c, to_host(res))
    return 0
