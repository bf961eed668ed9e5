"""Shared command plumbing: reference-panel building and read batching."""

from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from rkmh_tpu.io.fastx import SeqRecord, read_fastx
from rkmh_tpu.io.packing import encode_seqs, bucket_length
from rkmh_tpu.classify import engine
from rkmh_tpu.ops.counter import HashCounter

DEFAULT_KMER = 16        # rkmh.cpp:728-731
DEFAULT_SKETCH = 1000    # rkmh.cpp:592
DEFAULT_BATCH = 2048


def resolve_batch_size(requested: int) -> int:
    """--batch-size 0 = auto: large dispatches on accelerators (per-batch
    host overheads — sync RTT, dispatch — amortize over more reads; 16k
    measured near the device-throughput knee), modest on CPU."""
    if requested and requested > 0:
        return requested
    import jax

    try:
        return 16384 if jax.default_backend() != "cpu" else DEFAULT_BATCH
    except Exception:
        return DEFAULT_BATCH


def log(msg: str):
    print(msg, file=sys.stderr)


@dataclass
class RefPanel:
    keys: list[str]
    sketches: jnp.ndarray  # [R, s] sorted uint64, SENTINEL-padded
    lens: jnp.ndarray      # [R] int32
    table: tuple           # device arrays of the ops.lookup cuckoo table

    @property
    def num_refs(self) -> int:
        return len(self.keys)


def build_ref_panel(
    ref_packed,
    ks: tuple,
    sketch_size: int,
    max_samples: int | None = None,
    counter_size: int = 200_000_000,
    distinct_counter: bool = False,
) -> RefPanel:
    """Hash+sketch a reference panel and build its lookup table.

    ref_packed: a PackedReads/PyPacked (codes/lens/names).  With
    max_samples set, replicates the -I informative filter: count
    reference k-mer occurrences in a HASHTCounter (every occurrence for
    stream, rkmh.cpp:828-837; once per sample when distinct_counter=True,
    for filter, rkmh.cpp:340-357), then sketch only hashes occurring
    <= max_samples times.
    """
    from rkmh_tpu.ops.lookup import build_panel_table_device

    codes, lens = ref_packed.codes, ref_packed.lens
    if max_samples is None:
        sk, sk_lens = engine.sketch_batch(codes, tuple(ks), sketch_size)
    else:
        hc = HashCounter(counter_size)
        if distinct_counter:
            x, first = engine.distinct_hash_mask(codes, lens, tuple(ks))
            hc.add(x, first)
        else:
            hashes, mask = engine.hash_batch_with_mask(codes, lens, tuple(ks))
            hc.add(hashes, mask)
        sk, sk_lens = engine.sketch_batch_informative(
            codes, hc.table, tuple(ks), sketch_size, max_samples
        )
    # Small panels build host-side (one small fetch; numpy build is fast
    # and dodges per-bucket-count device compiles).  Big panels (hpv16-
    # scale) build on device so the multi-hundred-MB table never crosses
    # the wire.  Threshold ~= where the table upload outweighs a compile.
    from rkmh_tpu.utils import to_host

    n_elems = int(np.asarray(jnp.sum(sk_lens)))
    if n_elems < 2_000_000:
        from rkmh_tpu.ops.lookup import build_panel_table

        sk_np, lens_np = to_host((sk, sk_lens))
        table = build_panel_table(sk_np, lens_np).device_arrays()
    else:
        table = (build_panel_table_device(sk, sk_lens),)
    return RefPanel(list(ref_packed.names), sk, sk_lens, table)


def load_records(paths) -> list[SeqRecord]:
    recs = read_fastx(paths)
    return recs


class PyPacked:
    """Python-parser fallback with the native PackedReads interface."""

    def __init__(self, records: list[SeqRecord], granularity: int = 128):
        self.codes, self.lens = encode_seqs(
            [r.seq for r in records], granularity=granularity
        )
        self.names = [r.name for r in records]
        self.seqs = [r.seq for r in records]
        self.quals = [r.qual for r in records]

    def __len__(self):
        return len(self.names)


def load_packed(paths, granularity: int = 128):
    """Parse files straight into device-ready [N, L] code tensors.

    Uses the native C++ parser+packer (io/native, the kseq/KSEQ_Reader
    equivalent) when available, the Python parser otherwise.  Multiple
    files concatenate in order, padded to a common row length.
    """
    from rkmh_tpu.io.native import read_fastx_packed

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    parts = []
    for p in paths:
        pk = None
        if p not in ("-", b"-"):
            try:
                pk = read_fastx_packed(p, granularity)
            except OSError:
                pk = None
        if pk is None:
            pk = PyPacked(read_fastx(p), granularity)
        parts.append(pk)
    if len(parts) == 1:
        return parts[0]

    L = max(p.codes.shape[1] for p in parts)
    N = sum(len(p) for p in parts)
    codes = np.full((N, L), 255, dtype=np.uint8)
    lens = np.zeros((N,), dtype=np.int32)
    names, seqs, quals = [], [], []
    at = 0
    for p in parts:
        n = len(p)
        codes[at : at + n, : p.codes.shape[1]] = p.codes
        lens[at : at + n] = p.lens
        names.extend(p.names)
        seqs.extend(p.seqs)
        quals.extend(p.quals)
        at += n
    merged = PyPacked.__new__(PyPacked)
    merged.codes, merged.lens = codes, lens
    merged.names, merged.seqs, merged.quals = names, seqs, quals
    return merged


DEFAULT_CHUNK_READS = 65536


def resolve_chunk_reads(requested: int | None = None) -> int:
    """Streaming window size (reads per parsed chunk).  0/None = default;
    RKMH_TPU_CHUNK_READS overrides (tests force tiny windows with it)."""
    import os

    if requested and requested > 0:
        return requested
    env = os.environ.get("RKMH_TPU_CHUNK_READS", "")
    if env.isdigit() and int(env) > 0:
        return int(env)
    return DEFAULT_CHUNK_READS


def iter_packed_chunks(paths, chunk_reads: int, granularity: int = 128):
    """Yield device-ready PackedReads/PyPacked chunks of <= chunk_reads
    records — the constant-memory input path (KSEQ_Reader equivalent,
    rkmh.cpp:950-959): only one parsed chunk is resident at a time.

    Files are consumed in order (chunks never span files, matching
    load_packed's concatenation order).  Native streaming parser when
    available; Python iter_batches fallback otherwise (also the '-'
    stdin path).
    """
    from rkmh_tpu.io.fastx import iter_batches
    from rkmh_tpu.io.native import FastxStream

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    for p in paths:
        stream = None
        if p not in ("-", b"-"):
            try:
                stream = FastxStream(p)
            except OSError:
                stream = None
        if stream is not None:
            with stream:
                while True:
                    chunk = stream.next_chunk(chunk_reads, granularity)
                    if chunk is None:
                        break
                    yield chunk
        else:
            for recs in iter_batches(p, chunk_reads):
                yield PyPacked(recs, granularity)


def packed_batches(packed, batch_size: int):
    """Yield (start, stop, codes [B, L], lens [B]) row slices with a fixed
    batch shape (last chunk zero-padded) — at most 2 compiled shapes."""
    from rkmh_tpu.observability import count

    N = len(packed)
    for s in range(0, N, batch_size):
        e = min(s + batch_size, N)
        codes = packed.codes[s:e]
        lens = packed.lens[s:e]
        count("reads", e - s)
        count("bp", int(lens.sum()))
        if e - s < batch_size:
            codes = np.concatenate(
                [codes, np.full((batch_size - (e - s), codes.shape[1]), 255, np.uint8)]
            )
            lens = np.concatenate(
                [lens, np.zeros(batch_size - (e - s), np.int32)]
            )
        yield s, e, codes, lens


def bucketed_batches(packed, batch_size: int, granularity: int = 128,
                     max_buckets: int = 4):
    """Yield (rows [B] global indices, codes [B, Lb], lens [B]) grouped by
    padded-length bucket (io.packing.length_buckets).

    For length-spread inputs (nanopore: 1.6-7.4 kb in minION25.fq) this
    bounds padding waste to the bucket granularity instead of padding
    every read to the global max — up to ~2x less hashing work — at the
    cost of <= max_buckets * 2 compiled programs and out-of-order batch
    emission (callers reorder via the returned row indices).
    """
    from rkmh_tpu.io.packing import length_buckets
    from rkmh_tpu.observability import count

    N = len(packed)
    if N == 0:
        return
    uniq, bidx = length_buckets(packed.lens, granularity, max_buckets)
    for b, Lb in enumerate(uniq):
        sel = np.nonzero(bidx == b)[0]
        Lb = int(Lb)
        for off in range(0, len(sel), batch_size):
            rows = sel[off : off + batch_size]
            codes = packed.codes[rows][:, :Lb]
            lens = packed.lens[rows]
            count("reads", len(rows))
            count("bp", int(lens.sum()))
            # pad rows to the next power of two (capped at batch_size):
            # small inputs don't hash a full batch of padding, and the
            # number of compiled shapes stays logarithmic
            target = 8
            while target < len(rows):
                target *= 2
            target = min(target, batch_size)
            if len(rows) < target:
                pad = target - len(rows)
                codes = np.concatenate(
                    [codes, np.full((pad, Lb), 255, np.uint8)]
                )
                lens = np.concatenate([lens, np.zeros(pad, np.int32)])
            yield rows, codes, lens


def batch_iter(records: list[SeqRecord], batch_size: int, pad_to: int | None = None):
    """Yield (records_chunk, codes, lens) with a fixed padded length across
    the whole input (one compiled program); last chunk keeps its own size
    only if smaller (at most 2 compiled batch shapes)."""
    if not records:
        return
    if pad_to is None:
        pad_to = bucket_length(max(len(r.seq) for r in records))
    for i in range(0, len(records), batch_size):
        chunk = records[i : i + batch_size]
        seqs = [r.seq for r in chunk]
        if len(chunk) < batch_size:
            seqs = seqs + [b""] * (batch_size - len(chunk))  # pad rows
        codes, lens = encode_seqs(seqs, pad_to=pad_to)
        yield chunk, codes, lens
