"""Failure recovery for interrupted long runs.

SURVEY.md §5 lists failure detection / recovery as absent in the
reference — rkmh restarts any interrupted run from scratch (its only
failure handling is exit(1) on bad input, rkmh.cpp:559/1585/1594).
Here every per-read-output command can resume: per-read output is
deterministic, so an interrupted `-o` run restarts by skipping exactly
the reads whose output already landed and appending the rest —
idempotent, byte-identical to an uninterrupted run.

Two mechanisms, chosen by the command's output shape:

* **line-counted resume** (`stream`, `hpv16`: exactly one output line
  per read): the partial output file IS the checkpoint.  Count its
  complete lines, truncate a torn final line, skip that many reads.
* **sidecar progress** (`filter`: records only for PASSING reads, so
  output length says nothing about input position): a `<out>.progress`
  JSON sidecar is rewritten atomically after each chunk's records are
  flushed, recording (reads consumed, output byte size).  Resume
  truncates the output to the recorded size — dropping any
  partially-buffered tail from the interrupted chunk — and skips the
  recorded reads.

Durability model: output is flushed to the kernel before each sidecar
update, so everything a sidecar (or a complete line) points at survives
a process kill.  Machine-crash durability would need fsync per chunk;
deliberately not paid — classification re-runs are cheap and the resume
logic tolerates a stale-but-consistent checkpoint either way.

Deterministic fault injection (testing the recovery path end to end):
``RKMH_TPU_FAIL_AFTER_CHUNKS=N`` makes ChunkedPipeline raise
InjectedFailure after its Nth chunk emission — a mid-run crash at a
reproducible point.
"""

from __future__ import annotations

import json
import os


class InjectedFailure(RuntimeError):
    """Raised by ChunkedPipeline when RKMH_TPU_FAIL_AFTER_CHUNKS trips."""


def fail_after_chunks() -> int:
    """The fault-injection threshold (0 = disabled)."""
    env = os.environ.get("RKMH_TPU_FAIL_AFTER_CHUNKS", "")
    return int(env) if env.isdigit() else 0


def count_complete_lines(path: str) -> int:
    """Newline-terminated lines in a partial output file (a torn final
    line without '\\n' is not counted and is truncated away so appends
    start on a line boundary)."""
    n = 0
    last_nl_end = 0
    with open(path, "rb") as fh:
        while True:
            block = fh.read(1 << 20)
            if not block:
                break
            c = block.count(b"\n")
            if c:
                n += c
                last_nl_end = fh.tell() - (len(block) - block.rindex(b"\n") - 1)
    if os.path.getsize(path) != last_nl_end:
        with open(path, "r+b") as fh:
            fh.truncate(last_nl_end)
    return n


def skip_reads(chunk_iter, skip: int):
    """Drop the first `skip` reads from a packed-chunk iterator (whole
    chunks where possible, a row-sliced partial chunk at the boundary).
    Chunk-window-size independent: resuming with a different
    --chunk-reads still stitches byte-identically."""
    from rkmh_tpu.commands.common import PyPacked
    from rkmh_tpu.io.fastx import SeqRecord

    for chunk in chunk_iter:
        if skip == 0:
            yield chunk
            continue
        if len(chunk) <= skip:
            skip -= len(chunk)
            continue
        recs = [
            SeqRecord(chunk.names[i], chunk.seqs[i], chunk.quals[i])
            for i in range(skip, len(chunk))
        ]
        skip = 0
        yield PyPacked(recs)


class LineSkipWriter:
    """Drop the first `skip` output LINES, then pass writes through.

    The resume wrapper for commands whose per-read output is line-shaped
    but not exactly one-line-per-read (`search` emits nothing for reads
    shorter than k; `hash` writes multi-line native blocks): counting
    already-emitted lines and dropping that many re-emissions is correct
    for any read->lines mapping, as long as the mapping is deterministic
    and in input order (both hold for every drain here)."""

    def __init__(self, out, skip: int):
        self.out = out
        self.skip = skip

    def write(self, s: str) -> None:
        if self.skip:
            while self.skip and s:
                nl = s.find("\n")
                if nl < 0:
                    raise ValueError(
                        "resume writer saw a partial line while skipping "
                        "(drains must write whole lines)")
                s = s[nl + 1:]
                self.skip -= 1
            if not s:
                return
        self.out.write(s)

    def flush(self) -> None:
        if hasattr(self.out, "flush"):
            self.out.flush()


def open_line_resume(out_file: str, resume: bool):
    """(file object, wrapped writer) for a line-shaped -o output: with
    resume and an existing file, append after the complete lines and
    wrap in a LineSkipWriter; otherwise truncate-open."""
    if resume and os.path.exists(out_file):
        skip = count_complete_lines(out_file)
        fh = open(out_file, "a")
        return fh, (LineSkipWriter(fh, skip) if skip else fh)
    fh = open(out_file, "w")
    return fh, fh


class Progress:
    """Atomic `<out>.progress` sidecar: {"reads": N, "bytes": M}.

    `save` is called after the owning command flushed its output, so the
    recorded byte size is always <= the on-disk output and everything up
    to it is final.  The sidecar is left behind on success (resuming a
    finished run is then a clean no-op append)."""

    def __init__(self, out_file: str):
        self.path = out_file + ".progress"

    def load(self) -> tuple[int, int] | None:
        """(reads_done, output_bytes) from the sidecar, or None when it
        is missing/unreadable (resume cannot be inferred for filter-type
        outputs without it)."""
        try:
            with open(self.path) as fh:
                d = json.load(fh)
            reads, nbytes = int(d["reads"]), int(d["bytes"])
        except (OSError, ValueError, KeyError):
            return None
        if reads < 0 or nbytes < 0:
            return None
        return reads, nbytes

    def save(self, reads_done: int, output_bytes: int) -> None:
        tmp = f"{self.path}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"reads": reads_done, "bytes": output_bytes}, fh)
        os.replace(tmp, self.path)
