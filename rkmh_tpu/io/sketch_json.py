"""Mash/sourmash-style JSON sketch serialization — implemented for real.

The reference *declares* JSON sketch interop (README.md:13) and ships the
dump schema (`dump_hashes`, rkmh.cpp:527-550; per-record metadata mirrors
`dump_hash_json`, rkmh.cpp:489-525: MurmurHash3_x64_128 / 64 bits / seed
42 / canonical) — but its loader is a stub that prints "Loading not
implemented" and exits (rkmh.cpp:552-561).  Here both directions work, so
reference panels can be sketched once and reloaded (`--ref-sketches`),
delivering the checkpoint/resume capability SURVEY.md §5 calls out.

Schema note: rkmh's `dump_hashes` writes "canonical": "false" while its
`dump_hash_json` and the self-documented metadata say canonical=true; the
hashes *are* canonical in both.  We write "true" (truthful) and accept
either on load.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


@dataclass
class SketchRecord:
    name: str
    hashes: list[int]          # sorted ascending, zeros excluded
    ks: list[int]
    sketch_size: int
    seq_len: int = 0


def dump_sketches(records: list[SketchRecord], fh) -> None:
    """Write the rkmh dump_hashes JSON array schema (rkmh.cpp:527-550)."""
    arr = []
    for r in records:
        arr.append(
            {
                "name": r.name,
                "alphabet": "ATGC",
                "canonical": "true",
                "hashBits": 64,
                "hash_type": "MurmurHash3_x64_128",
                "hash_seed": 42,
                "seqLen": r.seq_len,
                "sketches": [int(h) for h in r.hashes],
                "length": r.sketch_size,
                "kmer": [int(k) for k in r.ks],
                "preserveCase": "false",
            }
        )
    json.dump(arr, fh, indent=1)
    fh.write("\n")


def load_sketches(fh) -> list[SketchRecord]:
    """Load sketches dumped by dump_sketches (or rkmh-schema JSON).

    Implements what rkmh's load_hashes stubs out (rkmh.cpp:552-582).
    """
    data = json.load(fh)
    if isinstance(data, dict):
        data = [data]
    out = []
    for j in data:
        hashes = j.get("sketches", [])
        length = j.get("length")
        # tolerate the dump_hash_json nested form {"name","length","hashes"}
        if isinstance(hashes, dict):
            if length is None:
                length = hashes.get("length")
            hashes = hashes.get("hashes", [])
        ks = j.get("kmer", [])
        if isinstance(ks, str):  # dump_hash_json writes "12 16"-style strings
            ks = [int(x) for x in ks.split()]
        if isinstance(ks, int):
            ks = [ks]
        out.append(
            SketchRecord(
                name=j.get("name", ""),
                hashes=sorted(int(h) for h in hashes),
                ks=[int(k) for k in ks],
                sketch_size=int(length if length is not None else len(hashes)),
                seq_len=int(j.get("seqLen", 0)),
            )
        )
    return out


def panel_from_sketches(records: list[SketchRecord], sketch_size: int | None = None):
    """Loaded sketches -> the same RefPanel the hashing path builds, so
    `stream --ref-sketches panel.json` skips reference hashing entirely."""
    import numpy as np
    import jax.numpy as jnp

    from rkmh_tpu.commands.common import RefPanel
    from rkmh_tpu.ops.lookup import build_panel_table
    from rkmh_tpu.ops.sketch import SENTINEL

    s = sketch_size or max((len(r.hashes) for r in records), default=1)
    R = len(records)
    sk = np.full((R, s), SENTINEL, dtype=np.uint64)
    lens = np.zeros((R,), dtype=np.int32)
    for i, r in enumerate(records):
        h = np.asarray(r.hashes[:s], dtype=np.uint64)
        sk[i, : len(h)] = h
        lens[i] = len(h)
    table = build_panel_table(sk, lens).device_arrays()
    return RefPanel([r.name for r in records], jnp.asarray(sk), jnp.asarray(lens), table)
