"""`call` command — alignment-free variant calling, VCF output.

Mirrors rkmh main_call (rkmh.cpp:1455-1904) with the enumeration kernel
in call_engine.py.  Flow: hash all reads -> exact hash->depth map
(ops/hashmap) -> per reference: positional depth, trailing-window
average, low-depth sites, SNP/DEL mutation rescue -> aggregate into VCF
records keyed and sorted exactly like the reference's std::map<string>
(lexicographic over "ref\\tpos\\t.\\tREF\\tALT" — so positions sort as
strings, 10 < 2, matching rkmh's output order).

Header quirks preserved byte-for-byte (rkmh.cpp:1740-1747): INFO declares
ID=KD but records emit KC=; the RD and OD INFO lines are concatenated on
one line (missing endl in the reference).

One deliberate improvement: the reference's -d/--show-depth path builds
its per-position "j\\tavg\\tdepth\\trescue" lines in a stringstream it
never prints (SURVEY.md §8 Q7-adjacent dead path); we actually emit them.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from rkmh_tpu import call_engine
from rkmh_tpu.classify import engine
from rkmh_tpu.commands.common import (
    bucketed_batches, load_packed, load_records, log,
)
from rkmh_tpu.io.packing import bucket_length, encode_seqs
from rkmh_tpu.ops.hashmap import depth_map_from_hashes
from rkmh_tpu.utils import to_host

_BASE = "ACGT"


@dataclass
class CallConfig:
    ref_files: list = field(default_factory=list)
    read_files: list = field(default_factory=list)
    ks: tuple = ()
    window_len: int = 100
    show_depth: bool = False
    batch_size: int = 2048
    devices: int = 0     # --devices: shard the positional scan over N devices


def _code_char(c: int) -> str:
    return _BASE[c] if c < 4 else "N"


def run(cfg: CallConfig, out=None) -> int:
    out = out or sys.stdout
    from rkmh_tpu.commands.common import resolve_batch_size

    cfg.batch_size = resolve_batch_size(cfg.batch_size)
    if not cfg.ks:
        log("No kmer size(s) provided. Will use a default kmer size of 16.")
        ks = (16,)
    elif len(cfg.ks) > 1:
        log("Only a single kmer size may be used for calling.")
        return 1
    else:
        ks = tuple(cfg.ks)
    k = ks[0]

    if not cfg.ref_files or not cfg.read_files:
        log("call requires at least one reference and one read file.")
        return 1
    log("Parsing sequences...")
    refs = load_records(cfg.ref_files)
    reads = load_packed(cfg.read_files)
    if not refs or not len(reads):
        log("call requires at least one reference and one read file.")
        return 1

    # read depth map: every k-mer occurrence, zeros included
    # (rkmh.cpp:1616-23).  bucketed_batches pads row counts to powers of
    # two instead of the full batch size — full-batch padding turned 25
    # nanopore reads into a 16384x7409 batch (~1 GB of padding hashed
    # AND fetched; measured 9 s of the old 14 s wall).
    all_h, all_m = [], []
    for rows, codes, lens in bucketed_batches(reads, cfg.batch_size):
        hashes, mask = engine.hash_batch_with_mask(codes, lens, ks)
        h_np, m_np = to_host((hashes, mask))
        all_h.append(h_np[: len(rows)])
        all_m.append(m_np[: len(rows)])
    table = depth_map_from_hashes(
        np.concatenate([h.ravel() for h in all_h]),
        np.concatenate([m.ravel() for m in all_m]),
    ).device_arrays()

    if len(refs) > 1:
        log("WARNING: more than one ref provided. VCF will not be correct")

    output_vcf = not cfg.show_depth
    if output_vcf:
        # header quirks preserved: KD vs KC, RD+OD on one line (rkmh.cpp:1740-47)
        out.write(
            "##fileformat=VCF4.2\n##source=rkmh\n"
            f"##reference={cfg.ref_files[0]}\n"
            '##INFO=<ID=KD,Number=1,Type=Integer,Description="Number of times call for specific kmer appears">\n'
            '##INFO=<ID=MD,Number=1,Type=Integer,Description="Maximum depth found for the rescue kmer.">\n'
            '##INFO=<ID=RD,Number=1,Type=Integer,Description="Average depth in region">'
            '##INFO=<ID=OD,Number=1,Type=Integer,Description="Depth of original kmer at site before modification.">\n'
        )

    call_count: dict[str, int] = {}
    call_max_depth: dict[str, int] = {}
    call_avg_depth: dict[str, int] = {}
    call_orig_depth: dict[str, int] = {}

    def record(key: str, alt_depth: int, avg_d: int, depth: int):
        call_count[key] = call_count.get(key, 0) + 1
        call_avg_depth[key] = max(avg_d, call_avg_depth.get(key, 0))
        call_orig_depth[key] = max(depth, call_orig_depth.get(key, 0))
        if alt_depth > call_max_depth.get(key, 0):
            call_max_depth[key] = alt_depth

    # --devices N: the positional scan (depth + windowed average + SNP/DEL
    # enumeration) shards reference positions over a dp mesh
    # (mesh.sharded_call_scan_fn: k-halo code slices, a window_len depth
    # halo via ppermute).  Bit-identical to call_scan_ref; genomes whose
    # per-device span would be shorter than the depth window fall back.
    scan_sharded = None
    if cfg.devices > 1:
        import jax

        n_vis = len(jax.devices())
        if cfg.devices > n_vis:
            log(f"call --devices ignored (--devices {cfg.devices} > {n_vis} "
                "visible device(s)); running single-device")
        else:
            from rkmh_tpu.parallel.mesh import make_mesh, sharded_call_scan_fn

            mesh = make_mesh(jax.devices()[: cfg.devices],
                             dp=cfg.devices, tp=1)
            scan_sharded = sharded_call_scan_fn(mesh, k, cfg.window_len)

    for ref in refs:
        if len(ref.seq) < k:
            continue
        P = len(ref.seq) - k + 1
        Pl = -(-P // cfg.devices) if scan_sharded is not None else 0
        if scan_sharded is not None and Pl >= cfg.window_len:
            n = cfg.devices
            codes, _ = encode_seqs([ref.seq], pad_to=n * Pl + k)
            padded = np.concatenate(
                [np.full(1, 4, np.uint8), codes[0]])  # row j reaches ref[j-1]
            slices = np.stack([
                padded[d * Pl : d * Pl + Pl + k + 1] for d in range(n)
            ])
            res = scan_sharded(slices, table)
        else:
            if scan_sharded is not None:
                log(f"call --devices: {ref.name} spans only {P} positions "
                    f"(< window {cfg.window_len} per device); single-device")
            L = bucket_length(len(ref.seq))
            codes, _ = encode_seqs([ref.seq], pad_to=L)
            res = call_engine.call_scan_ref(codes[0], table, k, cfg.window_len)
        res = to_host(res)

        depth = res["depth"][:P]
        avg = res["avg"][:P]

        if cfg.show_depth:
            rescue = res["max_rescue"][:P]
            shown = np.where(rescue > 0, rescue, depth)
            for j in range(P):
                out.write(f"{j}\t{avg[j]}\t{depth[j]}\t{shown[j]}\n")
            continue

        # windows rebuilt host-side (cheap; avoids fetching uint8 tensors)
        row = codes[0]
        win = np.lib.stride_tricks.sliding_window_view(row, k)[:P]
        dpad = np.concatenate([np.full(1, 4, np.uint8), row])
        dwin = np.lib.stride_tricks.sliding_window_view(dpad, k + 1)[:P]
        snp_call = res["snp_call"][:P]
        snp_depth = res["snp_depth"][:P]
        del_call = res["del_call"][:P]
        del_depth = res["del_depth"][:P]

        for j, ap, b in zip(*np.nonzero(snp_call)):
            orig = _code_char(int(win[j, ap]))
            alt = _code_char(int(call_engine.ROT[int(win[j, ap]), b]))
            pos = int(j) + int(ap) + 1
            key = f"{ref.name}\t{pos}\t.\t{orig}\t{alt}"
            record(key, int(snp_depth[j, ap, b]), int(avg[j]), int(depth[j]))

        for j, api in zip(*np.nonzero(del_call)):
            ap = int(api) + 1               # reference loops alt_pos in [1, k]
            orig = _code_char(int(dwin[j, ap]))
            pos = int(j) + ap + 1
            key = f"{ref.name}\t{pos}\t.\t{orig}\t-"
            record(key, int(del_depth[j, api]), int(avg[j]), int(depth[j]))

    if output_vcf:
        for key in sorted(call_count):  # std::map iteration order
            out.write(
                f"{key}\t99\tPASS\tKC={call_count[key]};MD={call_max_depth.get(key, 0)};"
                f"RD={call_avg_depth.get(key, 0)};OD={call_orig_depth.get(key, 0)}\n"
            )
    return 0
