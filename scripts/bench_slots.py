"""Slot-width sweep for the panel bucket table (zika classify config).

The probe's row gather dominates the classify device step and row bytes
scale with SLOTS (ops/lookup.py), so this measures the full production
step at every candidate width in ONE process (the axon tunnel swings
~2x between sessions — cross-width numbers are only comparable within
one run).  For each S in 2/3/4/8: build the table host-side at that
width, upload once, time the device-resident step.

Run on the TPU from /root/repo:  python scripts/bench_slots.py
"""

import os
import sys
import time

import numpy as np

# `python scripts/bench_slots.py` puts scripts/ (not the repo root) on
# sys.path; bootstrap in-process rather than via PYTHONPATH, which
# breaks axon plugin discovery (CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import rkmh_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from rkmh_tpu.classify import engine
    from rkmh_tpu.commands.common import load_packed
    from rkmh_tpu.ops.lookup import build_panel_table
    from rkmh_tpu.ops.sketch import bottom_s_sketch
    from rkmh_tpu.ops.hashing import multi_k_window_hashes
    from rkmh_tpu.utils import to_host

    # `python scripts/bench_slots.py [1|2]` runs just the zika panel
    # sweep (1) or just the hpv16 set-table sweep (2); default both.
    parts = set(sys.argv[1:]) or {"1", "2"}

    DATA = "/root/reference/data"
    ks, s = (12,), 1000

    if "1" in parts:
        reads = load_packed(f"{DATA}/z1.fq", granularity=32)
        refs = load_packed(f"{DATA}/zika.refs.fa")
        rh = multi_k_window_hashes(jnp.asarray(refs.codes), list(ks))
        ref_sk, ref_lens = to_host(bottom_s_sketch(rh, s))

        tile = 16 if jax.devices()[0].platform != "cpu" else 1
        codes = jnp.asarray(np.tile(reads.codes, (tile, 1)))
        B, L = codes.shape
        print(f"# platform={jax.devices()[0].platform} B={B} L={L}")

        results = {}
        for S in (2, 3, 4, 8):
            pt = build_panel_table(ref_sk, ref_lens, slots=S)
            tbl = (jnp.asarray(pt.table),)
            mb = pt.table.nbytes / 1e6
            def step(c, t):
                # engine fn is already jitted (static ks/sizes)
                return engine.classify_codes_table_packed2(
                    c, t, ks=ks, sketch_size=s, num_refs=pt.num_refs,
                    min_diff=0, min_matches=-1)

            out = step(codes, tbl[0]).block_until_ready()  # compile
            iters = 30
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(codes, tbl[0])
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            results[S] = out
            print(f"S={S}: {dt*1e3:7.2f} ms/step  {B/dt:10.0f} reads/s  "
                  f"table {pt.table.shape} = {mb:7.1f} MB "
                  f"(row {4*pt.table.shape[1]} B)")

        base = np.asarray(to_host(results[4]))
        for S, out in results.items():
            assert np.array_equal(np.asarray(to_host(out)), base), f"S={S} differs"
        print("# all widths bit-identical")

    if "2" not in parts:
        return

    # ---- part 2: hpv16-scale set table (182-genome PAVE panel) --------
    # Here the 64 MB budget forces S=8 (302 MB table, 288 B rows); S=4
    # would be 1.2 GB at 144 B rows and S=3 3.6 GB at 108 B rows — this
    # measures whether the giant-table gather still tracks row bytes.
    # Tables are built ON DEVICE (forced-width _device_set_table) so the
    # sweep never ships hundreds of MB through the tunnel.
    from rkmh_tpu.ops.lookup import (
        _device_set_table_jit, _count_unique_keys, predicted_buckets,
    )
    from rkmh_tpu.classify import engine as eng

    pave = load_packed(f"{DATA}/all_pave_ref.fa")
    subs = load_packed(f"{DATA}/new_refs.fa")
    ks16 = (16,)
    ph, pm = eng.hash_batch_with_mask(pave.codes, pave.lens, ks16)
    n_entries = int(_count_unique_keys(ph, pm))
    sh, sm = eng.hash_batch_with_mask(subs.codes, subs.lens, ks16)
    from rkmh_tpu.ops.lookup import build_set_table_device
    uniq_table = build_set_table_device(sh, sm, num_refs=len(subs))

    mreads = load_packed(f"{DATA}/minION25.fq")
    mtile = 32 if jax.devices()[0].platform != "cpu" else 2
    mcodes = jnp.asarray(np.tile(mreads.codes, (mtile, 1)))
    MB_, ML = mcodes.shape
    print(f"# hpv16 sweep: {n_entries} entries, reads B={MB_} L={ML}")

    h_results = {}
    for S in (8, 4, 3):
        nb = predicted_buckets(n_entries, S)
        while True:
            ttbl, max_rank = _device_set_table_jit(
                ph, pm, nb, len(pave), slots=S)
            if int(max_rank) < S:
                break
            nb *= 2
        mb = ttbl.size * 4 / 1e6

        def hstep(c):
            return eng.hpv16_batch(c, ttbl, uniq_table, ks16,
                                   len(pave), len(subs))

        out = hstep(mcodes).block_until_ready()
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = hstep(mcodes)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        h_results[S] = out
        print(f"hpv16 S={S}: {dt*1e3:8.2f} ms/step  {MB_/dt:9.0f} reads/s  "
              f"table ({nb}, {ttbl.shape[1]}) = {mb:7.1f} MB "
              f"(row {4*ttbl.shape[1]} B)")

    hbase = np.asarray(to_host(h_results[8]))
    for S, out in h_results.items():
        assert np.array_equal(np.asarray(to_host(out)), hbase), f"hpv16 S={S} differs"
    print("# hpv16 widths bit-identical")


if __name__ == "__main__":
    main()
