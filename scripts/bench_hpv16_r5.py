"""Round-5 on-chip hpv16 measurements at the GRADED config (k=18).

VERDICT r4 items 3+4: the 45-Mbp/s round-3 target was met only at the
k=16 shoot-out config (53.9) while the graded k=18 bench config
recorded 43.1; and probe compaction (combc) was only ever A/B'd on a
uniform-length batch.  This script measures, at k=18 on the real chip:

  1. comb vs combc at the bench batch (minION25 x tile) for tile 8/16
  2. slot-width sweep for the combined table (S forced via the device
     builder) — the k=18 table landed on the S=8 budget fallback
  3. isolated gather at each S geometry (the floor for that table)
  4. the skewed-bucket A/B VERDICT item 4 asks for: 24 short reads +
     one full-length nanopore read in one bucket, comb vs combc

Run from /root/repo on the TPU:  python scripts/bench_hpv16_r5.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import rkmh_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from rkmh_tpu.classify import engine
    from rkmh_tpu.commands.common import load_packed
    from rkmh_tpu.ops.lookup import (
        _count_unique_keys, _device_set_table_jit, predicted_buckets,
    )

    DATA = "/root/reference/data"
    ks = (18,)

    def timeit(f, *a, iters=8):
        y = f(*a)
        jax.block_until_ready(y)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = f(*a)
            jax.block_until_ready(y)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    pave = load_packed(f"{DATA}/all_pave_ref.fa")
    subs = load_packed(f"{DATA}/new_refs.fa")
    ph, pm = engine.hash_batch_with_mask(pave.codes, pave.lens, ks)
    sh, sm = engine.hash_batch_with_mask(subs.codes, subs.lens, ks)
    nt, nu = len(pave.lens), len(subs.lens)
    Wall = max(ph.shape[1], sh.shape[1])

    def _padw(a, fill):
        return jnp.pad(a, ((0, 0), (0, Wall - a.shape[1])),
                       constant_values=fill)

    all_h = jnp.concatenate([_padw(ph, 0), _padw(sh, 0)])
    all_m = jnp.concatenate([_padw(pm, False), _padw(sm, False)])
    n_entries = int(_count_unique_keys(all_h, all_m))
    Wm = (nt + nu + 31) // 32
    try:
        ms = jax.local_devices()[0].memory_stats()
        mem = (f"hbm {ms.get('bytes_in_use', -1) >> 20}/"
               f"{ms.get('bytes_limit', -1) >> 20} MB")
    except Exception:
        mem = "hbm ?"
    print(f"# platform={jax.devices()[0].platform} k={ks[0]} "
          f"entries={n_entries} refs={nt}+{nu} Wm={Wm} {mem}", flush=True)

    def build_comb(S):
        nb = predicted_buckets(n_entries, S)
        while True:
            t, mr = _device_set_table_jit(all_h, all_m, nb, nt + nu, slots=S)
            if int(mr) < S:
                return t
            nb *= 2

    def retry(f, tag, tries=4):
        import time as _t

        for i in range(tries):
            try:
                return f()
            except Exception as e:
                print(f"# {tag}: attempt {i+1} failed "
                      f"({type(e).__name__}: {str(e)[:70]}); sleeping",
                      flush=True)
                _t.sleep(30 * (i + 1))
        return None

    reads = load_packed(f"{DATA}/minION25.fq")

    def batch_of(tile):
        codes = jnp.asarray(np.tile(reads.codes, (tile, 1)))
        lens = np.tile(np.asarray(reads.lens), tile)
        bp = int(lens.sum())
        Wc = engine.hpv16_compact_width(lens, codes.shape[1], ks)
        W = codes.shape[1] - ks[0] + 1
        return codes, bp, Wc, W

    # --- tile sweep at production S --------------------------------------
    from rkmh_tpu.ops.lookup import build_set_table_device

    comb_prod = retry(
        lambda: build_set_table_device(all_h, all_m, num_refs=nt + nu,
                                       est_entries=n_entries),
        "production comb build")
    if comb_prod is None:
        print("# production comb table never built; aborting", flush=True)
        return
    for tile in (4, 8, 16):
        try:
            codes, bp, Wc, W = batch_of(tile)

            def comb_t(c):
                return engine.hpv16_batch_comb(c, comb_prod, ks, nt, nu, W)

            def combc_t(c):
                return engine.hpv16_batch_comb(c, comb_prod, ks, nt, nu, Wc)

            dt, dtc = timeit(comb_t, codes), timeit(combc_t, codes)
        except Exception as e:
            print(f"tile={tile:2d} skipped ({type(e).__name__})", flush=True)
            continue
        print(f"tile={tile:2d} B={codes.shape[0]:4d}  "
              f"comb {dt*1e3:7.2f} ms {bp/dt/1e6:6.1f} Mbp/s  "
              f"combc {dtc*1e3:7.2f} ms {bp/dtc/1e6:6.1f} Mbp/s", flush=True)

    # --- 4: genuinely skewed bucket (24 short + 1 long) -------------------
    # one 7.4kb read with 24 short reads padded to its bucket: the case
    # compaction was designed for (engine.py round-4 notes).  Short reads
    # are real minION prefixes so content stays representative.
    long_i = int(np.argmax(np.asarray(reads.lens)))
    L = reads.codes.shape[1]
    skew = np.full((25, L), 4, np.uint8)
    skew[0] = np.asarray(reads.codes[long_i])
    slens = np.zeros(25, np.int64)
    slens[0] = int(np.asarray(reads.lens)[long_i])
    for j in range(1, 25):
        n = 500
        src = np.asarray(reads.codes[(j) % len(reads.lens)])[:n]
        skew[j, :n] = src
        slens[j] = n
    for tile in (8, 16):
        sc = jnp.asarray(np.tile(skew, (tile, 1)))
        sl = np.tile(slens, tile)
        sbp = int(sl.sum())
        sWc = engine.hpv16_compact_width(sl, L, ks)
        sW = L - ks[0] + 1

        def s_comb(c):
            return engine.hpv16_batch_comb(c, comb_prod, ks, nt, nu, sW)

        def s_combc(c):
            return engine.hpv16_batch_comb(c, comb_prod, ks, nt, nu, sWc)

        dt, dtc = timeit(s_comb, sc), timeit(s_combc, sc)
        print(f"skew tile={tile:2d} B={sc.shape[0]:4d} Wc={sWc}/{sW}  "
              f"comb {dt*1e3:7.2f} ms {sbp/dt/1e6:6.1f} Mbp/s  "
              f"combc {dtc*1e3:7.2f} ms {sbp/dtc/1e6:6.1f} Mbp/s  "
              f"({dt/dtc:.2f}x)", flush=True)


    # --- 1+2+3: slot sweep x (comb, combc) + isolated gather ----------
    del comb_prod  # free ~600 MB before the sweep builds
    codes8, bp8, Wc8, W8 = batch_of(8)
    B8 = codes8.shape[0]
    rng = np.random.default_rng(0)
    for S in (4, 6, 8, 12, 16):
        nb_pred = predicted_buckets(n_entries, S)
        width = S * (3 + Wm)
        size_mb = 4 * width * nb_pred >> 20
        if size_mb > 3500:
            print(f"S={S:2d} skipped (projected {size_mb} MB)", flush=True)
            continue
        tbl = retry(lambda: build_comb(S), f"S={S} build", tries=2)
        if tbl is None:
            continue
        nb = tbl.shape[0]

        def comb(c):
            return engine.hpv16_batch_comb(c, tbl, ks, nt, nu, W8)

        def combc(c):
            return engine.hpv16_batch_comb(c, tbl, ks, nt, nu, Wc8)

        dt = timeit(comb, codes8)
        dtc = timeit(combc, codes8)

        idx = jnp.asarray(rng.integers(0, nb, (B8, W8)).astype(np.int32))

        @jax.jit
        def g(t, i):
            return t[i].sum(dtype=jnp.int32)

        dg = timeit(g, tbl, idx)
        nq = B8 * W8
        print(f"S={S:2d} nb={nb} row={4*width}B table={4*width*nb>>20}MB  "
              f"comb {dt*1e3:7.2f} ms {bp8/dt/1e6:6.1f} Mbp/s  "
              f"combc(Wc={Wc8}/{W8}) {dtc*1e3:7.2f} ms {bp8/dtc/1e6:6.1f} "
              f"Mbp/s  gather {dg*1e3:6.2f} ms "
              f"({nq/dg/1e6:5.1f} Mrow/s, {nq*width*4/dg/1e9:5.1f} GB/s)",
              flush=True)
        del tbl

if __name__ == "__main__":
    main()
