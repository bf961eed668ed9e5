"""On-chip stage ablation for the hpv16 device step (rkmh.cpp:2656-2718).

Times nested prefixes of engine.hpv16_batch on the real minION reads vs
the full 182-type PAVE panel + sublineage unique tables:

  hash    — multi-k window hashing only
  sort    — hash + full-row bottom-s sort (the occ-rank producer)
  typep   — hash + sort + type-table probe (182 refs, the wide rows)
  uniqp   — hash + sort + uniq-table probe only
  full    — the production hpv16_batch

Plus isolated gather timings at the hpv16 row widths, to separate the
gather engine's fixed per-row cost from byte-proportional cost at
288 B rows.

Run on the TPU from /root/repo:  python scripts/profile_hpv16.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import rkmh_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from rkmh_tpu.classify import engine
    from rkmh_tpu.commands.common import load_packed
    from rkmh_tpu.ops.hashing import multi_k_window_hashes
    from rkmh_tpu.ops.sketch import bottom_s_sketch
    from rkmh_tpu.ops.lookup import (
        build_set_table_device, table_slots,
        lookup_intersection_counts,
    )

    DATA = "/root/reference/data"
    ks = (16,)

    def fetch(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def timeit(f, *a, iters=20):
        out = f(*a)
        fetch(out)
        t0 = time.perf_counter()
        fetch(f(*a))
        base = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*a)
            fetch(out)
            best = min(best, (time.perf_counter() - t0 - base) / (iters - 1))
        return max(best, 1e-9)

    pave = load_packed(f"{DATA}/all_pave_ref.fa")
    subs = load_packed(f"{DATA}/new_refs.fa")
    ph, pm = engine.hash_batch_with_mask(pave.codes, pave.lens, ks)
    sh, sm = engine.hash_batch_with_mask(subs.codes, subs.lens, ks)
    type_table = build_set_table_device(ph, pm, num_refs=len(pave))
    uniq_table = build_set_table_device(sh, sm, num_refs=len(subs))

    reads = load_packed(f"{DATA}/minION25.fq")
    tile = 8 if jax.devices()[0].platform != "cpu" else 1
    codes = jnp.asarray(np.tile(reads.codes, (tile, 1)))
    B, L = codes.shape
    W = L - ks[0] + 1
    bp = int(np.asarray(reads.lens).sum()) * tile
    St = table_slots(type_table.shape[1], len(pave))
    Su = table_slots(uniq_table.shape[1], len(subs))
    print(f"# platform={jax.devices()[0].platform} B={B} L={L} W={W} "
          f"type_table={tuple(type_table.shape)} S={St} "
          f"row={4*type_table.shape[1]}B "
          f"uniq_table={tuple(uniq_table.shape)} S={Su} "
          f"row={4*uniq_table.shape[1]}B")

    @jax.jit
    def f_hash(c):
        h = multi_k_window_hashes(c, list(ks))
        return jax.lax.bitcast_convert_type(h, jnp.int64).sum()

    @jax.jit
    def f_sort(c):
        h = multi_k_window_hashes(c, list(ks))
        full, lens = bottom_s_sketch(h, h.shape[-1])
        return jax.lax.bitcast_convert_type(full, jnp.int64).sum() + lens.sum()

    # tables are jit ARGUMENTS (closure constants would ship the ~600 MB
    # type table inside the remote-compile request body -> HTTP 413)
    @partial(jax.jit, static_argnames=("nrefs",))
    def f_probe(c, tbl, nrefs):
        h = multi_k_window_hashes(c, list(ks))
        full, lens = bottom_s_sketch(h, h.shape[-1])
        tc = lookup_intersection_counts(full, lens, (tbl,), nrefs)
        return tc.sum()

    def f_typep(c):
        return f_probe(c, type_table, nrefs=len(pave))

    def f_uniqp(c):
        return f_probe(c, uniq_table, nrefs=len(subs))

    @jax.jit
    def f_full(c, tt, ut):
        return engine.hpv16_batch(c, tt, ut, ks, len(pave), len(subs)).sum()

    def f_split(c):
        return engine.hpv16_batch_split(
            c, type_table, uniq_table, ks, len(pave), len(subs))

    # round-4 combined table over the SAME ref rows (type sets + sub
    # sets): one wide gather instead of two (engine.hpv16_batch_comb)
    Wall = max(ph.shape[1], sh.shape[1])

    def _padw(a, fill):
        return jnp.pad(a, ((0, 0), (0, Wall - a.shape[1])),
                       constant_values=fill)

    comb_table = build_set_table_device(
        jnp.concatenate([_padw(ph, 0), _padw(sh, 0)]),
        jnp.concatenate([_padw(pm, False), _padw(sm, False)]),
        num_refs=len(pave) + len(subs))
    Wc = engine.hpv16_compact_width(
        np.tile(np.asarray(reads.lens), tile), L, ks)
    print(f"# comb_table={tuple(comb_table.shape)} "
          f"row={4*comb_table.shape[1]}B Wc={Wc}/{W}")

    def f_comb(c):
        return engine.hpv16_batch_comb(
            c, comb_table, ks, len(pave), len(subs), W)

    def f_combc(c):
        return engine.hpv16_batch_comb(
            c, comb_table, ks, len(pave), len(subs), Wc)

    for name, f in [("hash", f_hash), ("sort", f_sort), ("typep", f_typep),
                    ("uniqp", f_uniqp),
                    ("full", lambda c: f_full(c, type_table, uniq_table)),
                    ("split", f_split), ("comb", f_comb), ("combc", f_combc)]:
        dt = timeit(f, codes)
        print(f"{name:6s} {dt*1e3:9.2f} ms/batch  {B/dt:8.0f} reads/s  "
              f"{bp/dt/1e6:8.1f} Mbp/s")

    # --- isolated gather cost at the hpv16 row widths ------------------
    rng = np.random.default_rng(0)
    NQ = B * W
    for nb, width, tag in [(type_table.shape[0], type_table.shape[1], "type"),
                           (uniq_table.shape[0], uniq_table.shape[1], "uniq"),
                           (comb_table.shape[0], comb_table.shape[1], "comb")]:
        tbl = jnp.asarray(rng.integers(0, 2**31, (nb, width), np.int32))
        idx = jnp.asarray(
            rng.integers(0, nb, (B, W), np.int64).astype(np.int32))

        @jax.jit
        def g(t, i):
            return t[i].sum(dtype=jnp.int32)

        dt = timeit(g, tbl, idx)
        print(f"gather-{tag} nb={nb} width={width} {dt*1e3:9.2f} ms  "
              f"{NQ/dt/1e6:7.1f} Mrow/s  "
              f"{NQ*width*4/dt/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
