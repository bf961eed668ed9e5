"""On-chip shoot-out of probe DISPATCH STRUCTURES for both hot kernels
(zika classify, hpv16 typing) — the round-3 evidence base for why each
production path is shaped the way it is (ROUND3.md).

Variants, every one asserted bit-identical to the fused baseline:

  fused  the whole step in one jit (production for zika classify —
         the small panel's in-fusion gather beats a materializing one)
  split  stage1 / bare row gather (own dispatch -> own kCustom gather
         fusion) / compare+popcount finish (production for hpv16 —
         1.4x on the 604 MB type panel)
  gsel   stage1 / gather+compare+select fused (compact [B,W,Wm] out) /
         popcount finish — REJECTED: fusing ANY consumer onto the big
         gather forfeits the bare-gather fusion (hpv16 gsel == fused)
  keys2  two-array table: bare KEYS gather (3S u32 rows) -> compare to
         a flat slot index -> bare gather of only the hit slot's mask
         row (Wm u32) -> popcount — REJECTED: the gather engine
         degrades sharply below ~48 B rows (zika 41 ms vs 9.6 fused;
         hpv16 82 ms vs 23 split)

Reference hot loops: rkmh.cpp:867-870 (classify), rkmh.cpp:2656-2718
(hpv16).  Run on the TPU from /root/repo:
    python scripts/bench_probe_variants.py
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
    from rkmh_tpu.commands.common import build_ref_panel, load_packed
    from rkmh_tpu.ops.hashing import multi_k_window_hashes
    from rkmh_tpu.ops.lookup import (
        bucket_indices, counts_from_rows, table_slots,
        build_set_table_device)
    from rkmh_tpu.ops.popcount import vertical_popcounts

    DATA = "/root/reference/data"
    print(f"# platform={jax.devices()[0].platform}", flush=True)

    def fetch(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def timeit(f, *a, iters=20):
        fetch(f(*a))
        t0 = time.perf_counter()
        fetch(f(*a))
        base = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = f(*a)
            fetch(out)
            best = min(best, (time.perf_counter() - t0 - base) / (iters - 1))
        return max(best, 1e-9)

    def split_tables(table, S, Wm):
        """keys2 layout: [nb, 3S] keys + [nb*S (+1 zero sentinel), Wm]
        per-slot mask rows."""
        nb = table.shape[0]
        keys = np.asarray(table[:, : 3 * S])
        masks = (np.asarray(table[:, 3 * S:])
                 .reshape(nb, Wm, S).transpose(0, 2, 1)
                 .reshape(nb * S, Wm))
        masks = np.concatenate([masks, np.zeros((1, Wm), np.uint32)])
        return jnp.asarray(keys), jnp.asarray(masks)

    @partial(jax.jit, static_argnames=("Sx", "Wmx"))
    def gsel(tbl, bidx, lo, hi, occ, qmask, Sx, Wmx):
        rows = tbl[bidx]
        hi_e = rows[..., 0:Sx]
        lo_e = rows[..., Sx:2 * Sx]
        occ_e = rows[..., 2 * Sx:3 * Sx]
        occ = occ.astype(jnp.uint32)
        hit = ((lo_e == lo[..., None]) & (occ_e == occ[..., None])
               & qmask[..., None])
        zero = np.uint32(0)
        ok = jnp.max(jnp.where(hit, hi_e, zero), axis=-1) == hi
        sels = []
        for w in range(Wmx):
            mw = rows[..., (3 + w) * Sx:(4 + w) * Sx]
            sel = jnp.max(jnp.where(hit, mw, zero), axis=-1)
            sels.append(jnp.where(ok, sel, zero))
        return jnp.stack(sels, axis=-1)            # [B, W, Wm]

    @partial(jax.jit, static_argnames=("Sx",))
    def compare_to_flat(rows_k, lo, hi, occ, qmask, bidx, Sx):
        hi_e = rows_k[..., 0:Sx]
        lo_e = rows_k[..., Sx:2 * Sx]
        occ_e = rows_k[..., 2 * Sx:3 * Sx]
        occ = occ.astype(jnp.uint32)
        hit = ((lo_e == lo[..., None]) & (occ_e == occ[..., None])
               & qmask[..., None])
        zero = np.uint32(0)
        ok = jnp.max(jnp.where(hit, hi_e, zero), axis=-1) == hi
        slot = jnp.argmax(hit, axis=-1).astype(jnp.int32)
        anyhit = jnp.any(hit, axis=-1) & ok
        return jnp.where(anyhit, bidx * Sx + slot, -1)

    @jax.jit
    def bare_gather(tbl, idx):
        return tbl[idx]

    @partial(jax.jit, static_argnames=("sent",))
    def mask_gather(tbl, flat, sent):
        return tbl[jnp.where(flat < 0, sent, flat)]

    # ---------------- zika classify ----------------
    ks, s = (12,), 1000
    reads = load_packed(f"{DATA}/z1.fq", granularity=32)
    panel = build_ref_panel(load_packed(f"{DATA}/zika.refs.fa"), ks, s)
    codes = jnp.asarray(np.tile(reads.codes, (16, 1)))
    B, L = codes.shape
    (ztable,) = panel.table
    R = panel.num_refs
    S = table_slots(ztable.shape[1], R)
    Wm = ztable.shape[1] // S - 3
    znb = ztable.shape[0]
    zkeys, zmasks = split_tables(ztable, S, Wm)
    zsent = zmasks.shape[0] - 1
    print(f"# zika B={B} L={L} table={tuple(ztable.shape)} S={S} "
          f"row={4 * ztable.shape[1]}B", flush=True)

    def _occ(h):
        W = h.shape[-1]
        lower = np.tril(np.ones((W, W), dtype=bool), k=-1)
        eq = h[:, None, :] == h[:, :, None]
        return jnp.sum(eq & lower[None], axis=-1).astype(jnp.uint32)

    @partial(jax.jit, static_argnames=("nb",))
    def z_stage1(codes, nb):
        h = multi_k_window_hashes(codes, list(ks))
        occ = _occ(h)
        qmask = h != np.uint64(0)
        lo = h.astype(jnp.uint32)
        hi = (h >> np.uint64(32)).astype(jnp.uint32)
        sk_lens = jnp.sum(qmask, axis=-1).astype(jnp.int32)
        return lo, hi, occ, qmask, sk_lens, bucket_indices(lo, hi, occ, nb)

    @partial(jax.jit, static_argnames=("nrefs",))
    def z_finish(rows, lo, hi, occ, qmask, sk_lens, nrefs):
        counts = counts_from_rows(rows, lo, hi, occ, qmask, nrefs)
        return engine._pack2(*engine.argmax_stream(counts, 0, -1, sk_lens))

    @partial(jax.jit, static_argnames=("nrefs",))
    def z_pfinish(sels, sk_lens, nrefs):
        counts = jnp.concatenate(
            [vertical_popcounts(sels[..., w], min(32, nrefs - 32 * w))
             for w in range(sels.shape[-1])], axis=-1)
        return engine._pack2(*engine.argmax_stream(counts, 0, -1, sk_lens))

    def z_fused(codes):
        return engine.classify_codes_table_packed2(
            codes, ztable, ks=ks, sketch_size=s,
            num_refs=R, min_diff=0, min_matches=-1)

    def z_split(codes):
        lo, hi, occ, qmask, sk_lens, bidx = z_stage1(codes, znb)
        rows = bare_gather(ztable, bidx)
        return z_finish(rows, lo, hi, occ, qmask, sk_lens, R)

    def z_gsel(codes):
        lo, hi, occ, qmask, sk_lens, bidx = z_stage1(codes, znb)
        sels = gsel(ztable, bidx, lo, hi, occ, qmask, S, Wm)
        return z_pfinish(sels, sk_lens, R)

    def z_keys2(codes):
        lo, hi, occ, qmask, sk_lens, bidx = z_stage1(codes, znb)
        rows_k = bare_gather(zkeys, bidx)
        flat = compare_to_flat(rows_k, lo, hi, occ, qmask, bidx, S)
        selrows = mask_gather(zmasks, flat, zsent)
        return z_pfinish(selrows, sk_lens, R)

    ref = np.asarray(z_fused(codes))
    for nm, f in [("fused", z_fused), ("split", z_split),
                  ("gsel", z_gsel), ("keys2", z_keys2)]:
        got = np.asarray(f(codes))
        dt = timeit(f, codes)
        eq = "OK " if np.array_equal(got, ref) else "MISMATCH"
        print(f"zika {nm:6s} {dt*1e3:8.2f} ms  {B/dt:9.0f} reads/s  {eq}",
              flush=True)

    # ---------------- hpv16 ----------------
    ks2 = (16,)
    pave = load_packed(f"{DATA}/all_pave_ref.fa")
    subs = load_packed(f"{DATA}/new_refs.fa")
    ph, pm = engine.hash_batch_with_mask(pave.codes, pave.lens, ks2)
    sh, sm = engine.hash_batch_with_mask(subs.codes, subs.lens, ks2)
    type_table = build_set_table_device(ph, pm, num_refs=len(pave.lens))
    uniq_table = build_set_table_device(sh, sm, num_refs=len(subs.lens))
    nt, nu = len(pave.lens), len(subs.lens)
    St = table_slots(type_table.shape[1], nt)
    Wmt = type_table.shape[1] // St - 3
    Su = table_slots(uniq_table.shape[1], nu)
    Wmu = uniq_table.shape[1] // Su - 3
    tkeys, tmasks = split_tables(type_table, St, Wmt)
    ukeys, umasks = split_tables(uniq_table, Su, Wmu)
    tsent, usent = tmasks.shape[0] - 1, umasks.shape[0] - 1

    # round-4 combined table: ONE table spanning type bits + uniq bits
    # (one wide gather replaces the 288 B-row + narrow-row pair)
    Wall = max(ph.shape[1], sh.shape[1])

    def _padw(a, fill):
        return jnp.pad(a, ((0, 0), (0, Wall - a.shape[1])),
                       constant_values=fill)

    comb_table = build_set_table_device(
        jnp.concatenate([_padw(ph, 0), _padw(sh, 0)]),
        jnp.concatenate([_padw(pm, False), _padw(sm, False)]),
        num_refs=nt + nu)

    mreads = load_packed(f"{DATA}/minION25.fq")
    hcodes = jnp.asarray(np.tile(mreads.codes, (8, 1)))
    HB = hcodes.shape[0]
    bp = int(np.asarray(mreads.lens).sum()) * 8
    print(f"# hpv16 B={HB} type={tuple(type_table.shape)} S={St} "
          f"uniq={tuple(uniq_table.shape)} S={Su} "
          f"comb={tuple(comb_table.shape)}", flush=True)

    @partial(jax.jit, static_argnames=("num_types", "num_uniq"))
    def h_pfinish(selt, selu, num_types, num_uniq):
        tc = jnp.concatenate(
            [vertical_popcounts(selt[..., w], min(32, num_types - 32 * w))
             for w in range(selt.shape[-1])], axis=-1)
        uc = jnp.concatenate(
            [vertical_popcounts(selu[..., w], min(32, num_uniq - 32 * w))
             for w in range(selu.shape[-1])], axis=-1)
        best = jnp.argmax(tc, axis=-1)
        max_shared = jnp.max(tc, axis=-1)
        return jnp.concatenate(
            [best.astype(jnp.int64)[:, None],
             max_shared.astype(jnp.int64)[:, None],
             uc.astype(jnp.int64)], axis=1)

    def h_fused(c):
        return engine.hpv16_batch(c, type_table, uniq_table, ks2, nt, nu)

    def h_split(c):
        return engine.hpv16_batch_split(c, type_table, uniq_table, ks2, nt, nu)

    def h_stage1(c):
        return engine.hpv16_split_stage1(
            c, ks=ks2, nb_type=type_table.shape[0],
            nb_uniq=uniq_table.shape[0])

    def h_gsel(c):
        lo, hi, occ, qmask, bidx_t, bidx_u = h_stage1(c)
        st = gsel(type_table, bidx_t, lo, hi, occ, qmask, St, Wmt)
        su = gsel(uniq_table, bidx_u, lo, hi, occ, qmask, Su, Wmu)
        return h_pfinish(st, su, nt, nu)

    def h_keys2(c):
        lo, hi, occ, qmask, bidx_t, bidx_u = h_stage1(c)
        rk_t = bare_gather(tkeys, bidx_t)
        flat_t = compare_to_flat(rk_t, lo, hi, occ, qmask, bidx_t, St)
        selt = mask_gather(tmasks, flat_t, tsent)
        rk_u = bare_gather(ukeys, bidx_u)
        flat_u = compare_to_flat(rk_u, lo, hi, occ, qmask, bidx_u, Su)
        selu = mask_gather(umasks, flat_u, usent)
        return h_pfinish(selt, selu, nt, nu)

    HW = sum(hcodes.shape[1] - k + 1 for k in ks2)
    hlens_tiled = np.tile(np.asarray(mreads.lens), 8)
    HWc = engine.hpv16_compact_width(hlens_tiled, hcodes.shape[1], ks2)

    def h_comb(c):
        return engine.hpv16_batch_comb(c, comb_table, ks2, nt, nu, HW)

    def h_combc(c):
        return engine.hpv16_batch_comb(c, comb_table, ks2, nt, nu, HWc)

    href = np.asarray(h_fused(hcodes))
    for nm, f in [("fused", h_fused), ("split", h_split),
                  ("comb", h_comb), ("combc", h_combc),
                  ("gsel", h_gsel), ("keys2", h_keys2)]:
        got = np.asarray(f(hcodes))
        dt = timeit(f, hcodes, iters=5)
        eq = "OK " if np.array_equal(got, href) else "MISMATCH"
        print(f"hpv16 {nm:6s} {dt*1e3:8.2f} ms  {HB/dt:7.0f} reads/s  "
              f"{bp/dt/1e6:7.1f} Mbp/s  {eq}", flush=True)


if __name__ == "__main__":
    main()
