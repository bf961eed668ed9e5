"""On-chip stage ablation for the classify hot path (zika config).

Times four nested prefixes of the device step on identical input:
  hash   — canonical window hashing only (ops/hashing XLA path)
  occ    — hash + duplicate-occurrence counts (the W x W prefix-equality)
  probe  — hash + occ + bucket-table intersection counts
  full   — the production classify_codes_table_packed2 step

Each prefix ends in a tiny reduction so XLA must compute the whole
stage but the D2H fetch stays negligible.  Run on the TPU from
/root/repo (no PYTHONPATH, no JAX_PLATFORMS override):

    python scripts/profile_stages.py
"""

import os
import sys
import time

import numpy as np

# `python scripts/profile_stages.py` puts scripts/ (not the repo root)
# on sys.path; bootstrap in-process rather than via PYTHONPATH, which
# breaks axon plugin discovery (CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import rkmh_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from rkmh_tpu.classify import engine
    from rkmh_tpu.commands.common import build_ref_panel, load_packed
    from rkmh_tpu.ops.hashing import multi_k_window_hashes
    from rkmh_tpu.ops.lookup import lookup_intersection_counts_masked

    DATA = "/root/reference/data"
    ks, s = (12,), 1000

    reads = load_packed(f"{DATA}/z1.fq", granularity=32)
    panel = build_ref_panel(load_packed(f"{DATA}/zika.refs.fa"), ks, s)
    codes = jnp.asarray(np.tile(reads.codes, (16, 1)))
    B, L = codes.shape
    table_arrays = panel.table   # 1-tuple of the bucket-table array
    (table,) = table_arrays
    num_refs = panel.num_refs
    from rkmh_tpu.ops.lookup import table_slots
    print(f"# platform={jax.devices()[0].platform} B={B} L={L} "
          f"slots={table_slots(table.shape[1], num_refs)} "
          f"table={tuple(table.shape)} row_bytes={4 * table.shape[1]}")

    def _occ(h):
        W = h.shape[-1]
        lower = np.tril(np.ones((W, W), dtype=bool), k=-1)
        eq = h[:, None, :] == h[:, :, None]
        return jnp.sum(eq & lower[None], axis=-1).astype(jnp.uint32)

    @jax.jit
    def f_hash(codes):
        h = multi_k_window_hashes(codes, list(ks))
        return jax.lax.bitcast_convert_type(h, jnp.int64).sum()

    @jax.jit
    def f_occ(codes):
        h = multi_k_window_hashes(codes, list(ks))
        return _occ(h).astype(jnp.int32).sum()

    @jax.jit
    def f_gather(codes):
        # row gather alone: bucket index + table row fetch + cheap reduce
        from rkmh_tpu.ops.lookup import _MIX, _MUL
        h = multi_k_window_hashes(codes, list(ks))
        lo = h.astype(jnp.uint32)
        hi = (h >> np.uint64(32)).astype(jnp.uint32)
        nb = table.shape[0]
        shift = np.uint32(32 - int(np.log2(nb)))
        x = (lo ^ (hi * np.uint32(_MIX))) * np.uint32(_MUL)
        rows = table[(x >> shift).astype(jnp.int32)]
        return rows.astype(jnp.int32).sum()

    # lane-dtype experiment: same row bytes gathered as half as many
    # i64 lanes — distinguishes per-byte from per-element gather cost
    # (the pad16 experiment showed cost tracks bytes, not alignment;
    # this one tests whether lane COUNT carries a separate fixed cost)
    assert table.shape[1] % 2 == 0
    table64 = jax.lax.bitcast_convert_type(
        table.reshape(table.shape[0], -1, 2), jnp.uint64
    )

    @jax.jit
    def f_gather64(codes):
        from rkmh_tpu.ops.lookup import _MIX, _MUL
        h = multi_k_window_hashes(codes, list(ks))
        lo = h.astype(jnp.uint32)
        hi = (h >> np.uint64(32)).astype(jnp.uint32)
        nb = table64.shape[0]
        shift = np.uint32(32 - int(np.log2(nb)))
        x = (lo ^ (hi * np.uint32(_MIX))) * np.uint32(_MUL)
        rows = table64[(x >> shift).astype(jnp.int32)]
        return jax.lax.bitcast_convert_type(rows, jnp.int64).sum()

    @jax.jit
    def f_probe(codes):
        h = multi_k_window_hashes(codes, list(ks))
        occ = _occ(h)
        valid = h != np.uint64(0)
        counts = lookup_intersection_counts_masked(
            h, valid, occ, (table,), num_refs)
        return counts.astype(jnp.int32).sum()

    @jax.jit
    def f_full_alt(codes):
        # probe with the bit-unpack reformulated as one [B, W, 32] i8
        # reduction per mask word instead of R separate reductions
        from rkmh_tpu.ops.lookup import _MIX, _MUL, table_slots
        h = multi_k_window_hashes(codes, list(ks))
        occ = _occ(h)
        qmask = h != np.uint64(0)
        lo = h.astype(jnp.uint32)
        hi = (h >> np.uint64(32)).astype(jnp.uint32)
        nb = table.shape[0]
        SLOTS = table_slots(table.shape[1], num_refs)
        Wm = table.shape[1] // SLOTS - 3
        shift = np.uint32(32 - int(np.log2(nb)))
        occ_u = occ.astype(jnp.uint32)
        x = (lo ^ (hi * np.uint32(_MIX)) ^ (occ_u * np.uint32(_MIX))) * np.uint32(_MUL)
        rows = table[(x >> shift).astype(jnp.int32)]
        hi_e = rows[..., 0:SLOTS]
        lo_e = rows[..., SLOTS:2 * SLOTS]
        occ_e = rows[..., 2 * SLOTS:3 * SLOTS]
        hit = (lo_e == lo[..., None]) & (occ_e == occ_u[..., None]) & qmask[..., None]
        zero = np.uint32(0)
        sel_hi = jnp.max(jnp.where(hit, hi_e, zero), axis=-1)
        ok = sel_hi == hi
        outs = []
        for w in range(Wm):
            mw = rows[..., (3 + w) * SLOTS:(4 + w) * SLOTS]
            sel = jnp.max(jnp.where(hit, mw, zero), axis=-1)
            sel = jnp.where(ok, sel, zero)
            bits = ((sel[..., None] >> jnp.arange(32, dtype=jnp.uint32))
                    & np.uint32(1)).astype(jnp.int8)
            outs.append(bits.sum(axis=1, dtype=jnp.int32))   # [B, 32]
        counts = jnp.concatenate(outs, axis=-1)[:, :num_refs]
        return counts.sum()

    @jax.jit
    def f_full(codes):
        return engine.classify_codes_table_packed2(
            codes, *table_arrays, ks=ks, sketch_size=s,
            num_refs=num_refs, min_diff=0, min_matches=-1).sum()

    # alignment experiment: same probe but rows zero-padded to 16 lanes
    # (64 B) — tests whether row alignment beats the extra bytes
    width = table.shape[1]
    pad_lanes = (-width) % 16
    table_pad = jnp.pad(table, ((0, 0), (0, pad_lanes)))

    def _probe_on(tbl, codes):
        from rkmh_tpu.ops.lookup import _MIX, _MUL, table_slots
        h = multi_k_window_hashes(codes, list(ks))
        occ = _occ(h)
        qmask = h != np.uint64(0)
        lo = h.astype(jnp.uint32)
        hi = (h >> np.uint64(32)).astype(jnp.uint32)
        nb = tbl.shape[0]
        S = table_slots(width, num_refs)
        Wm = width // S - 3
        shift = np.uint32(32 - int(np.log2(nb)))
        occ_u = occ.astype(jnp.uint32)
        x = (lo ^ (hi * np.uint32(_MIX)) ^ (occ_u * np.uint32(_MIX))) * np.uint32(_MUL)
        rows = tbl[(x >> shift).astype(jnp.int32)][..., :width]
        hi_e = rows[..., 0:S]
        lo_e = rows[..., S:2 * S]
        occ_e = rows[..., 2 * S:3 * S]
        hit = (lo_e == lo[..., None]) & (occ_e == occ_u[..., None]) & qmask[..., None]
        zero = np.uint32(0)
        sel_hi = jnp.max(jnp.where(hit, hi_e, zero), axis=-1)
        ok = sel_hi == hi
        tot = jnp.zeros((), jnp.uint32)
        for w in range(Wm):
            mw = rows[..., (3 + w) * S:(4 + w) * S]
            sel = jnp.max(jnp.where(hit, mw, zero), axis=-1)
            tot = tot + jnp.where(ok, sel, zero).sum()
        return tot

    @jax.jit
    def f_pad16(codes):
        return _probe_on(table_pad, codes)

    iters = 30
    for name, f in [("hash", f_hash), ("occ", f_occ),
                    ("gather", f_gather), ("gather64", f_gather64),
                    ("probe", f_probe), ("full", f_full),
                    ("alt", f_full_alt), ("pad16", f_pad16)]:
        f(codes).block_until_ready()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = None
            for _ in range(iters):
                y = f(codes)
            y.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name:6s} {best * 1e3:8.2f} ms/batch  "
              f"{B / best:10.0f} reads/s")


if __name__ == "__main__":
    main()
