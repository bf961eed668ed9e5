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

import time

import numpy as np


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
    table = panel.table
    num_refs = panel.num_refs
    print(f"# platform={jax.devices()[0].platform} B={B} L={L}")

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
    def f_probe(codes):
        h = multi_k_window_hashes(codes, list(ks))
        occ = _occ(h)
        valid = h != np.uint64(0)
        counts = lookup_intersection_counts_masked(
            h, valid, occ, (table,), num_refs)
        return counts.astype(jnp.int32).sum()

    @jax.jit
    def f_full(codes):
        return engine.classify_codes_table_packed2(
            codes, *table, ks=ks, sketch_size=s,
            num_refs=num_refs, min_diff=0, min_matches=-1).sum()

    iters = 30
    for name, f in [("hash", f_hash), ("occ", f_occ),
                    ("probe", f_probe), ("full", f_full)]:
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
