"""On-chip microbenchmarks for the classify probe's row gather.

The panel-table row gather is ~88% of the classify device step
(scripts/profile_stages.py).  This measures every gather mechanism the
hardware/Mosaic stack offers, to decide whether a fused Pallas probe
kernel can beat XLA's gather:

  xla-S     XLA row gather at slot width S (the production mechanism)
  dg0-N     Pallas tpu.dynamic_gather along sublanes from an [N, 128]
            VMEM LUT (take_along_axis pattern) — the candidate
            vector-rate mechanism, swept over LUT heights N
  dg1       Pallas tpu.dynamic_gather along lanes (128-entry LUT)

Run on the TPU from /root/repo:  python scripts/bench_gather.py
"""

import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, iters=50):
    """Per-call time with a REAL device->host fetch closing each loop.

    Through the remote-TPU tunnel, block_until_ready on a never-fetched
    buffer has been observed returning early (round-3 probe: a 95 MB
    materialize "completing" in 19 us), so loops are closed by fetching
    one element of the result — the ~30 ms fetch round-trip amortizes
    over the loop and is subtracted via a 1-iteration calibration run.
    """
    out = f(*args)
    fetch(out)
    best = float("inf")
    t0 = time.perf_counter()
    fetch(f(*args))
    base = time.perf_counter() - t0  # dispatch+fetch overhead, 1 iter
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fetch(out)
        dt = (time.perf_counter() - t0 - base) / (iters - 1)
        best = min(best, dt)
    return max(best, 1e-9), out


def fetch(x):
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def main():
    import rkmh_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    platform = jax.devices()[0].platform
    print(f"# platform={platform}")
    interpret = platform == "cpu"

    # --- workload shape: zika classify probe ---
    B, W = 16000, 149          # reads x windows per batch
    NQ = B * W                 # total probed elements / batch

    rng = np.random.default_rng(0)

    # --- 1. XLA row gather baseline, swept over table geometry ---------
    for nb, width, tag in [(32768, 10, "S2"), (32768, 20, "S4"),
                           (8192, 10, "S2-small"), (131072, 10, "S2-big")]:
        table = jnp.asarray(rng.integers(0, 2**31, (nb, width), np.int32))
        idx = jnp.asarray(rng.integers(0, nb, (B, W), np.int64).astype(np.int32))

        @jax.jit
        def f(t, i):
            return t[i].sum(dtype=jnp.int32)

        dt, _ = timeit(f, table, idx)
        print(f"xla-{tag:9s} nb={nb:7d} width={width:3d} "
              f"{dt*1e3:8.3f} ms  {NQ/dt/1e6:8.1f} Mrow/s")

    # --- 2. Pallas dynamic_gather along sublanes -----------------------
    # out[i, j] = lut[idx[i, j], j]: per-lane LUT of N entries.  Queries
    # per call = N*128 (shape constraint: out == lut shape).  lax.gather
    # is built directly (jnp.take_along_axis promotes indices to int64
    # under jax_enable_x64, which Mosaic rejects).
    import jax.lax as lax

    def _dg(x, idx, dim):
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(),
            collapsed_slice_dims=(dim,),
            start_index_map=(dim,),
            operand_batching_dims=(1 - dim,),
            start_indices_batching_dims=(1 - dim,),
        )
        return lax.gather(
            x, idx[..., None], dnums, (1, 1),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def dg0_kernel(lut_ref, idx_ref, out_ref):
        out_ref[:] = _dg(lut_ref[:], idx_ref[:], 0)

    for N in (8, 64, 512, 4096, 16384):
        lut = jnp.asarray(rng.integers(0, 2**31, (N, 128), np.int32))
        idx = jnp.asarray(rng.integers(0, N, (N, 128), np.int32))

        @jax.jit
        def g(lut, idx):
            return pl.pallas_call(
                dg0_kernel,
                out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(lut, idx)

        try:
            dt, out = timeit(g, lut, idx)
        except Exception as e:  # noqa: BLE001
            print(f"dg0-{N:<6d} UNSUPPORTED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
            continue
        exp = np.take_along_axis(np.asarray(lut), np.asarray(idx), 0)
        ok = np.array_equal(np.asarray(out), exp)
        nq = N * 128
        print(f"dg0-{N:<6d} {dt*1e3:8.3f} ms  {nq/dt/1e6:8.1f} Mgather/s  "
              f"correct={ok}")

    # --- 3. Pallas dynamic_gather along lanes (128-entry LUT) ----------
    def dg1_kernel(lut_ref, idx_ref, out_ref):
        out_ref[:] = _dg(lut_ref[:], idx_ref[:], 1)

    N = 512
    lut = jnp.asarray(rng.integers(0, 2**31, (N, 128), np.int32))
    idx = jnp.asarray(rng.integers(0, 128, (N, 128), np.int32))

    @jax.jit
    def g1(lut, idx):
        return pl.pallas_call(
            dg1_kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(lut, idx)

    try:
        dt, out = timeit(g1, lut, idx)
        exp = np.take_along_axis(np.asarray(lut), np.asarray(idx), 1)
        ok = np.array_equal(np.asarray(out), exp)
        print(f"dg1      {dt*1e3:8.3f} ms  {N*128/dt/1e6:8.1f} Mgather/s  "
              f"correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"dg1      UNSUPPORTED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")

    # --- 4. XLA take_along_axis (same pattern outside Pallas) ----------
    N = 16384
    lut = jnp.asarray(rng.integers(0, 2**31, (N, 128), np.int32))
    idx = jnp.asarray(rng.integers(0, N, (N, 128), np.int32))

    @jax.jit
    def xg(lut, idx):
        return jnp.take_along_axis(lut, idx, axis=0).sum(dtype=jnp.int32)

    dt, _ = timeit(xg, lut, idx)
    print(f"xla-taa  {dt*1e3:8.3f} ms  {N*128/dt/1e6:8.1f} Mgather/s")


if __name__ == "__main__":
    main()
