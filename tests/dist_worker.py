"""Worker for the 2-process jax.distributed CPU test (test_distributed.py).

Each process owns 4 virtual CPU devices; the global mesh spans 8 devices
across both processes.  The worker initializes the distributed runtime via
rkmh_tpu.parallel.distributed.initialize, parses its host_read_shard slice
of the input, classifies it through the production tp-sharded shard_map
step over the GLOBAL mesh, and writes its addressable result rows to a
JSON file for the parent to merge and compare against the single-process
oracle output.

Usage: dist_worker.py <coordinator> <num_procs> <pid> <outfile>
"""

import json
import os
import sys


def main():
    coordinator, num_procs, pid, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    import rkmh_tpu  # noqa: F401  (x64, platform pin)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rkmh_tpu.parallel.distributed import initialize, host_read_shard

    initialize(coordinator_address=coordinator, num_processes=num_procs,
               process_id=pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == pid
    assert jax.device_count() == 4 * num_procs, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rkmh_tpu.classify import engine
    from rkmh_tpu.io.fastx import read_fastx
    from rkmh_tpu.io.packing import encode_seqs
    from rkmh_tpu.parallel.mesh import (
        build_sharded_tables, make_mesh, sharded_classify_table_fn,
    )
    from rkmh_tpu.utils import to_host

    DATA = "/root/reference/data"
    ks, s, TP = (12,), 200, 2
    N, L = 64, 256

    refs = read_fastx(f"{DATA}/zika.refs.fa")[:8]
    ref_codes, _ = encode_seqs([r.seq for r in refs])
    ref_sk, ref_lens = to_host(engine.sketch_batch(ref_codes, ks, s))
    tables, rps = build_sharded_tables(ref_sk, ref_lens, tp=TP)

    # every process parses ONLY its host shard of the reads (contiguous
    # block partition; zero cross-host IO)
    reads = read_fastx(f"{DATA}/z1.fq")[:N]
    start, stop = host_read_shard(N)
    local_codes, _ = encode_seqs([r.seq for r in reads[start:stop]], pad_to=L)

    mesh = make_mesh(jax.devices(), dp=jax.device_count() // TP, tp=TP)
    fn = sharded_classify_table_fn(mesh, ks, s, rps)

    codes_sharding = NamedSharding(mesh, P(("dp",), None))
    codes_global = jax.make_array_from_process_local_data(
        codes_sharding, local_codes, (N, L)
    )
    tables_global = jax.device_put(
        tables, NamedSharding(mesh, P("tp", None, None))
    )

    best, shared, diff_ok, depth_fail, match_fail = fn(codes_global, tables_global)

    # each process reports the rows it can address (its local shards)
    rows = {}
    arrays = {
        "best": best, "shared": shared, "diff_ok": diff_ok,
        "depth_fail": depth_fail, "match_fail": match_fail,
    }
    for key, arr in arrays.items():
        for sh in arr.addressable_shards:
            lo = sh.index[0].start or 0
            vals = np.asarray(sh.data).tolist()
            for j, v in enumerate(vals):
                rows.setdefault(lo + j, {})[key] = int(v)

    with open(outfile, "w") as f:
        json.dump({"pid": pid, "shard": [start, stop], "rows": rows}, f)
    print(f"proc {pid}: wrote {len(rows)} rows", file=sys.stderr)


if __name__ == "__main__":
    main()
