"""Sharded k-mer depth counters — the expert-parallel analog.

SURVEY.md §2.4: this workload has no MoE, but its nearest EP analog is
sharding the HASHTCounter table across chips so giant counters
(rkmh uses up to 8e8 slots, rkmh.cpp:2516 — 3.2 GB of int32) don't
replicate per device.

Scheme (exact, deterministic):

* the table shards contiguously: device d owns slots
  [d*S/D, (d+1)*S/D) of the logical ``hash % S`` table;
* each device scatter-adds its local read-shard's hashes into a local
  *full-size* transient table, then a ``reduce_scatter`` (sum) leaves
  every device holding its fully-aggregated shard — one collective, no
  all-to-all routing of individual updates;
* lookups gather from the owning shard via one ``all_gather`` of the
  queried counts (counts are tiny compared to the table).

The transient full table bounds this scheme to tables that fit HBM once
per device during the build step; for rkmh's sizes (<= 8e8 i32 = 3.2 GB)
that holds on any TPU with >= 8 GB HBM.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rkmh_tpu.ops.counter import _slots


def sharded_counter_build_fn(mesh: Mesh, size: int):
    """Jitted builder: hashes [B, W] + mask (dp-sharded reads) ->
    counter table [size] sharded over the dp axis.

    Exactly equal to the single-device ops.counter table (same lossy
    ``hash % size`` slots, deterministic adds).
    """
    ndev = mesh.devices.size

    assert size % ndev == 0, f"counter size {size} not divisible by {ndev} devices"

    def local(hashes, mask):
        full = jnp.zeros((size,), jnp.int32)
        idx = _slots(hashes.reshape(-1), size)
        full = full.at[idx].add(mask.reshape(-1).astype(jnp.int32))
        # sum across devices, keep this device's contiguous shard
        shard = jax.lax.psum_scatter(
            full, "dp", scatter_dimension=0, tiled=True
        )
        return shard  # [size / ndev]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P("dp"),
    )
    return jax.jit(fn)


def sharded_counter_get_fn(mesh: Mesh, size: int):
    """Jitted lookup: table (dp-sharded) x hashes (dp-sharded reads) ->
    counts for every hash (dp-sharded like the hashes).

    Each device needs slots owned by other devices, so the queried
    table region is fetched with one tiled all_gather of the *shards*
    (table traffic ~= size bytes once per call; fine for the <= 1e7-slot
    tables the -M/-I paths default to when sharded).
    """

    def local(shard, hashes):
        full = jax.lax.all_gather(shard, "dp", axis=0, tiled=True)  # [size]
        return full[_slots(hashes, size)]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(fn)
