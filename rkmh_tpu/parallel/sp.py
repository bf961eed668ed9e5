"""Sequence parallelism: sketch very long genomes sharded across chips.

The MinHash analog of context parallelism (SURVEY.md §5 "long-context"):
the genome axis is sharded over the ``sp`` mesh axis, each device hashes
its chunk plus a (k-1)-base halo fetched from its right neighbor with
ppermute, computes a *local* bottom-s sketch, and the global sketch is
the bottom-s of the all-gathered local sketches.  This is exact: every
element of the global bottom-s is in its chunk's local bottom-s (each
local sketch keeps >= s smallest of its chunk), so re-sorting the union
reproduces the single-device sketch bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rkmh_tpu.ops.sketch import SENTINEL, bottom_s_sketch


def make_sp_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("sp",))


def sp_sketch_fn(mesh: Mesh, ks: tuple, sketch_size: int):
    """Jitted genome sketcher over an ``sp`` mesh.

    Input codes [R, L] with L divisible by the sp axis size; output is the
    same (sketch [R, s], lens [R]) as classify.engine.sketch_batch,
    replicated on every device.
    """
    kmax = max(ks)
    halo = kmax - 1

    def local(codes):  # codes: [R, L/sp]
        from rkmh_tpu.ops.hashing import kmer_window_hashes

        nsp = jax.lax.axis_size("sp")
        # halo exchange: left edge of right neighbor appended to my chunk.
        # ring permute — the last shard receives the first shard's edge but
        # poisons it below (its final windows don't exist).
        edge = codes[:, :halo]
        perm = [(i, (i - 1) % nsp) for i in range(nsp)]
        recv = jax.lax.ppermute(edge, "sp", perm)
        idx = jax.lax.axis_index("sp")
        recv = jnp.where(idx == nsp - 1, jnp.full_like(recv, 255), recv)
        # per-k halo so every chunk contributes exactly L/sp windows per k
        # (no duplicated windows across chunks — duplicates would corrupt
        # the multiset sketch semantics)
        parts = []
        for k in ks:
            ext = jnp.concatenate([codes, recv[:, : k - 1]], axis=1)
            parts.append(kmer_window_hashes(ext, k))
        hashes = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        lsk, _ = bottom_s_sketch(hashes, sketch_size)  # local bottom-s
        gathered = jax.lax.all_gather(lsk, "sp", axis=1, tiled=True)  # [R, sp*s]
        x = jnp.sort(gathered, axis=-1)[:, :sketch_size]
        lens = jnp.sum(x != SENTINEL, axis=-1).astype(jnp.int32)
        return x, lens

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "sp"),),
        out_specs=(P(None, None), P(None)),
        # outputs are value-replicated over sp after the all_gather+resort
        check_vma=False,
    )
    return jax.jit(fn)
