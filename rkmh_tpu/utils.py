"""Small host/device utilities."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def to_host(tree):
    """Device->host transfer of a pytree, in one device_get.

    Works around a backend quirk where unsigned-integer D2H transfers
    take a slow per-element path under x64 mode (observed on the axon TPU
    tunnel: int32/uint32/uint64 ~20 µs *per element*, int64/bool ~µs for
    whole arrays): every affected leaf is converted to int64 on device
    (bitcast for 64-bit, widening cast otherwise) and the original dtype
    is restored on the host via a numpy view/cast.
    """
    leaves, treedef = jax.tree.flatten(tree)
    orig_dtypes = []
    prepped = []
    for a in leaves:
        if isinstance(a, jax.Array):
            if a.dtype == jnp.uint64:
                orig_dtypes.append(np.uint64)
                prepped.append(jax.lax.bitcast_convert_type(a, jnp.int64))
                continue
            if a.dtype in (jnp.int32, jnp.uint32):
                orig_dtypes.append(np.dtype(str(a.dtype)))
                prepped.append(a.astype(jnp.int64))
                continue
        orig_dtypes.append(None)
        prepped.append(a)

    fetched = jax.device_get(prepped)
    restored = []
    for a, dt in zip(fetched, orig_dtypes):
        if dt is np.uint64:
            restored.append(a.view(np.uint64))
        elif dt is not None:
            restored.append(a.astype(dt))
        else:
            restored.append(a)
    return jax.tree.unflatten(treedef, restored)


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (n >= 1)."""
    p = 1
    while p < n:
        p <<= 1
    return p
