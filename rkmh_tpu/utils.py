"""Small host/device utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_host(tree):
    """Device->host transfer of a pytree, in one device_get.

    Works around a backend quirk where int32 D2H transfers take a slow
    per-element path under x64 mode (observed on the axon TPU tunnel:
    int32 ~ms/element, int64/bool ~µs for the whole array): int32 leaves
    are upcast to int64 on device first.
    """
    def prep(a):
        if isinstance(a, jax.Array) and a.dtype == jnp.int32:
            return a.astype(jnp.int64)
        return a

    return jax.device_get(jax.tree.map(prep, tree))
