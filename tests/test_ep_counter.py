"""Sharded counter (EP analog) == single-device counter, bit for bit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rkmh_tpu.ops.counter import HashCounter
from rkmh_tpu.parallel.ep import (
    sharded_counter_add_fn,
    sharded_counter_build_fn,
    sharded_counter_get_fn,
    sharded_counter_init,
)
from jax.sharding import Mesh


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()[:4]
    return Mesh(np.asarray(devs), axis_names=("dp",))


def test_sharded_counter_matches_single_device(mesh):
    rng = np.random.default_rng(3)
    size = 4096 * 4
    B, W = 8, 64
    hashes = rng.integers(0, 2**63, size=(B, W), dtype=np.uint64)
    mask = rng.random((B, W)) < 0.8

    want = HashCounter(size).add(jnp.asarray(hashes), jnp.asarray(mask)).to_numpy()

    build = sharded_counter_build_fn(mesh, size)
    table = build(jnp.asarray(hashes), jnp.asarray(mask))
    got = np.asarray(table)
    assert np.array_equal(got, want)

    # lookups: counts for a fresh hash tensor match the dense table
    q = rng.integers(0, 2**63, size=(B, 16), dtype=np.uint64)
    get = sharded_counter_get_fn(mesh, size)
    got_counts = np.asarray(get(table, jnp.asarray(q)))
    assert np.array_equal(got_counts, want[(q % size).astype(np.int64)])


def test_sharded_counter_incremental(mesh):
    """Per-batch accumulation matches one big single-device add."""
    rng = np.random.default_rng(11)
    size = 4096 * 4
    add = sharded_counter_add_fn(mesh, size)
    table = sharded_counter_init(mesh, size)
    hc = HashCounter(size)
    for _ in range(3):
        hashes = rng.integers(0, 2**63, size=(4, 32), dtype=np.uint64)
        mask = rng.random((4, 32)) < 0.7
        table = add(table, jnp.asarray(hashes), jnp.asarray(mask))
        hc.add(jnp.asarray(hashes), jnp.asarray(mask))
    assert np.array_equal(np.asarray(table), hc.to_numpy())


def test_sharded_counter_non_pow2_size(mesh):
    size = 6000 * 4  # exercises the modulo (non-mask) slot path
    rng = np.random.default_rng(5)
    hashes = rng.integers(0, 2**63, size=(4, 32), dtype=np.uint64)
    mask = np.ones((4, 32), bool)
    want = HashCounter(size).add(jnp.asarray(hashes), jnp.asarray(mask)).to_numpy()
    table = sharded_counter_build_fn(mesh, size)(jnp.asarray(hashes), jnp.asarray(mask))
    assert np.array_equal(np.asarray(table), want)
