"""Unit contracts for the wire-cost helpers of commands/common.py:

- packed_batches pads short batches to the next power of two (floor 8,
  capped at batch_size) instead of the full batch shape — the fix that
  stopped a 25-read `hash` from uploading ~120 MB of padding;
- fetch_rows slices per-read outputs to a 256-row grid before D2H;
- DpCtx.put re-pads shrunken batches to a dp multiple so non-power-of-
  two meshes still shard them.

These behaviors are otherwise only covered indirectly (goldens, device
fuzz); pinning them here catches a silent revert to full-batch padding,
which would not change output bytes — only wire cost.
"""

import numpy as np
import pytest

from rkmh_tpu.commands.common import DpCtx, fetch_rows, packed_batches


class _FakePacked:
    """Minimal packed-reads stand-in: N reads of width L."""

    def __init__(self, n, L=32):
        self.codes = np.random.default_rng(n).integers(
            0, 4, size=(n, L), dtype=np.uint8)
        self.lens = np.full(n, L, np.int32)
        self.names = [f"r{i}" for i in range(n)]

    def __len__(self):
        return len(self.lens)


@pytest.mark.parametrize(
    "n,batch_size,expect_rows",
    [
        (1, 16384, 8),      # floor is 8
        (8, 16384, 8),      # exact power of two: no pad
        (9, 16384, 16),
        (25, 16384, 32),    # the measured hash-minION25 case
        (100, 16384, 128),
        (5000, 16384, 8192),
        (25, 16, 16),       # cap at batch_size
        (3, 4, 4),
    ],
)
def test_packed_batches_pow2_shrink(n, batch_size, expect_rows):
    pk = _FakePacked(n)
    batches = list(packed_batches(pk, batch_size))
    assert batches[-1][3].shape[0] == expect_rows
    assert batches[-1][2].shape[0] == expect_rows
    # pad rows are the 255 sentinel with len 0
    s, e, codes, lens = batches[-1]
    real = e - s
    assert np.array_equal(codes[:real], pk.codes[s:e])
    assert (codes[real:] == 255).all()
    assert (lens[real:] == 0).all()


def test_packed_batches_full_batches_unpadded():
    pk = _FakePacked(40)
    batches = list(packed_batches(pk, 16))
    assert [b[2].shape[0] for b in batches] == [16, 16, 8]
    # concatenated real rows reproduce the input exactly
    got = np.concatenate([c[: e - s] for s, e, c, _ in batches])
    assert np.array_equal(got, pk.codes)


def test_fetch_rows_slices_to_grid():
    import jax.numpy as jnp

    a = jnp.arange(16384 * 4, dtype=jnp.int32).reshape(16384, 4)
    b = jnp.arange(16384, dtype=jnp.int32)
    a_np, b_np = fetch_rows((a, b), 25)
    # rounds 25 up to one 256 grid, never past the batch
    assert a_np.shape == (256, 4) and b_np.shape == (256,)
    assert np.array_equal(a_np, np.asarray(a[:256]))
    assert np.array_equal(b_np, np.asarray(b[:256]))
    full = fetch_rows((b,), 16384)[0]
    assert full.shape == (16384,)
    over = fetch_rows((b[:100],), 99)[0]  # grid exceeds batch: whole array
    assert over.shape == (100,)


@pytest.mark.parametrize("dp", [3, 8])
def test_dpctx_put_pads_to_dp_multiple(dp):
    ctx = DpCtx.maybe(dp)
    assert ctx is not None
    codes = np.random.default_rng(0).integers(0, 4, (16, 8), np.uint8)
    lens = np.full(16, 8, np.int32)
    c_dev, l_dev = ctx.put(codes, lens)
    rows = -(-16 // dp) * dp
    assert c_dev.shape == (rows, 8) and l_dev.shape == (rows,)
    c_np, l_np = np.asarray(c_dev), np.asarray(l_dev)
    assert np.array_equal(c_np[:16], codes) and (c_np[16:] == 255).all()
    assert np.array_equal(l_np[:16], lens) and (l_np[16:] == 0).all()
