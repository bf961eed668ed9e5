"""Multi-device sharding tests on the 8-CPU virtual mesh: sharded results
must be bit-identical to single-device results."""

import numpy as np
import jax
import pytest

from rkmh_tpu.classify import engine
from rkmh_tpu.io.packing import encode_seqs
from rkmh_tpu.parallel.mesh import make_mesh, sharded_classify_fn
from rkmh_tpu.parallel.sp import make_sp_mesh, sp_sketch_fn


def random_dna(rng, n):
    return bytes(rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                            p=[0.24, 0.24, 0.24, 0.24, 0.04], size=n))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    reads = [random_dna(rng, 120) for _ in range(64)]
    refs = [random_dna(rng, 2048) for _ in range(8)]
    read_codes, read_lens = encode_seqs(reads, pad_to=128)
    ref_codes, ref_lens = encode_seqs(refs, pad_to=2048)
    return read_codes, ref_codes


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_dp_tp_classify_matches_single_device(setup, dp, tp):
    read_codes, ref_codes = setup
    ks, s = (16,), 256
    ref_sk, ref_lens = engine.sketch_batch(ref_codes, ks, s)
    want = engine.classify_batch(read_codes, ref_sk, ref_lens, ks, s)

    mesh = make_mesh(dp=dp, tp=tp)
    fn = sharded_classify_fn(mesh, ks, s)
    got = fn(read_codes, ref_sk, ref_lens)

    # classify_batch returns (..., sk_lens, ...) at index 2; sharded fn
    # returns the argmax_stream 5-tuple
    best, shared, diff_ok, depth_fail, match_fail = got
    assert np.array_equal(np.asarray(best), np.asarray(want[0]))
    assert np.array_equal(np.asarray(shared), np.asarray(want[1]))
    assert np.array_equal(np.asarray(diff_ok), np.asarray(want[3]))
    assert np.array_equal(np.asarray(depth_fail), np.asarray(want[4]))
    assert np.array_equal(np.asarray(match_fail), np.asarray(want[5]))


def test_sp_genome_sketch_matches_single_device(setup):
    _, ref_codes = setup
    ks, s = (16, 18), 300
    want_sk, want_lens = engine.sketch_batch(ref_codes, ks, s)

    mesh = make_sp_mesh()
    fn = sp_sketch_fn(mesh, ks, s)
    got_sk, got_lens = fn(ref_codes)

    assert np.array_equal(np.asarray(got_sk), np.asarray(want_sk))
    assert np.array_equal(np.asarray(got_lens), np.asarray(want_lens))


@pytest.mark.parametrize("tp", [1, 2, 4])
def test_sharded_table_classify_matches_single_device(setup, tp):
    """Production bucket-table SPMD path (dp x tp) == single chip."""
    import numpy as np
    from rkmh_tpu.parallel.mesh import (
        build_sharded_tables,
        make_mesh,
        sharded_classify_table_fn,
    )
    from rkmh_tpu.utils import to_host

    read_codes, ref_codes = setup
    ks, s = (16,), 64
    from rkmh_tpu.classify import engine

    ref_sk, ref_lens = engine.sketch_batch(ref_codes, ks, s)
    sk_np, lens_np = to_host((ref_sk, ref_lens))
    tables, rps = build_sharded_tables(sk_np, lens_np, tp=tp)

    mesh = make_mesh(jax.devices()[: 8], dp=8 // tp, tp=tp)
    step = sharded_classify_table_fn(mesh, ks, s, rps)
    out = step(read_codes, tables)

    want = engine.classify_batch(read_codes, ref_sk, ref_lens, ks, s)
    assert np.array_equal(np.asarray(out[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(out[1]), np.asarray(want[1]))


def test_sp_sketch_multi_k(setup):
    """Sequence-parallel sketching with multiple k sizes == single device."""
    import numpy as np
    from rkmh_tpu.parallel.sp import make_sp_mesh, sp_sketch_fn
    from rkmh_tpu.classify import engine

    _, ref_codes = setup
    ks, s = (12, 16), 48
    mesh = make_sp_mesh(jax.devices()[:8])
    sk, lens = sp_sketch_fn(mesh, ks, s)(ref_codes)
    want_sk, want_lens = engine.sketch_batch(ref_codes, ks, s)
    assert np.array_equal(np.asarray(sk), np.asarray(want_sk))
    assert np.array_equal(np.asarray(lens), np.asarray(want_lens))
