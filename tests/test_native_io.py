"""Native C++ FASTA/FASTQ parser+packer vs the Python oracle parser."""

import gzip

import numpy as np
import pytest

from rkmh_tpu.io.fastx import read_fastx
from rkmh_tpu.io.packing import encode_seqs
from rkmh_tpu.io.native import load, read_fastx_packed
from rkmh_tpu.commands.common import PyPacked, load_packed, packed_batches

DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(load() is None, reason="no C++ toolchain")


@pytest.mark.parametrize("path", [
    f"{DATA}/z1.fq",              # FASTQ
    f"{DATA}/zika.refs.fa",       # multi-record FASTA
    f"{DATA}/minION25.fq",        # long nanopore reads
])
def test_native_matches_python(path):
    pk = read_fastx_packed(path)
    recs = read_fastx(path)
    codes, lens = encode_seqs([r.seq for r in recs])

    assert pk.names == [r.name for r in recs]
    assert pk.seqs == [r.seq for r in recs]
    assert pk.quals == [r.qual for r in recs]
    assert np.array_equal(pk.lens, lens)
    L = min(pk.codes.shape[1], codes.shape[1])
    assert np.array_equal(pk.codes[:, :L], codes[:, :L])
    if pk.codes.shape[1] > L:
        assert np.all(pk.codes[:, L:] == 255)


def test_native_gzip(tmp_path):
    raw = open(f"{DATA}/z1.fq", "rb").read()
    gz = tmp_path / "z1.fq.gz"
    with gzip.open(gz, "wb") as fh:
        fh.write(raw)
    pk = read_fastx_packed(str(gz))
    recs = read_fastx(f"{DATA}/z1.fq")
    assert pk.names == [r.name for r in recs]
    assert pk.seqs == [r.seq for r in recs]


def test_native_multiline_fasta_and_case(tmp_path):
    fa = tmp_path / "m.fa"
    fa.write_text(">a desc here\nacgT\nACGN\n>b\nTTTT\n")
    pk = read_fastx_packed(str(fa))
    assert pk.names == ["a", "b"]
    assert pk.seqs == [b"ACGTACGN", b"TTTT"]
    assert list(pk.lens) == [8, 4]
    # N encodes invalid
    assert pk.codes[0, 7] == 4


def test_load_packed_multi_file_concat(tmp_path):
    f1 = tmp_path / "a.fa"
    f1.write_text(">x\nACGT\n")
    f2 = tmp_path / "b.fa"
    f2.write_text(">y\n" + "A" * 300 + "\n")
    pk = load_packed([str(f1), str(f2)])
    assert pk.names == ["x", "y"]
    assert list(pk.lens) == [4, 300]
    assert pk.codes.shape[1] >= 300

    batches = list(packed_batches(pk, 8))
    assert len(batches) == 1
    s, e, codes, lens = batches[0]
    assert (s, e) == (0, 2)
    assert codes.shape[0] == 8 and lens[2:].sum() == 0


def test_pypacked_fallback_equivalent(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_text("@q1\nACGTNNGT\n+\nIIIIIIII\n")
    native = read_fastx_packed(str(fq))
    py = PyPacked(read_fastx(str(fq)))
    assert native.names == py.names
    assert native.seqs == py.seqs
    assert native.quals == py.quals
    assert np.array_equal(native.lens, py.lens)
    L = min(native.codes.shape[1], py.codes.shape[1])
    assert np.array_equal(native.codes[:, :L], py.codes[:, :L])


def test_load_packed_file_like():
    """File-like sources (not just paths/'-') parse correctly — the
    fallback must wrap the object, not iterate its lines as paths."""
    import io

    from rkmh_tpu.commands.common import load_packed

    pk = load_packed(io.BytesIO(b">r1\nACGT\n>r2\nGGTTAA\n"))
    assert pk.names == ["r1", "r2"]
    assert pk.seqs == [b"ACGT", b"GGTTAA"]
