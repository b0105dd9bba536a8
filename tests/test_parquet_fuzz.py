"""Randomized differential fuzz of the Parquet feature matrix.

Random tables x {codec, dictionary, page size, encryption} round-trip
through our writer/reader and cross-check with pyarrow in both
directions (reference strategy: parquet's reader-writer round-trip
tests + fuzz corpus under cpp/src/parquet/).
"""

import io
import random

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu.io.parquet import ParquetFile, read_table, write_table


def _random_table(rng: random.Random, n: int):
    cols = {}
    cols["i64"] = at.array(
        [rng.randint(-2**40, 2**40) if rng.random() > 0.1 else None
         for _ in range(n)], at.int64())
    cols["i32"] = at.array(
        [rng.randint(-2**20, 2**20) for _ in range(n)], at.int32())
    cols["f64"] = at.array(
        [rng.uniform(-1e6, 1e6) if rng.random() > 0.15 else None
         for _ in range(n)], at.float64())
    cols["s"] = at.array(
        [rng.choice(["alpha", "beta", "gamma", "δδδ", ""]) +
         str(rng.randint(0, 30)) if rng.random() > 0.2 else None
         for _ in range(n)], at.string())
    cols["b"] = at.array(
        [rng.random() > 0.5 if rng.random() > 0.1 else None
         for _ in range(n)], at.bool_())
    return at.table(cols)


def _assert_equal(ours, theirs_pydict):
    for name, vals in theirs_pydict.items():
        got = ours.column(name).to_pylist()
        if name == "f64":
            for g, w in zip(got, vals):
                assert (g is None) == (w is None)
                if g is not None:
                    assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), name
        else:
            assert got == vals, name


@pytest.mark.parametrize("seed", range(6))
def test_roundtrip_feature_matrix(seed):
    rng = random.Random(seed)
    n = rng.choice([1, 7, 130, 1500])
    tbl = _random_table(rng, n)
    codec = rng.choice([None, "zstd", "gzip", "snappy"])
    use_dict = rng.random() > 0.5
    page = rng.choice([None, 512, 4096, 1024 * 1024])
    buf = io.BytesIO()
    from arrow_tpu.io.parquet import ParquetWriter
    with ParquetWriter(buf, tbl.schema, compression=codec,
                       use_dictionary=use_dict,
                       data_page_size=page) as w:
        w.write_table(tbl, row_group_size=rng.choice([None, 77, 600]))
    data = buf.getvalue()

    got = read_table(data)
    _assert_equal(got, tbl.to_pydict())

    papq = pytest.importorskip("pyarrow.parquet")
    pt = papq.read_table(io.BytesIO(data))
    _assert_equal(tbl, pt.to_pydict())


@pytest.mark.parametrize("seed", range(3))
def test_roundtrip_encrypted_matrix(seed):
    from arrow_tpu.io.parquet.encryption import (
        ALG_AES_GCM_CTR_V1, ALG_AES_GCM_V1, FileDecryptionProperties,
        FileEncryptionProperties)
    rng = random.Random(100 + seed)
    tbl = _random_table(rng, rng.choice([3, 450]))
    key = bytes(rng.randrange(256) for _ in range(16))
    algo = rng.choice([ALG_AES_GCM_V1, ALG_AES_GCM_CTR_V1])
    col_keys = {}
    if rng.random() > 0.5:
        col_keys = {"i64": bytes(rng.randrange(256) for _ in range(16))}
    enc = FileEncryptionProperties(key, column_keys=col_keys,
                                   algorithm=algo)
    dec = FileDecryptionProperties(footer_key=key, column_keys=col_keys)
    buf = io.BytesIO()
    write_table(tbl, buf, compression=rng.choice([None, "zstd"]),
                encryption_properties=enc,
                )
    got = read_table(buf.getvalue(), decryption_properties=dec)
    _assert_equal(got, tbl.to_pydict())


@pytest.mark.parametrize("seed", range(3))
def test_pyarrow_writes_we_read(seed):
    pa = pytest.importorskip("pyarrow")
    papq = pytest.importorskip("pyarrow.parquet")
    rng = random.Random(200 + seed)
    tbl = _random_table(rng, rng.choice([5, 900]))
    pt = pa.table(tbl.to_pydict())
    buf = io.BytesIO()
    papq.write_table(
        pt, buf,
        compression=rng.choice(["NONE", "ZSTD", "SNAPPY", "GZIP"]),
        use_dictionary=rng.random() > 0.5,
        data_page_size=rng.choice([512, 1024 * 1024]),
        data_page_version=rng.choice(["1.0", "2.0"]),
        row_group_size=rng.choice([64, 10000]))
    got = read_table(buf.getvalue())
    _assert_equal(got, pt.to_pydict())


def test_brotli_gzip_codecs_interop():
    """brotli (system libbrotli via ctypes) + gzip write paths, both
    interop directions (util/compression_brotli.cc analogue)."""
    pa = pytest.importorskip("pyarrow")
    papq = pytest.importorskip("pyarrow.parquet")
    t = at.table({"a": list(range(5000)),
                  "s": [f"v{i % 7}" for i in range(5000)]})
    for comp in ("brotli", "gzip"):
        buf = io.BytesIO()
        write_table(t, buf, compression=comp)
        assert read_table(buf.getvalue()).column("a").to_pylist() == \
            list(range(5000))
        assert papq.read_table(io.BytesIO(
            buf.getvalue())).column("a").to_pylist() == list(range(5000))
        pbuf = io.BytesIO()
        papq.write_table(pa.table(t.to_pydict()), pbuf, compression=comp)
        assert read_table(pbuf.getvalue()).column("s").to_pylist()[:3] \
            == ["v0", "v1", "v2"]
    c = at.Codec("brotli")
    blob = c.compress(b"xyz" * 1000)
    assert c.decompress(blob) == b"xyz" * 1000
    assert c.decompress(blob, 3000) == b"xyz" * 1000
    assert at.Codec.is_available("brotli")
