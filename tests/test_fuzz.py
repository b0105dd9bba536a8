"""Lightweight deterministic fuzzing of the readers (reference §4:
libFuzzer targets ipc/file_fuzz.cc, stream_fuzz.cc, parquet fuzz).

The contract: corrupt/truncated inputs raise Python exceptions — never
crash, hang, or silently return wrong-shaped data."""

import io

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu import ipc
from arrow_tpu.io import parquet as pq


@pytest.fixture(scope="module")
def ipc_bytes():
    t = at.table({"x": list(range(200)),
                  "s": [f"v{i % 11}" for i in range(200)],
                  "f": [float(i) / 3 for i in range(200)]})
    return ipc.serialize_table(t)


@pytest.fixture(scope="module")
def parquet_bytes():
    t = at.table({"x": list(range(200)),
                  "s": [f"v{i % 11}" for i in range(200)]})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    return buf.getvalue()


def test_ipc_truncations(ipc_bytes):
    rng = np.random.default_rng(0)
    cuts = sorted(set(int(v) for v in
                      rng.integers(1, len(ipc_bytes), 40)))
    for cut in cuts:
        try:
            ipc.deserialize_table(ipc_bytes[:cut])
        except Exception as e:
            assert isinstance(e, Exception)  # typed python error, no crash


def test_ipc_bitflips(ipc_bytes):
    rng = np.random.default_rng(1)
    data = bytearray(ipc_bytes)
    for _ in range(40):
        pos = int(rng.integers(0, len(data)))
        orig = data[pos]
        data[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            t = ipc.deserialize_table(bytes(data))
            t.to_pydict()  # force full decode
        except Exception:
            pass  # any typed error is acceptable
        finally:
            data[pos] = orig


def test_parquet_truncations(parquet_bytes):
    rng = np.random.default_rng(2)
    cuts = sorted(set(int(v) for v in
                      rng.integers(1, len(parquet_bytes), 40)))
    for cut in cuts:
        try:
            pq.read_table(parquet_bytes[:cut])
        except Exception:
            pass


def test_parquet_bitflips(parquet_bytes):
    rng = np.random.default_rng(3)
    data = bytearray(parquet_bytes)
    for _ in range(40):
        pos = int(rng.integers(0, len(data)))
        orig = data[pos]
        data[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            pq.read_table(bytes(data)).to_pydict()
        except Exception:
            pass
        finally:
            data[pos] = orig


def test_csv_garbage():
    from arrow_tpu.io import csv as atcsv
    rng = np.random.default_rng(4)
    for _ in range(10):
        blob = bytes(rng.integers(32, 127, 200).astype(np.uint8))
        try:
            atcsv.read_csv(blob)
        except Exception:
            pass


def test_orc_truncations_and_bitflips():
    import io
    import pyarrow as pa
    po = pytest.importorskip("pyarrow.orc")
    from arrow_tpu.io import orc
    buf = io.BytesIO()
    po.write_table(pa.table({"a": list(range(200)),
                             "s": [f"v{i%7}" for i in range(200)]}), buf)
    raw = buf.getvalue()
    rng = np.random.default_rng(3)
    for cut in sorted(set(int(v) for v in rng.integers(1, len(raw), 30))):
        try:
            orc.read_table(raw[:cut])
        except Exception:
            pass
    data = bytearray(raw)
    for _ in range(30):
        pos = int(rng.integers(0, len(data)))
        orig = data[pos]
        data[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            orc.read_table(bytes(data)).to_pydict()
        except Exception:
            pass
        finally:
            data[pos] = orig


def test_feather_v1_truncations():
    import io
    from arrow_tpu import feather
    from arrow_tpu.io.feather_v1 import read_feather_v1
    buf = io.BytesIO()
    feather.write_feather(at.table({"a": list(range(50)),
                                    "s": ["x"] * 50}), buf, version=1)
    raw = buf.getvalue()
    rng = np.random.default_rng(4)
    for cut in sorted(set(int(v) for v in rng.integers(1, len(raw), 25))):
        try:
            read_feather_v1(raw[:cut])
        except Exception:
            pass


def test_substrait_garbage():
    import arrow_tpu.substrait as sub
    rng = np.random.default_rng(5)
    for n in (1, 7, 40, 200):
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            sub.run_query(blob, lambda names, schema: None)
        except Exception:
            pass  # typed error, no interpreter crash


def test_lz4_snappy_garbage():
    from arrow_tpu.native import snappy_decompress
    from arrow_tpu.utils.lz4frame import decompress
    rng = np.random.default_rng(6)
    for n in (1, 10, 100):
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            snappy_decompress(blob, 1000)
        except Exception:
            pass
        try:
            decompress(blob, 1000)
        except Exception:
            pass
