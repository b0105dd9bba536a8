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
