"""ORC reader (arrow_tpu/io/orc.py vs adapters/orc/). Oracle: files
written by pyarrow.orc (liborc)."""
import datetime as dt
import io
import random
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

po = pytest.importorskip("pyarrow.orc")

import arrow_tpu as at
from arrow_tpu.io import orc


def _write(t, **kw):
    buf = io.BytesIO()
    po.write_table(t, buf, **kw)
    return buf.getvalue()


def test_basic_types_with_nulls():
    t = pa.table({"a": [1, 2, None], "s": ["x", None, "z"],
                  "f": [1.5, None, 3.5]})
    assert orc.read_table(_write(t)).to_pydict() == t.to_pydict()


def test_all_encodings_compressions_stripes():
    rng = np.random.default_rng(1)
    n = 20_000
    t = pa.table({
        "i64": pa.array([int(v) if rng.random() > 0.05 else None
                         for v in rng.integers(-10**12, 10**12, n)]),
        "seq": pa.array(np.arange(n)),
        "const": pa.array(np.full(n, 7)),
        "f64": pa.array(rng.normal(size=n)),
        "dict_s": pa.array([random.Random(3).choice(
            ["aa", "bb", None, "dddd"]) for _ in range(n)]),
        "uniq": pa.array([f"u{i}" for i in range(n)]),
        "b": pa.array([bool(v) if rng.random() > 0.1 else None
                       for v in rng.integers(0, 2, n)]),
    })
    for comp in ("uncompressed", "zlib", "zstd"):
        raw = _write(t, compression=comp, stripe_size=64 * 1024)
        f = orc.ORCFile(raw)
        assert len(f.stripes) > 1
        assert f.read().to_pydict() == t.to_pydict()


def test_temporal_decimal_small_types():
    t = pa.table({
        "d": pa.array([dt.date(2020, 1, 1), None], pa.date32()),
        "ts": pa.array([dt.datetime(2021, 5, 1, 12, 30, 15, 123456),
                        None], pa.timestamp("us")),
        "dec": pa.array([Decimal("12.34"), Decimal("-0.01")],
                        pa.decimal128(10, 2)),
        "i8": pa.array([1, -5], pa.int8()),
        "f32": pa.array([1.5, None], pa.float32()),
        "bin": pa.array([b"ab", None], pa.binary()),
    })
    assert orc.read_table(_write(t)).to_pydict() == t.to_pydict()


def test_column_selection_and_schema():
    t = pa.table({"a": [1], "b": ["x"], "c": [2.0]})
    raw = _write(t)
    f = orc.ORCFile(raw)
    assert f.schema.names == ["a", "b", "c"]
    out = f.read(columns=["c", "a"])
    assert out.schema.names == ["a", "c"]
    assert out.to_pydict() == {"a": [1], "c": [2.0]}


def test_not_orc_raises():
    with pytest.raises(ValueError):
        orc.read_table(b"PAR1not-an-orc-file")


def test_orc_snappy():
    t = pa.table({"a": list(range(5000)), "s": ["x" * 20] * 5000})
    raw = _write(t, compression="snappy")
    assert orc.read_table(raw).to_pydict() == t.to_pydict()
