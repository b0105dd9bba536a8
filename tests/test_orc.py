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


# --- writer (arrow_tpu.io.orc.write_table; oracle = liborc reader) ----------


def _rt_types():
    import arrow_tpu as at
    return {
        "i64": at.int64(), "i32": at.int32(), "i16": at.int16(),
        "i8": at.int8(), "f32": at.float32(), "f64": at.float64(),
        "s": at.string(), "bin": at.binary(), "b": at.bool_(),
        "d": at.date32(), "ts": at.timestamp("us"),
        "dec": at.decimal128(12, 2),
    }


def _writer_table(n=20_000, seed=7):
    rng = np.random.default_rng(seed)
    r = random.Random(seed)
    cols = {
        "i64": [int(v) if rng.random() > 0.05 else None
                for v in rng.integers(-2**62, 2**62, n)],
        "i32": [int(v) for v in rng.integers(-2**31, 2**31, n)],
        "i16": [int(v) if rng.random() > 0.5 else None
                for v in rng.integers(-2**15, 2**15, n)],
        "i8": [int(v) for v in rng.integers(-128, 128, n)],
        "f32": [float(np.float32(v)) if rng.random() > 0.1 else None
                for v in rng.normal(size=n)],
        "f64": [float(v) for v in rng.normal(size=n)],
        "s": [r.choice(["aa", "bbbb", None, "Ω" * 3, ""])
              for _ in range(n)],
        "bin": [bytes([i % 256]) if i % 11 else None for i in range(n)],
        "b": [bool(v) if rng.random() > 0.2 else None
              for v in rng.integers(0, 2, n)],
        "d": [dt.date(2020, 1, 1) + dt.timedelta(days=int(v))
              if rng.random() > 0.1 else None
              for v in rng.integers(-30000, 30000, n)],
        "ts": [dt.datetime(2015, 1, 1) + dt.timedelta(microseconds=int(v))
               if rng.random() > 0.1 else None
               for v in rng.integers(-10**15, 10**15, n)],
        "dec": [Decimal(int(v)).scaleb(-2) if rng.random() > 0.1 else None
                for v in rng.integers(-10**10, 10**10, n)],
    }
    ts = _rt_types()
    return at.table({k: at.array(v, ts[k]) for k, v in cols.items()})


@pytest.mark.parametrize("comp", ["uncompressed", "zlib"])
def test_writer_roundtrip_self_and_liborc(comp):
    t = _writer_table()
    buf = io.BytesIO()
    orc.write_table(t, buf, stripe_rows=8192, compression=comp)
    raw = buf.getvalue()
    f = orc.ORCFile(raw)
    assert len(f.stripes) > 1
    orig = t.to_pydict()
    assert f.read().to_pydict() == orig              # own reader
    got = po.read_table(io.BytesIO(raw)).to_pydict()  # liborc
    for k, want in orig.items():
        if k == "ts":
            got_k = [None if v is None else v.replace(tzinfo=None)
                     for v in got[k]]
            assert got_k == want
        elif k == "dec":
            assert [None if v is None else Decimal(v)
                    for v in got[k]] == want
        else:
            assert got[k] == want, k


def test_writer_empty_and_allnull():
    t = at.table({"a": at.array([], at.int64()),
                  "s": at.array([], at.string())})
    buf = io.BytesIO()
    orc.write_table(t, buf)
    raw = buf.getvalue()
    assert orc.read_table(raw).to_pydict() == {"a": [], "s": []}
    assert po.read_table(io.BytesIO(raw)).to_pydict() == {"a": [], "s": []}

    t2 = at.table({"x": at.array([None, None, None], at.int32())})
    buf2 = io.BytesIO()
    orc.write_table(t2, buf2)
    raw2 = buf2.getvalue()
    assert orc.read_table(raw2).to_pydict() == {"x": [None] * 3}
    assert po.read_table(io.BytesIO(raw2)).to_pydict() == {"x": [None] * 3}


def test_writer_liborc_rewrites_our_file():
    """Full cycle: our writer -> liborc reads -> liborc writes -> our
    reader reads; values survive unchanged."""
    t = _writer_table(n=2000, seed=3)
    buf = io.BytesIO()
    orc.write_table(t, buf)
    pt = po.read_table(io.BytesIO(buf.getvalue()))
    buf2 = io.BytesIO()
    po.write_table(pt.drop_columns(["ts"]), buf2)
    back = orc.read_table(buf2.getvalue())
    want = t.to_pydict()
    got = back.to_pydict()
    for k in want:
        if k in ("ts",):
            continue
        assert got[k] == want[k], k


def test_rlev2_native_matches_python():
    """The native C++ RLEv2 bulk decoder must agree with the python
    decoder on randomized streams produced by our encoder (liborc
    interop is covered by the file-level differential tests)."""
    import numpy as np

    import arrow_tpu.native as nat
    from arrow_tpu.io.orc import _rlev2_encode
    import arrow_tpu.io.orc as orc_mod

    if nat.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    for signed in (False, True):
        for trial in range(60):
            kind = trial % 4
            k = int(rng.integers(1, 700))
            if kind == 0:    # runs
                vals = np.repeat(rng.integers(0, 50, 5), k // 5 + 1)[:k]
            elif kind == 1:  # deltas
                vals = np.cumsum(rng.integers(0, 9, k))
            elif kind == 2:  # wide direct
                vals = rng.integers(0, 1 << 40, k)
            else:            # mixed magnitudes (patched-base shape)
                vals = rng.integers(0, 100, k)
                vals[:: max(k // 8, 1)] += 1 << 30
            if signed:
                vals = vals - int(vals.mean())
            vals = vals.astype(np.int64)
            enc = _rlev2_encode(vals, signed)
            got = nat.orc_rlev2_decode(enc, len(vals), signed)
            # python reference path (force fallback)
            real = nat.orc_rlev2_decode
            nat.orc_rlev2_decode = lambda *a: None
            try:
                want = orc_mod._rlev2_decode(enc, len(vals), signed)
            finally:
                nat.orc_rlev2_decode = real
            assert np.array_equal(np.asarray(got), np.asarray(want)), \
                (signed, trial)
            assert np.array_equal(np.asarray(got), vals), (signed, trial)


def test_patched_base_unaligned_patch_width_liborc():
    """liborc packs PATCHED_BASE patch entries at
    getClosestFixedBits(pgw + pwidth) (RleDecoderV2), not at the raw
    combined width; mostly-small values with adjacent large outliers
    produce unaligned combined widths (e.g. 29/43/51 bits). Both the
    native and python decoders must round up identically."""
    paorc = pytest.importorskip("pyarrow.orc")
    import arrow_tpu.native as nat
    from arrow_tpu.io import orc as orc_mod
    rng = np.random.default_rng(7)
    for pw_shift in (28, 29, 30, 31, 37, 45):
        vals = rng.integers(0, 100, 512).astype(np.int64)
        out_pos = np.arange(5, 25)  # adjacent outliers -> gap width 1
        vals[out_pos] = (1 << pw_shift) + rng.integers(
            0, 1000, len(out_pos))
        buf = io.BytesIO()
        paorc.write_table(pa.table({"x": vals}), buf)
        buf.seek(0)
        got = np.asarray(
            orc.read_table(buf).column("x").combine().to_pylist())
        assert np.array_equal(got, vals), pw_shift
        # python fallback path decodes the same stripe identically
        buf.seek(0)
        real = nat.orc_rlev2_decode
        nat.orc_rlev2_decode = lambda *a: None
        try:
            got_py = np.asarray(
                orc.read_table(buf).column("x").combine().to_pylist())
        finally:
            nat.orc_rlev2_decode = real
        assert np.array_equal(got_py, vals), pw_shift
