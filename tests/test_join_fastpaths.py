"""Differential tests for the round-5 join fast paths.

Two independent fast paths, both auto-selected:

* direct single-key plan (compute/join.py _use_direct_single_key): no
  shared grouper, build-side-only sort + order-word binary search.
  Off switch: ARROW_TPU_JOIN_DIRECT=off.
* unique-build (primary-key) materialize (join_gather_indices
  unique_build=True): identity / one-compaction expansion when the
  prep readback observed max(counts) <= 1. Off switch:
  ARROW_TPU_JOIN_UNIQUE=off.

Every case runs ours-vs-pyarrow on the same rows (sorted-row
comparison), across the path-selection matrix, covering the sentinel
edge cases the order-word encoding relies on: int64 max (the MAXW
word), canonical-NaN float keys, null keys, and duplicate build keys
(which must force the general expansion off the unique path).
Reference: acero/hash_join_node_test.cc key-type sweeps.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

import arrow_tpu as at
from arrow_tpu import acero
from arrow_tpu.acero import (Declaration, HashJoinNodeOptions,
                             TableSourceNodeOptions)


def _ours(ltab, rtab, jt, keys=("k", "j")):
    lsrc = Declaration("table_source", TableSourceNodeOptions(ltab))
    rsrc = Declaration("table_source", TableSourceNodeOptions(rtab))
    d = Declaration("hashjoin", HashJoinNodeOptions(
        jt, left_keys=[keys[0]], right_keys=[keys[1]]),
        inputs=[lsrc, rsrc])
    return d.to_table()


def _pyarrow(ltab, rtab, jt, keys=("k", "j")):
    import pyarrow.acero as pac
    lsrc = pac.Declaration("table_source",
                           pac.TableSourceNodeOptions(ltab))
    rsrc = pac.Declaration("table_source",
                           pac.TableSourceNodeOptions(rtab))
    d = pac.Declaration("hashjoin", pac.HashJoinNodeOptions(
        jt, left_keys=[keys[0]], right_keys=[keys[1]]),
        inputs=[lsrc, rsrc])
    return d.to_table()


def _sorted_pandas(tab):
    df = tab.to_pandas()
    cols = list(df.columns)
    return df.sort_values(cols, na_position="last").reset_index(drop=True)


def _check(lcols, rcols, jt, monkeypatch, direct, unique):
    monkeypatch.setenv("ARROW_TPU_JOIN_DIRECT", "on" if direct else "off")
    monkeypatch.setenv("ARROW_TPU_JOIN_UNIQUE", "on" if unique else "off")
    lpa = pa.table(lcols)
    rpa = pa.table(rcols)
    ours = _ours(at.table(lcols), at.table(rcols), jt)
    ref = _pyarrow(lpa, rpa, jt)
    assert ours.num_rows == ref.num_rows, (jt, direct, unique)
    got = _sorted_pandas(pa.table(ours))
    want = _sorted_pandas(ref)
    import pandas.testing as pdt
    got.columns = list(want.columns)
    pdt.assert_frame_equal(got, want, check_dtype=False)


def _import(pa_table):
    from arrow_tpu.table import RecordBatchReader
    return RecordBatchReader.from_stream(pa_table).read_all()


_MATRIX = [(d, u) for d in (True, False) for u in (True, False)]


@pytest.mark.parametrize("direct,unique", _MATRIX)
@pytest.mark.parametrize("jt", ["inner", "left outer"])
def test_pk_join_int64(jt, direct, unique, monkeypatch):
    rng = np.random.default_rng(7)
    # unique build side incl. int64 max (the MAXW order word)
    bk = np.array([5, 1, 9, 2 ** 63 - 1, -4, 0, 7, 12], np.int64)
    pk = rng.choice(np.concatenate([bk, [100, -100, 2 ** 63 - 2]]), 64)
    _check({"k": pk, "lv": np.arange(64.0)},
           {"j": bk, "rv": np.arange(8) * 10},
           jt, monkeypatch, direct, unique)


@pytest.mark.parametrize("direct,unique", _MATRIX)
@pytest.mark.parametrize("jt", ["inner", "left outer", "full outer",
                                "left semi", "left anti", "right outer"])
def test_dup_build_falls_back(jt, direct, unique, monkeypatch):
    rng = np.random.default_rng(3)
    bk = rng.integers(0, 6, 40)  # heavy duplication: general expansion
    pk = rng.integers(0, 9, 70)
    _check({"k": pk, "lv": rng.normal(size=70)},
           {"j": bk, "rv": rng.normal(size=40)},
           jt, monkeypatch, direct, unique)


@pytest.mark.parametrize("direct", [True, False])
@pytest.mark.parametrize("jt", ["inner", "left outer"])
def test_null_keys_never_match(jt, direct, monkeypatch):
    pk = pa.array([1, None, 3, None, 5, 1], type=pa.int64())
    bk = pa.array([1, None, 5, 7], type=pa.int64())
    lpa = pa.table({"k": pk, "lv": [10, 20, 30, 40, 50, 60]})
    rpa = pa.table({"j": bk, "rv": [1.5, 2.5, 3.5, 4.5]})
    monkeypatch.setenv("ARROW_TPU_JOIN_DIRECT", "on" if direct else "off")
    ours = _ours(_import(lpa), _import(rpa), jt)
    ref = _pyarrow(lpa, rpa, jt)
    assert ours.num_rows == ref.num_rows
    got = _sorted_pandas(pa.table(ours))
    want = _sorted_pandas(ref)
    import pandas.testing as pdt
    pdt.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("direct", [True, False])
def test_nan_matches_nan(direct, monkeypatch):
    # grouper path canonicalizes NaN to one word; the direct path must
    # agree (NaN key joins NaN key), incl. against a unique build side
    monkeypatch.setenv("ARROW_TPU_JOIN_DIRECT", "on" if direct else "off")
    lk = np.array([1.0, np.nan, 3.5, np.nan, -0.0], np.float64)
    rk = np.array([np.nan, 3.5, 2.0, 0.0], np.float64)
    ours = _ours(at.table({"k": lk, "lv": np.arange(5)}),
                 at.table({"j": rk, "rv": np.arange(4) * 10}), "inner")
    # pyarrow: NaN joins NaN too; -0.0 == 0.0 in pyarrow though, so
    # compare only the NaN/plain rows here and pin +-0.0 separately
    df = pa.table(ours).to_pandas()
    nan_rows = df[df["k"].isna()]
    assert len(nan_rows) == 2  # two NaN probe rows x one NaN build row
    assert len(df[df["k"] == 3.5]) == 1


@pytest.mark.parametrize("direct,unique", _MATRIX)
def test_pk_join_float_keys(direct, unique, monkeypatch):
    rng = np.random.default_rng(11)
    bk = np.array([0.5, -1.25, 3e300, -3e-300, 7.0, 2.0], np.float64)
    pk = rng.choice(np.concatenate([bk, [9.9, -9.9]]), 48)
    _check({"k": pk, "lv": rng.normal(size=48)},
           {"j": bk, "rv": np.arange(6.0)},
           "inner", monkeypatch, direct, unique)


@pytest.mark.parametrize("direct,unique", _MATRIX)
def test_pk_join_uint_and_small_int(direct, unique, monkeypatch):
    rng = np.random.default_rng(13)
    bk = np.arange(20, dtype=np.uint32) * 3
    pk = rng.integers(0, 70, 55).astype(np.uint32)
    _check({"k": pk, "lv": rng.normal(size=55)},
           {"j": bk, "rv": np.arange(20)},
           "left outer", monkeypatch, direct, unique)
    bk2 = np.array([-5, -1, 0, 3, 9], np.int16)
    pk2 = rng.integers(-8, 12, 33).astype(np.int16)
    _check({"k": pk2, "lv": rng.normal(size=33)},
           {"j": bk2, "rv": np.arange(5)},
           "inner", monkeypatch, direct, unique)


@pytest.mark.parametrize("jt", ["inner", "left outer"])
def test_empty_build_side(jt, monkeypatch):
    monkeypatch.setenv("ARROW_TPU_JOIN_DIRECT", "on")
    lpa = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                    "lv": [1.0, 2.0, 3.0]})
    rpa = pa.table({"j": pa.array([], pa.int64()),
                    "rv": pa.array([], pa.float64())})
    ours = _ours(_import(lpa), _import(rpa), jt)
    ref = _pyarrow(lpa, rpa, jt)
    assert ours.num_rows == ref.num_rows


def test_speculative_unique_eviction(monkeypatch):
    """A remembered unique-build guess must be VERIFIED: reusing the
    same options object against a build side that grew duplicate keys
    has to re-execute on the general path (wrong-output guard), per
    the end-of-plan _spec_verify contract."""
    monkeypatch.setenv("ARROW_TPU_SPECULATIVE_CAPS", "on")
    opts = HashJoinNodeOptions("inner", left_keys=["k"],
                               right_keys=["j"])
    pk = np.array([0, 1, 2, 3, 0, 1], np.int64)

    def run(bk):
        lsrc = Declaration("table_source", TableSourceNodeOptions(
            at.table({"k": pk, "lv": np.arange(6.0)})))
        rsrc = Declaration("table_source", TableSourceNodeOptions(
            at.table({"j": bk, "rv": np.arange(len(bk)) * 1.0})))
        d = Declaration("hashjoin", opts, inputs=[lsrc, rsrc])
        return d.to_table()

    uniq = np.array([0, 1, 2, 9], np.int64)
    out1 = run(uniq)
    out2 = run(uniq)  # speculated: unique path from cache
    assert out1.num_rows == out2.num_rows == 5
    dup = np.array([0, 0, 1, 9], np.int64)  # build keys now duplicate
    out3 = run(dup)
    # 2 probes of k=0 x 2 build rows + 2 probes of k=1 x 1 = 6 rows,
    # but the CONTENT differs from a stale unique materialize: row
    # count alone would still be 6 only if expansion ran correctly
    import pyarrow as _pa
    df = _pa.table(out3).to_pandas().sort_values(
        ["k", "lv", "rv"]).reset_index(drop=True)
    assert len(df) == 6
    assert list(df[df["k"] == 0]["rv"]) == [0.0, 1.0, 0.0, 1.0]
