"""Chunked parallel JSON pipeline (io/json.py _read_json_parallel +
lazily-streaming open_json — json/reader.h TableReader/StreamingReader
analogue): block-parallel results must equal the single-block parse,
schema drift across blocks unifies, and open_json parses lazily."""

import json

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu.io import json as ajson


def _ndjson(n, drift_at=None, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        rec = {"a": int(i), "b": float(rng.normal()),
               "s": f"v{i % 53}"}
        if i % 11 == 0:
            rec["a"] = None
        if drift_at is not None and i >= drift_at:
            rec["extra"] = i * 2
        rows.append(json.dumps(rec))
    return ("\n".join(rows) + "\n").encode()


def test_parallel_equals_single_block(monkeypatch):
    data = _ndjson(30_000)
    whole = ajson._native_json_table(data, ajson.ReadOptions())
    # force the parallel path regardless of size thresholds
    spans = ajson._split_newline_blocks(data, 4)
    parts = [ajson._native_json_table(data[s[0]:s[1]],
                                      ajson.ReadOptions())
             for s in spans]
    uni = ajson._unify_chunk_tables(parts)
    assert uni.num_rows == whole.num_rows == 30_000
    assert uni.column_names == whole.column_names
    for c in whole.column_names:
        assert uni.column(c).to_pylist() == whole.column(c).to_pylist()


def test_parallel_schema_drift_unifies():
    # drift aligned to a block boundary: block 2 carries a new column
    head = _ndjson(5_000)
    tail = _ndjson(3_000, drift_at=0, seed=1)
    parts = [ajson._native_json_table(head, ajson.ReadOptions()),
             ajson._native_json_table(tail, ajson.ReadOptions())]
    assert all(p is not None for p in parts)
    uni = ajson._unify_chunk_tables(parts)
    assert uni.num_rows == 8_000
    extra = uni.column("extra").to_pylist()
    assert extra[:5_000] == [None] * 5_000
    assert extra[5_000] == 0


def test_parallel_int_float_promotion():
    rows = [json.dumps({"x": 1}) for _ in range(100)] + \
        [json.dumps({"x": 2.5}) for _ in range(100)]
    data = ("\n".join(rows) + "\n").encode()
    spans = ajson._split_newline_blocks(data, 2)
    parts = [ajson._native_json_table(data[s[0]:s[1]],
                                      ajson.ReadOptions())
             for s in spans]
    uni = ajson._unify_chunk_tables(parts)
    assert str(uni.column("x").combine().type) == "double"
    assert uni.column("x").to_pylist()[0] == 1.0


def test_open_json_is_lazy_and_complete():
    data = _ndjson(20_000)
    ro = ajson.ReadOptions(block_size=1 << 16)
    it = ajson.open_json(data, read_options=ro)
    batches = list(it)
    assert len(batches) > 3  # actually blocked, not one shot
    total = sum(b.num_rows for b in batches)
    assert total == 20_000
    first = batches[0]
    assert first.schema.names == ["a", "b", "s"]


def test_read_json_large_parallel_matches_pyarrow():
    data = _ndjson(120_000)
    ours = ajson.read_json(data)
    pj = pytest.importorskip("pyarrow.json")
    import io
    want = pj.read_json(io.BytesIO(data))
    assert ours.num_rows == want.num_rows
    assert ours.column("a").to_pylist() == want.column("a").to_pylist()
    np.testing.assert_allclose(
        [v for v in ours.column("b").to_pylist()],
        [v for v in want.column("b").to_pylist()], rtol=0)
