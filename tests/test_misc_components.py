"""Validation, pretty printing, tensors, set-lookup/replace kernels."""

import io

import numpy as np
import pyarrow as pa
import pyarrow.compute as ppc
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc
from arrow_tpu.array.validate import ValidationError, validate, validate_full
from arrow_tpu.buffer import Buffer
from arrow_tpu.array.data import ArrayData
from arrow_tpu.pretty import array_to_string, table_to_string
from arrow_tpu.tensor import (SparseCOOTensor, SparseCSRMatrix, Tensor,
                              read_tensor, write_tensor)


def test_validate_ok():
    for vals, t in [([1, None], None), (["a", None], None),
                    ([[1], None], at.list_(at.int64())),
                    (["a", "a", None], at.dictionary(at.int32(),
                                                     at.string()))]:
        a = at.array(vals, t)
        validate(a.data)
        validate_full(a.data)


def test_validate_catches_bad_offsets():
    good = at.array(["ab", "c"]).data
    bad = ArrayData(good.type, good.length,
                    [good.buffers[0],
                     Buffer(np.array([0, 5, 3], dtype=np.int32)),
                     good.buffers[2]])
    with pytest.raises(ValidationError):
        validate_full(bad)


def test_validate_catches_bad_utf8():
    bad = ArrayData(at.string(), 1,
                    [None, Buffer(np.array([0, 2], dtype=np.int32)),
                     Buffer(b"\xff\xfe")])
    with pytest.raises(ValidationError):
        validate_full(bad)
    # structural-only validation passes
    validate(bad)


def test_validate_catches_bad_dictionary_index():
    d = at.array(["a", "b"]).data
    bad = ArrayData(at.dictionary(at.int32(), at.string()), 2,
                    [None, Buffer(np.array([0, 7], dtype=np.int32))],
                    dictionary=d)
    with pytest.raises(ValidationError):
        validate_full(bad)


def test_pretty_print():
    s = array_to_string(at.array([1, None, 3]))
    assert "null" in s and "1" in s
    ts = table_to_string(at.table({"x": [1, 2], "name": ["ab", None]}))
    assert "x" in ts and "name" in ts and "null" in ts
    long = table_to_string(at.table({"x": list(range(100))}), max_rows=5)
    assert "95 more rows" in long


def test_tensor_ipc_with_pyarrow():
    t = Tensor.from_numpy(np.arange(12, dtype=np.float32).reshape(3, 4),
                          ["r", "c"])
    buf = io.BytesIO()
    write_tensor(t, buf)
    assert read_tensor(buf.getvalue()).equals(t)
    pa_t = pa.ipc.read_tensor(pa.BufferReader(buf.getvalue()))
    assert pa_t.dim_names == ["r", "c"]
    assert np.array_equal(pa_t.to_numpy(), t.data)
    sink = pa.BufferOutputStream()
    pa.ipc.write_tensor(pa.Tensor.from_numpy(np.ones((2, 2))), sink)
    ours = read_tensor(sink.getvalue().to_pybytes())
    assert ours.shape == (2, 2)


def test_sparse_tensors():
    dense = np.array([[0, 1, 0], [2, 0, 3]])
    coo = SparseCOOTensor.from_dense_numpy(dense)
    assert coo.non_zero_length == 3
    assert np.array_equal(coo.to_dense(), dense)
    csr = SparseCSRMatrix.from_dense_numpy(dense)
    assert np.array_equal(csr.to_dense(), dense)


def test_is_in_index_in():
    a = at.array([1, 2, None, 5, 2])
    p = pa.array([1, 2, None, 5, 2])
    assert pc.is_in(a, value_set=[2, 5]).to_pylist() == \
        ppc.is_in(p, value_set=pa.array([2, 5])).to_pylist()
    assert pc.index_in(a, value_set=[5, 2]).to_pylist() == \
        ppc.index_in(p, value_set=pa.array([5, 2])).to_pylist()
    s = at.array(["a", "b", None])
    ps = pa.array(["a", "b", None])
    assert pc.is_in(s, value_set=["b"]).to_pylist() == \
        ppc.is_in(ps, value_set=pa.array(["b"])).to_pylist()


def test_fill_scans_and_replace():
    f = at.array([None, 1.5, None, 2.5, None])
    pf = pa.array([None, 1.5, None, 2.5, None])
    assert pc.fill_null_forward(f).to_pylist() == \
        ppc.fill_null_forward(pf).to_pylist()
    assert pc.fill_null_backward(f).to_pylist() == \
        ppc.fill_null_backward(pf).to_pylist()
    r = pc.replace_with_mask(at.array([1, 2, 3, 4]),
                             at.array([True, False, True, False]),
                             at.array([9, 8]))
    pr = ppc.replace_with_mask(pa.array([1, 2, 3, 4]),
                               pa.array([True, False, True, False]),
                               pa.array([9, 8]))
    assert r.to_pylist() == pr.to_pylist()


def test_run_end_encode():
    ree = pc.call_function("run_end_encode",
                           [at.array([1, 1, 2, 2, 2, None, 3])])
    assert ree.run_ends.to_pylist() == [2, 5, 6, 7]
    assert ree.values.to_pylist() == [1, 2, None, 3]
    # pyarrow shape parity: RunEndEncodedArray exposes the same children
    import pyarrow as pa
    import pyarrow.compute as ppc
    p = ppc.run_end_encode(pa.array([1, 1, 2, 2, 2, None, 3]))
    assert ree.run_ends.to_pylist() == p.run_ends.to_pylist()
    assert ree.values.to_pylist() == p.values.to_pylist()


def test_sparse_tensor_ipc_roundtrip():
    """SparseTensor IPC message (format/SparseTensor.fbs) for COO/CSR/CSC."""
    import io
    from arrow_tpu.tensor import (SparseCSCMatrix, read_sparse_tensor,
                                  write_sparse_tensor)
    dense = np.zeros((4, 6))
    dense[0, 1] = 2.5
    dense[2, 5] = -3.0
    dense[3, 0] = 1.0
    for cls in (SparseCOOTensor, SparseCSRMatrix, SparseCSCMatrix):
        st = cls.from_dense_numpy(dense)
        buf = io.BytesIO()
        write_sparse_tensor(st, buf)
        buf.seek(0)
        back = read_sparse_tensor(buf)
        assert isinstance(back, cls)
        assert np.array_equal(back.to_dense(), dense)
        assert back.non_zero_length == 3


def test_sparse_tensor_ipc_3d_coo_int32():
    import io
    from arrow_tpu.tensor import read_sparse_tensor, write_sparse_tensor
    d3 = np.zeros((2, 3, 4), dtype=np.int32)
    d3[1, 2, 3] = 7
    d3[0, 0, 0] = -2
    st = SparseCOOTensor.from_dense_numpy(d3)
    buf = io.BytesIO()
    write_sparse_tensor(st, buf)
    buf.seek(0)
    back = read_sparse_tensor(buf)
    assert back.data.dtype == np.int32
    assert np.array_equal(back.to_dense(), d3)


def test_config_system():
    """GlobalOptions / BuildInfo / RuntimeInfo (reference: config.h)."""
    import os
    from arrow_tpu import config as cfg
    bi = cfg.build_info()
    assert bi.compute_functions > 300
    assert bi.with_zstd and bi.with_native
    ri = cfg.runtime_info()
    assert ri.backend == "cpu" and ri.num_devices == 8
    assert ri.x64_enabled
    cfg.initialize(cfg.GlobalOptions(io_threads=4, bloom_mode="never"))
    assert os.environ["ARROW_IO_THREADS"] == "4"
    assert os.environ["ARROW_TPU_BLOOM"] == "never"
    assert cfg.global_options().io_threads == 4
    knobs = cfg.env_options()
    assert "ARROW_TPU_MOVEMENT" in knobs
    os.environ.pop("ARROW_TPU_BLOOM", None)


def test_chunk_resolver_and_datum():
    """ChunkResolver (chunk_resolver.h:65) + Datum variant (datum.h:46)."""
    cr = at.ChunkResolver([at.array([1, 2, 3]), at.array([4, 5])])
    assert cr.resolve(0) == (0, 0)
    assert cr.resolve(3) == (1, 0)
    assert cr.resolve(4) == (1, 1)
    c, i = cr.resolve_many([0, 2, 3, 4])
    assert c.tolist() == [0, 0, 1, 1]
    assert i.tolist() == [0, 2, 0, 1]
    assert at.Datum(at.array([1])).is_array()
    assert at.Datum(7).is_scalar()
    assert at.Datum(at.table({"a": [1]})).kind == at.Datum.TABLE


def test_equal_options_compare():
    """EqualOptions comparison (compare.h ArrayEquals/ApproxEquals)."""
    from arrow_tpu.compare import EqualOptions, array_equals, table_equals
    a = at.array([1.0, float("nan"), -0.0])
    b = at.array([1.0, float("nan"), 0.0])
    assert not array_equals(a, b)
    assert array_equals(a, b, EqualOptions(nans_equal=True))
    assert not array_equals(a, b, EqualOptions(nans_equal=True,
                                               signed_zeros_equal=False))
    c, d = at.array([1.0, 2.0]), at.array([1.000001, 2.0])
    assert not array_equals(c, d)
    assert array_equals(c, d, approx=True)
    assert array_equals(c, d, EqualOptions(atol=1e-9).with_atol(1e-3),
                        approx=True)
    assert table_equals(at.table({"x": [1]}), at.table({"x": [1]}))
    assert not table_equals(at.table({"x": [1]}), at.table({"y": [1]}))


# --- t-digest sketch (utils/tdigest.py vs util/tdigest.h) -------------------


class TestTDigest:
    def test_accuracy_across_distributions(self):
        import numpy as np
        from arrow_tpu.utils.tdigest import TDigest
        rng = np.random.default_rng(0)
        for data in (rng.normal(100, 15, 100_000),
                     rng.lognormal(0, 2, 100_000),
                     np.concatenate([rng.normal(0, 1, 50_000),
                                     rng.normal(50, 1, 50_000)])):
            d = TDigest.from_array(data, delta=100)
            srt = np.sort(data)
            for q in (0.01, 0.25, 0.5, 0.9, 0.99):
                est = d.quantile(q)
                rank_err = abs(np.searchsorted(srt, est) / len(data) - q)
                assert rank_err < 0.01

    def test_merge_matches_whole(self):
        import numpy as np
        from arrow_tpu.utils.tdigest import TDigest
        rng = np.random.default_rng(1)
        data = rng.normal(0, 1, 200_000)
        parts = [TDigest.from_array(s) for s in np.array_split(data, 8)]
        merged = parts[0].merge(parts[1:])
        srt = np.sort(data)
        for q in (0.05, 0.5, 0.95):
            est = merged.quantile(q)
            assert abs(np.searchsorted(srt, est) / len(data) - q) < 0.01

    def test_edges(self):
        import math
        import numpy as np
        from arrow_tpu.utils.tdigest import TDigest
        assert math.isnan(TDigest.from_array([]).quantile(0.5))
        assert math.isnan(TDigest.from_array([np.nan]).quantile(0.5))
        assert TDigest.from_array([7.0]).quantile(0.5) == 7.0
        t = TDigest.from_array([1.0, 2.0, 3.0])
        assert list(t.quantile([0.0, 1.0])) == [1.0, 3.0]
        assert t.median() == 2.0
        assert abs(t.mean() - 2.0) < 1e-12

    def test_vs_pyarrow_tdigest(self):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as ppc
        from arrow_tpu.utils.tdigest import TDigest
        rng = np.random.default_rng(2)
        arr = rng.normal(10, 3, 50_000)
        ref = ppc.tdigest(pa.array(arr), q=[0.1, 0.5, 0.9]).to_pylist()
        ours = TDigest.from_array(arr).quantile([0.1, 0.5, 0.9])
        srt = np.sort(arr)
        for o, r, q in zip(ours, ref, (0.1, 0.5, 0.9)):
            assert abs(np.searchsorted(srt, o) / len(arr) - q) < 0.01
            assert abs(np.searchsorted(srt, r) / len(arr) - q) < 0.01


# --- memory pools (memory.py vs memory_pool.h:109) --------------------------


class TestMemoryPool:
    def test_tracking_and_views(self):
        import gc
        gc.collect()  # drop other tests' pending garbage before baselining
        base = at.total_allocated_bytes()
        t = at.table({"a": list(range(50_000))})
        delta = at.total_allocated_bytes() - base
        assert delta >= 50_000 * 8
        before = at.total_allocated_bytes()
        sl = t.column(0).slice(10, 100)          # view: no new allocation
        assert at.total_allocated_bytes() == before
        del t, sl
        gc.collect()
        # other sessions' garbage may be released alongside ours, so the
        # total can only have gone down to (or below) the baseline
        assert at.total_allocated_bytes() <= base
        pool = at.default_memory_pool()
        assert pool.max_memory() >= delta
        assert pool.num_allocations() >= 1
        assert pool.backend_name in at.supported_memory_backends() + \
            ["system"]

    def test_capped_and_proxy(self):
        capped = at.CappedMemoryPool(1024)
        held = capped.allocate(512)
        assert held.size == 512
        with pytest.raises(MemoryError):
            capped.allocate(1024)
        prox = at.ProxyMemoryPool(at.default_memory_pool())
        buf = prox.allocate(256)
        assert prox.bytes_allocated() == 256
        assert buf.size == 256

    def test_logging_pool(self):
        import io as _io
        sink = _io.StringIO()
        lp = at.LoggingMemoryPool(sink=sink)
        lp.allocate(64)
        assert "Allocate: size = 64" in sink.getvalue()


def test_sparse_csf_tensor():
    """CSF prefix-tree tensor: structure matches the format spec's worked
    example (format/SparseTensor.fbs SparseTensorIndexCSF), dense
    round-trip, and SparseTensor IPC message round-trip."""
    import io

    import numpy as np

    from arrow_tpu.tensor import (SparseCSFTensor, read_sparse_tensor,
                                  write_sparse_tensor)

    X = np.zeros((2, 2, 2, 3), np.int64)
    X[0, 0, 0, 1] = 1
    X[0, 0, 0, 2] = 2
    X[0, 1, 0, 0] = 3
    X[0, 1, 0, 2] = 4
    X[0, 1, 1, 0] = 5
    X[1, 1, 1, 0] = 6
    X[1, 1, 1, 1] = 7
    X[1, 1, 1, 2] = 8
    st = SparseCSFTensor.from_dense_numpy(X)
    # the spec's worked example, verbatim
    assert [i.tolist() for i in st.indices] == \
        [[0, 1], [0, 1, 1], [0, 0, 1, 1], [1, 2, 0, 2, 0, 0, 1, 2]]
    assert [p.tolist() for p in st.indptr] == \
        [[0, 2, 3], [0, 1, 3, 4], [0, 2, 4, 5, 8]]
    assert st.non_zero_length == 8
    assert np.array_equal(st.to_dense(), X)

    buf = io.BytesIO()
    write_sparse_tensor(st, buf)
    rt = read_sparse_tensor(buf.getvalue())
    assert isinstance(rt, SparseCSFTensor)
    assert rt.axis_order == [0, 1, 2, 3]
    assert np.array_equal(rt.to_dense(), X)

    # float + randomized shapes
    rng = np.random.default_rng(0)
    Y = np.where(rng.random((4, 3, 5)) < 0.2, rng.normal(size=(4, 3, 5)),
                 0.0)
    sy = SparseCSFTensor.from_dense_numpy(Y)
    assert np.array_equal(sy.to_dense(), Y)
    buf = io.BytesIO()
    write_sparse_tensor(sy, buf)
    assert np.array_equal(read_sparse_tensor(buf.getvalue()).to_dense(), Y)


class TestOtelExport:
    """OTLP/JSON trace export of query node metrics (reference:
    util/tracing.h + opentelemetry OTLP exporter)."""

    def _run_query(self, tmp_path, dest):
        import os

        import arrow_tpu as at
        from arrow_tpu import acero
        from arrow_tpu.acero.query_context import QueryOptions
        t = at.table({"a": [1, 2, 3, 4], "b": [1.0, 2.0, 3.0, 4.0]})
        decl = acero.Declaration(
            "filter", acero.FilterNodeOptions(acero.field("a") > 1),
            inputs=[acero.Declaration(
                "table_source", acero.TableSourceNodeOptions(t))])
        os.environ["ARROW_TPU_OTEL_EXPORT"] = dest
        try:
            out = decl.to_table(query_options=QueryOptions())
        finally:
            del os.environ["ARROW_TPU_OTEL_EXPORT"]
        assert out.num_rows == 3
        return decl.last_query_context

    def test_otlp_file_export(self, tmp_path):
        import json
        path = str(tmp_path / "traces.jsonl")
        self._run_query(tmp_path, path)
        lines = open(path).read().strip().splitlines()
        assert len(lines) == 1
        payload = json.loads(lines[0])
        spans = payload["resourceSpans"][0]["scopeSpans"][0]["spans"]
        assert len(spans) >= 2                       # root + nodes
        names = {s["name"] for s in spans}
        assert any("filter" in n or "table_source" in n or
                   n == "filter" for n in names), names
        root = spans[0]
        assert all(s.get("parentSpanId") == root["spanId"]
                   for s in spans[1:])
        assert payload["resourceSpans"][0]["resource"][
            "attributes"][0]["value"]["stringValue"] == "arrow_tpu"

    def test_otlp_http_export(self, tmp_path):
        """POSTs to a live OTLP/HTTP-shaped collector endpoint."""
        import json
        import threading
        from http.server import BaseHTTPRequestHandler, HTTPServer
        got = []

        class Collector(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                got.append(json.loads(self.rfile.read(n)))
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        srv = HTTPServer(("127.0.0.1", 0), Collector)
        thr = threading.Thread(target=srv.serve_forever, daemon=True)
        thr.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/v1/traces"
            self._run_query(tmp_path, url)
            assert got and "resourceSpans" in got[0]
        finally:
            srv.shutdown()
