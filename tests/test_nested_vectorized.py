"""Vectorized offsets-arithmetic nested kernels vs pyarrow at scale
(reference: scalar_nested.cc / vector_nested.cc /
vector_run_end_encode.cc — offset arithmetic, not per-row loops)."""

import numpy as np
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc


def _big_list_column(n=1_000_000, seed=5):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, 5, n)
    null = rng.random(n) < 0.05
    vals = []
    for ln, nu in zip(lens, null):
        vals.append(None if nu else [int(x) for x in range(ln)])
    return vals


class TestNestedVectorized:
    def setup_method(self):
        self.vals = _big_list_column(200_000)
        self.arr = at.array(self.vals, at.list_(at.int64()))
        import pyarrow as pa
        self.pa_arr = pa.array(self.vals, pa.list_(pa.int64()))

    def test_value_length_matches_pyarrow(self):
        import pyarrow.compute as ppc
        got = pc.list_value_length(self.arr).to_pylist()
        want = ppc.list_value_length(self.pa_arr).to_pylist()
        assert got == want

    def test_flatten_matches_pyarrow(self):
        import pyarrow.compute as ppc
        got = pc.list_flatten(self.arr).to_pylist()
        want = ppc.list_flatten(self.pa_arr).to_pylist()
        assert got == want

    def test_parent_indices_matches_pyarrow(self):
        import pyarrow.compute as ppc
        got = pc.list_parent_indices(self.arr).to_pylist()
        want = ppc.list_parent_indices(self.pa_arr).to_pylist()
        assert got == want

    def test_element_matches_pyarrow(self):
        import pyarrow.compute as ppc
        for k in (0, 1, 3):
            got = pc.list_element(self.arr, k).to_pylist()
            want = [None if (v is None or k >= len(v)) else v[k]
                    for v in self.vals]
            assert got == want, k

    def test_vectorized_path_active(self, monkeypatch):
        """The offsets path must be taken for plain list arrays — the
        pylist fallback is poisoned."""
        from arrow_tpu.array import array as A
        real = A.Array.to_pylist

        def boom(self):
            raise AssertionError("pylist fallback unexpectedly used")
        monkeypatch.setattr(A.Array, "to_pylist", boom)
        try:
            pc.list_value_length(self.arr)
            pc.list_parent_indices(self.arr)
            pc.list_flatten(self.arr)
        finally:
            monkeypatch.setattr(A.Array, "to_pylist", real)

    def test_fixed_size_list(self):
        vals = [[1, 2, 3], None, [4, 5, 6], [7, 8, 9]]
        arr = at.array(vals, at.fixed_size_list(at.int64(), 3))
        assert pc.list_value_length(arr).to_pylist() == [3, None, 3, 3]
        assert pc.list_flatten(arr).to_pylist() == \
            [1, 2, 3, 4, 5, 6, 7, 8, 9]
        assert pc.list_parent_indices(arr).to_pylist() == \
            [0, 0, 0, 2, 2, 2, 3, 3, 3]


class TestRunEndDecodeVectorized:
    def test_roundtrip_1m(self):
        rng = np.random.default_rng(7)
        n = 1_000_000
        vals = rng.integers(0, 50, n).astype(np.int64)
        # runs via sorting segments
        vals.sort()
        arr = at.array([int(v) for v in vals], at.int64())
        ree = pc.run_end_encode(arr)
        back = pc.run_end_decode(ree)
        assert back.to_pylist() == arr.to_pylist()

    def test_decode_with_nnull_runs(self):
        vals = [1, 1, None, None, 2, 2, 2, None, 3]
        arr = at.array(vals, at.int64())
        ree = pc.run_end_encode(arr)
        assert pc.run_end_decode(ree).to_pylist() == vals
