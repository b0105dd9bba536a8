"""dlpack producer protocol on primitive arrays (reference:
cpp/src/arrow/c/dlpack.cc ExportArray/ExportDevice; pyarrow exposes the
same __dlpack__/__dlpack_device__ surface on Array)."""
import numpy as np
import pytest

import arrow_tpu as at


def test_dlpack_numpy_roundtrip():
    arr = at.array([1, 2, 3], type=at.int64())
    out = np.from_dlpack(arr)
    np.testing.assert_array_equal(out, [1, 2, 3])
    assert out.dtype == np.int64


def test_dlpack_device_is_cpu():
    arr = at.array([1.5, 2.5], type=at.float64())
    dev, dev_id = arr.__dlpack_device__()
    assert dev == 1  # kDLCPU


def test_dlpack_torch_consumer():
    torch = pytest.importorskip("torch")
    arr = at.array([1.0, 2.0, 4.0], type=at.float32())
    t = torch.from_dlpack(arr)
    assert t.dtype == torch.float32
    assert t.tolist() == [1.0, 2.0, 4.0]


def test_dlpack_with_nulls_raises():
    arr = at.array([1, None, 3], type=at.int64())
    with pytest.raises(Exception):
        arr.__dlpack__()


def test_dlpack_matches_pyarrow_semantics():
    pa = pytest.importorskip("pyarrow")
    ours = np.from_dlpack(at.array([7, 8], type=at.int32()))
    theirs = np.from_dlpack(pa.array([7, 8], type=pa.int32()))
    np.testing.assert_array_equal(ours, theirs)
    assert ours.dtype == theirs.dtype
