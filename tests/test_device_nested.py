"""Device nested tier (compute/device_nested.py): with the gate forced
ON, the device list/REE kernels must produce results identical to the
vectorized host tier (which pins the reference semantics,
scalar_nested.cc / vector_nested.cc / vector_run_end_encode.cc)."""

import numpy as np
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc
from arrow_tpu.compute import device_nested


@pytest.fixture(autouse=True)
def _force_on(monkeypatch):
    monkeypatch.setenv("ARROW_TPU_DEVICE_NESTED", "on")
    yield


def _lists(seed=0, n=500, child="float"):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        if i % 19 == 0:
            out.append(None)
            continue
        k = int(rng.integers(0, 6))
        if child == "float":
            row = [None if rng.random() < 0.1 else float(v)
                   for v in rng.normal(size=k)]
        else:
            row = [f"s{int(v)}" for v in rng.integers(0, 40, k)]
        out.append(row)
    t = at.list_(at.float64() if child == "float" else at.string())
    return at.array(out, t)


def _host(fn, *args, **kw):
    """The host-tier result (gate off) as the oracle."""
    import os
    os.environ["ARROW_TPU_DEVICE_NESTED"] = "off"
    try:
        return fn(*args, **kw)
    finally:
        os.environ["ARROW_TPU_DEVICE_NESTED"] = "on"


@pytest.mark.parametrize("child", ["float", "str"])
def test_list_value_length(child):
    arr = _lists(child=child)
    got = pc.list_value_length(arr)
    want = _host(pc.list_value_length, arr)
    assert got.to_pylist() == want.to_pylist()
    assert device_nested.list_device(arr) is not None


@pytest.mark.parametrize("child", ["float", "str"])
def test_list_flatten(child):
    arr = _lists(child=child)
    got = pc.list_flatten(arr).to_pylist()
    want = _host(pc.list_flatten, arr).to_pylist()
    assert got == want


def test_list_parent_indices_null_free():
    vals = [[1.0, 2.0], [], [3.0], [4.0, 5.0, 6.0]] * 50
    arr = at.array(vals, at.list_(at.float64()))
    got = pc.list_parent_indices(arr).to_pylist()
    want = _host(pc.list_parent_indices, arr).to_pylist()
    assert got == want


@pytest.mark.parametrize("index", [0, 1, 3])
@pytest.mark.parametrize("child", ["float", "str"])
def test_list_element(index, child):
    arr = _lists(child=child)
    got = pc.list_element(arr, index).to_pylist()
    want = _host(pc.list_element, arr, index).to_pylist()
    assert got == want


def test_fixed_size_list():
    arr = at.array([[1.0, 2.0], [3.0, 4.0], None, [5.0, 6.0]],
                   at.fixed_size_list(at.float64(), 2))
    got = pc.list_value_length(arr).to_pylist()
    want = _host(pc.list_value_length, arr).to_pylist()
    assert got == want
    assert pc.list_element(arr, 1).to_pylist() == \
        _host(pc.list_element, arr, 1).to_pylist()


def test_run_end_decode():
    ree = pc.run_end_encode(at.array(
        [1.5, 1.5, 1.5, None, None, 2.5, 2.5, 1.5] * 40))
    got = pc.run_end_decode(ree).to_pylist()
    want = _host(pc.run_end_decode, ree).to_pylist()
    assert got == want


def test_memoization_reuses_device_buffers():
    arr = _lists()
    a = device_nested.list_device(arr)
    b = device_nested.list_device(arr)
    assert a is b


def test_nested_of_nested_falls_back():
    arr = at.array([[[1.0]], [[2.0], [3.0]], None],
                   at.list_(at.list_(at.float64())))
    assert device_nested.list_device(arr) is None
    got = pc.list_value_length(arr).to_pylist()
    assert got == [1, 2, None]
