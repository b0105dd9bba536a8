"""Movement-layer strategy equivalence: the 'sort', 'direct' and
'scatter' lowerings of compact_by_mask must agree on the live prefix
for every device dtype (reference analogue: the selection kernels are
lowering-independent, vector_selection_benchmark.cc exercises the same
invariant across SIMD levels)."""

import numpy as np
import pytest

import jax.numpy as jnp

from arrow_tpu.compute import move


def _cases(rng, n):
    return [
        jnp.asarray(rng.standard_normal(n)),                     # f64
        jnp.asarray(rng.standard_normal(n).astype(np.float32)),  # f32
        jnp.asarray(rng.integers(-(1 << 62), 1 << 62, n)),       # i64
        jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32)),
        jnp.asarray(rng.integers(0, 255, n).astype(np.uint8)),
        jnp.asarray(
            rng.integers(0, 1 << 63, n).astype(np.uint64)),      # u64
    ]


@pytest.mark.parametrize("selectivity", [0.0, 0.5, 1.0])
def test_compact_modes_agree(monkeypatch, selectivity):
    rng = np.random.default_rng(7)
    n = 4096
    keep = jnp.asarray(rng.random(n) < selectivity)
    arrays = _cases(rng, n)
    results = {}
    for mode in ("sort", "direct", "scatter", "gather"):
        monkeypatch.setenv("ARROW_TPU_MOVEMENT", mode)
        outs, count = move.compact_by_mask(keep, arrays)
        results[mode] = ([np.asarray(o) for o in outs], int(count))
    k = results["direct"][1]
    assert results["sort"][1] == k == results["scatter"][1] \
        == results["gather"][1]
    expect = [np.asarray(a)[np.asarray(keep)] for a in arrays]
    for mode in ("sort", "direct", "scatter", "gather"):
        outs, _ = results[mode]
        for o, e in zip(outs, expect):
            assert np.array_equal(o[:k], e), mode


def test_i64_split_roundtrip_exact():
    """The u32 shift split/recombine must be bit-exact across the whole
    int64/uint64 range (incl. INT64_MIN and sign-bit patterns)."""
    vals = np.array([0, 1, -1, 2**63 - 1, -(2**63), 123456789012345,
                     -987654321098765, 2**32, -(2**32) - 1], np.int64)
    keep = jnp.ones(len(vals), jnp.bool_)
    pos = jnp.arange(len(vals), dtype=jnp.int32)
    out = move._scatter32_to(pos, jnp.asarray(vals), len(vals))
    assert np.array_equal(np.asarray(out), vals)
    uvals = vals.view(np.uint64)
    out_u = move._scatter32_to(pos, jnp.asarray(uvals), len(uvals))
    assert np.array_equal(np.asarray(out_u), uvals)


_F64_EDGE = np.array([
    0.0, -0.0, 1.0, -1.0, np.pi, -np.e,
    np.inf, -np.inf, np.nan,
    np.finfo(np.float64).max, np.finfo(np.float64).min,
    np.finfo(np.float64).tiny,               # smallest normal
    np.finfo(np.float64).smallest_subnormal,
    -np.finfo(np.float64).smallest_subnormal,
    5e-324 * 7,                              # mid-subnormal
    1.0000000000000002,                      # 1 + ulp
    9007199254740993.0,                      # 2^53 + 1 (rounds)
], np.float64)


def test_f64_scatter_bitcast_bit_exact():
    """The u32-plane bitcast split is BIT-exact: subnormals, -0.0,
    inf, nan, extreme exponents (reference bar: moving data can never
    change it — vector_selection kernels copy bytes)."""
    vals = _F64_EDGE
    pos = jnp.arange(len(vals), dtype=jnp.int32)
    out = np.asarray(move._scatter_f64_bitcast(pos, jnp.asarray(vals),
                                               len(vals)))
    assert np.array_equal(out.view(np.uint64), vals.view(np.uint64))
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2**64, 20000, dtype=np.uint64)
    rvals = bits.view(np.float64)
    pos = jnp.arange(len(rvals), dtype=jnp.int32)
    out = np.asarray(move._scatter_f64_bitcast(pos, jnp.asarray(rvals),
                                               len(rvals)))
    assert np.array_equal(out.view(np.uint64), bits)


def test_f64_scatter_frexp_exact_modulo_subnormals():
    """The arithmetic (no-bitcast) split is exact for normals and
    specials; subnormal inputs flush to +-0 (XLA flushes subnormal
    f64 arithmetic results — documented limitation, opt-in mode)."""
    vals = _F64_EDGE
    pos = jnp.arange(len(vals), dtype=jnp.int32)
    out = np.asarray(move._scatter_f64_frexp(pos, jnp.asarray(vals),
                                             len(vals)))
    tiny = np.finfo(np.float64).tiny
    subnormal = np.logical_and(np.abs(vals) < tiny, vals != 0.0)
    assert np.array_equal(out[subnormal], np.zeros(subnormal.sum()))
    ok = ~subnormal
    assert np.array_equal(out[ok].view(np.uint64),
                          vals[ok].view(np.uint64))


def test_f64_compact_scatter_mode_uses_planes(monkeypatch):
    """compact_by_mask in scatter mode routes f64 through the bitcast
    plane path on platforms that allow it and stays value-exact."""
    monkeypatch.setenv("ARROW_TPU_MOVEMENT", "scatter")
    monkeypatch.setenv("ARROW_TPU_F64_PLANES", "bitcast")
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(4096)
    keep = jnp.asarray(rng.random(4096) < 0.4)
    (out,), count = move.compact_by_mask(keep, [jnp.asarray(vals)])
    k = int(count)
    assert np.array_equal(np.asarray(out)[:k], vals[np.asarray(keep)])


def test_sort_planes_payloads_exact(monkeypatch):
    """64-bit integer payloads through the u32-plane sort lowering
    (round-4 chip A/B: 1.75x) must be bit-exact vs the direct sort,
    including sign extremes and mixed payload dtypes."""
    import numpy as np
    import jax.numpy as jnp

    from arrow_tpu.compute.move import sort_with_payload
    monkeypatch.setenv("ARROW_TPU_MOVEMENT", "sort")
    rng = np.random.default_rng(3)
    n = 4096
    keys = jnp.asarray(rng.integers(0, 7, n).astype(np.uint8))
    i64 = jnp.asarray(np.concatenate([
        rng.integers(-(1 << 62), 1 << 62, n - 4),
        [np.iinfo(np.int64).min, np.iinfo(np.int64).max, -1, 0]]))
    u64 = jnp.asarray(np.concatenate([
        rng.integers(0, 1 << 63, n - 2),
        [0, (1 << 64) - 1]]).astype(np.uint64))
    f64 = jnp.asarray(rng.normal(size=n))
    monkeypatch.setenv("ARROW_TPU_SORT_PLANES", "on")
    got = sort_with_payload([keys], [i64, f64, u64])
    monkeypatch.setenv("ARROW_TPU_SORT_PLANES", "off")
    want = sort_with_payload([keys], [i64, f64, u64])
    for g, w in zip(got, want):
        assert g.dtype == w.dtype
        assert np.array_equal(np.asarray(g), np.asarray(w))


def test_group_ids_sort_path_appearance_order(monkeypatch):
    """The scatter-free grouper (use_sort_paths) must produce identical
    appearance-ordered ids/reps to the direct path — including null
    keys, padding rows, and duplicate-heavy groups."""
    import jax
    import numpy as np
    import pyarrow as pa
    import arrow_tpu as at

    rng = np.random.default_rng(17)
    n = 5000
    k = rng.integers(0, 37, n)
    mask = rng.random(n) < 0.15
    vals = rng.normal(size=n)
    t = pa.table({"k": pa.array(np.ma.masked_array(k, mask)),
                  "k2": rng.integers(0, 5, n), "v": vals})
    from arrow_tpu.table import RecordBatchReader

    def run():
        ours = RecordBatchReader.from_stream(t).read_all()
        g = ours.group_by(["k", "k2"], use_threads=False).aggregate(
            [("v", "sum"), ("v", "count")])
        return pa.table(g).to_pandas()

    base = run()
    monkeypatch.setenv("ARROW_TPU_MOVEMENT", "sort")
    jax.clear_caches()
    sorted_mode = run()
    monkeypatch.delenv("ARROW_TPU_MOVEMENT")
    jax.clear_caches()
    import pandas.testing as pdt
    # appearance order must match EXACTLY (no re-sorting before compare)
    pdt.assert_frame_equal(base, sorted_mode, check_dtype=False)
    ref = t.group_by(["k", "k2"], use_threads=False).aggregate(
        [("v", "sum"), ("v", "count")]).to_pandas()
    # content parity vs pyarrow (sorted: appearance order of the
    # engine's chunked grouping differs from pyarrow's single-pass
    # order — pre-existing, covered by test_acero's parity suite)
    a = base[ref.columns].sort_values(["k", "k2"],
                                      na_position="last").reset_index(
        drop=True)
    b = ref.sort_values(["k", "k2"], na_position="last").reset_index(
        drop=True)
    pdt.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)
