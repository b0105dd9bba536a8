"""Pallas grouped-sum kernel (experimental/pallas_agg.py, quarantined
— see experimental/__init__.py PARITY note) in interpreter
mode: the float-float f64 decode + compensated accumulation must match
numpy's f64 sums to ~2^-48 relative across value regimes. Interpret-mode
compiles cost ~2 min each, so all regimes share ONE kernel invocation
(groups = regimes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from arrow_tpu.experimental.pallas_agg import grouped_sum_pallas


def test_f64_all_regimes_one_call():
    rng = np.random.default_rng(0)
    per = 2000
    regimes = [
        rng.uniform(1.0, 100000.0, per),           # 0: TPC-H price scale
        rng.normal(size=per),                      # 1: signed, cancel-y
        rng.uniform(-1e-3, 1e-3, per),             # 2: small magnitudes
        rng.uniform(1e6, 1e9, per),                # 3: large magnitudes
        np.concatenate([np.zeros(per - 3),
                        [1e-40, -1e-40, 5e-324]]),  # 4: zeros + denormals
        np.concatenate([rng.normal(size=per - 1), [np.inf]]),   # 5: inf
        np.concatenate([rng.normal(size=per - 1), [np.nan]]),   # 6: nan
        -rng.uniform(1.0, 100.0, per),             # 7: all negative
    ]
    v = np.concatenate(regimes)
    g = np.repeat(np.arange(8, dtype=np.int32), per)
    # interleave rows so groups mix within blocks
    perm = rng.permutation(v.shape[0])
    v, g = v[perm], g[perm]
    ref = np.zeros(8)
    np.add.at(ref, g, v)
    out = np.asarray(grouped_sum_pallas(jnp.asarray(v), jnp.asarray(g),
                                        8, interpret=True, block_rows=8))
    for s in (0, 1, 2, 3, 7):
        np.testing.assert_allclose(out[s], ref[s], rtol=1e-10,
                                   err_msg=f"group {s}")
    np.testing.assert_allclose(out[4], ref[4], atol=1e-30)
    assert np.isinf(out[5])
    assert np.isnan(out[6])


def test_f32_accuracy_one_call():
    rng = np.random.default_rng(2)
    n = 4_000
    v = rng.uniform(0, 1000, n).astype(np.float32)
    g = rng.integers(0, 16, n).astype(np.int32)
    ref = np.zeros(16)
    np.add.at(ref, g, v.astype(np.float64))
    out = np.asarray(grouped_sum_pallas(jnp.asarray(v), jnp.asarray(g),
                                        16, interpret=True, block_rows=8))
    np.testing.assert_allclose(out.astype(np.float64), ref, rtol=1e-5)


def test_too_many_groups_raises():
    with pytest.raises(ValueError):
        grouped_sum_pallas(jnp.zeros(10), jnp.zeros(10, jnp.int32), 129,
                           interpret=True, block_rows=8)
