"""Pallas movement kernels vs the XLA sort-based reference paths.

Interpret-mode on the CPU test mesh (the kernels' compiled lowering is
chip-probed separately — chip_session scripts); correctness contract is
identical to compute/move.py's compact_by_mask / segment_reduce."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from arrow_tpu.compute import move  # noqa: E402
from arrow_tpu.compute.pallas_move import (  # noqa: E402
    compact_arrays_pallas, compact_planes_pallas, grouped_sum_pallas)


@pytest.mark.parametrize("n,density", [(1000, 0.5), (65536, 0.1),
                                       (100_001, 0.9), (32768, 0.0),
                                       (4096, 1.0)])
def test_compact_planes_stable_exact(n, density):
    rng = np.random.default_rng(n)
    keep = jnp.asarray(rng.random(n) < density)
    p1 = jnp.asarray(rng.integers(-(1 << 31), 1 << 31, n,
                                  dtype=np.int32))
    p2 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    outs = compact_planes_pallas(keep, [p1, p2], interpret=True)
    k = np.asarray(keep)
    cnt = int(k.sum())
    assert np.array_equal(np.asarray(outs[0])[:cnt], np.asarray(p1)[k])
    assert np.array_equal(np.asarray(outs[1])[:cnt], np.asarray(p2)[k])


def test_compact_arrays_all_dtypes():
    rng = np.random.default_rng(7)
    n = 50_000
    keep = jnp.asarray(rng.random(n) < 0.35)
    cols = [
        jnp.asarray(rng.integers(-(1 << 62), 1 << 62, n)),          # i64
        jnp.asarray(rng.integers(0, 1 << 63, n).astype(np.uint64)),  # u64
        jnp.asarray(rng.normal(size=n)),                             # f64
        jnp.asarray(rng.normal(size=n).astype(np.float32)),          # f32
        jnp.asarray(rng.integers(0, 2, n).astype(bool)),             # bool
        jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32)),    # i32
    ]
    # specials in the f64 column
    f64 = np.asarray(cols[2]).copy()
    f64[0], f64[1], f64[2], f64[3] = np.inf, -np.inf, np.nan, -0.0
    cols[2] = jnp.asarray(f64)
    outs = compact_arrays_pallas(keep, cols, interpret=True)
    k = np.asarray(keep)
    cnt = int(k.sum())
    for a, o in zip(cols, outs):
        exp = np.asarray(a)[k]
        got = np.asarray(o)[:cnt]
        assert o.dtype == a.dtype
        if np.issubdtype(exp.dtype, np.floating):
            np.testing.assert_array_equal(
                np.isnan(exp), np.isnan(got))
            m = ~np.isnan(exp)
            np.testing.assert_array_equal(exp[m], got[m])
            # signed zero preserved
            np.testing.assert_array_equal(np.signbit(exp[m]),
                                          np.signbit(got[m]))
        else:
            np.testing.assert_array_equal(exp, got)


def test_compact_matches_move_compact_by_mask(monkeypatch):
    rng = np.random.default_rng(3)
    n = 40_000
    keep = jnp.asarray(rng.random(n) < 0.6)
    arrays = [jnp.asarray(rng.normal(size=n)),
              jnp.asarray(rng.integers(0, 1 << 40, n))]
    monkeypatch.setenv("ARROW_TPU_MOVEMENT", "sort")
    ref_outs, ref_cnt = move.compact_by_mask(keep, arrays)
    monkeypatch.setenv("ARROW_TPU_MOVEMENT", "pallas")
    got_outs, got_cnt = move.compact_by_mask(keep, arrays)
    assert int(ref_cnt) == int(got_cnt)
    c = int(ref_cnt)
    for r, g in zip(ref_outs, got_outs):
        np.testing.assert_array_equal(np.asarray(r)[:c],
                                      np.asarray(g)[:c])


@pytest.mark.parametrize("segments", [8, 100, 512, 1024])
def test_grouped_sum_pallas(segments):
    rng = np.random.default_rng(segments)
    n = 70_000
    v = jnp.asarray(rng.normal(size=n))
    g = jnp.asarray(rng.integers(0, segments, n, dtype=np.int32))
    got = np.asarray(grouped_sum_pallas(v, g, segments, interpret=True))
    exp = np.zeros(segments)
    np.add.at(exp, np.asarray(g), np.asarray(v))
    np.testing.assert_allclose(got, exp, rtol=1e-10, atol=1e-10)


def test_grouped_sum_f32():
    rng = np.random.default_rng(1)
    n = 30_000
    v = jnp.asarray(rng.normal(size=n).astype(np.float32))
    g = jnp.asarray(rng.integers(0, 64, n, dtype=np.int32))
    got = np.asarray(grouped_sum_pallas(v, g, 64, interpret=True))
    exp = np.zeros(64)
    np.add.at(exp, np.asarray(g), np.asarray(v, dtype=np.float64))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_grouped_sum_rejects_oversize():
    v = jnp.zeros(10)
    g = jnp.zeros(10, jnp.int32)
    with pytest.raises(ValueError):
        grouped_sum_pallas(v, g, 4096, interpret=True)


class TestMeasuredGating:
    """Auto-selection of Pallas movement rides ONLY on banked chip A/B
    evidence (platform_check.pallas_measured)."""

    def _fake_cache(self, monkeypatch, measured):
        from arrow_tpu import platform_check as pc
        fake = {"key": "k", "kind": "tpu",
                "pallas": {"ok": True},
                "measured": measured}
        monkeypatch.setattr(pc, "cached_probe", lambda: fake)

    def test_pallas_measured_reads_cache(self, monkeypatch):
        from arrow_tpu import platform_check as pc
        self._fake_cache(monkeypatch, {"compact": True,
                                       "group_sum": False})
        assert pc.pallas_measured("compact")
        assert not pc.pallas_measured("group_sum")

    def test_no_cache_means_no_pallas(self, monkeypatch):
        from arrow_tpu import platform_check as pc
        monkeypatch.setattr(pc, "cached_probe", lambda: None)
        assert not pc.pallas_measured("compact")

    def test_movement_mode_auto_uses_evidence(self, monkeypatch):
        import jax
        from arrow_tpu import platform_check as pc
        from arrow_tpu.compute import move
        monkeypatch.delenv("ARROW_TPU_MOVEMENT", raising=False)
        self._fake_cache(monkeypatch, {"compact": True})
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert move.movement_mode() == "pallas"
        self._fake_cache(monkeypatch, {"compact": False})
        assert move.movement_mode() == "sort"

    def test_segment_reduce_routes_to_pallas(self, monkeypatch):
        """With group_sum evidence banked, segment_reduce produces the
        same result through the Pallas kernel (interpreter mode)."""
        import jax.numpy as jnp
        import numpy as np
        from arrow_tpu import platform_check as pc
        from arrow_tpu.compute import move, pallas_move
        self._fake_cache(monkeypatch, {"group_sum": True})
        monkeypatch.setenv("ARROW_TPU_MOVEMENT", "sort")
        called = {}
        real = pallas_move.grouped_sum_pallas

        def spy(values, gids, num_segments, **kw):
            called["yes"] = True
            return real(values, gids, num_segments, interpret=True)
        monkeypatch.setattr(pallas_move, "grouped_sum_pallas", spy)
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=4096))
        # >_SMALL_SEGMENT_LOOP segments: below that the fused masked
        # reduce is kept (pallas_call is a fusion barrier)
        g = jnp.asarray(rng.integers(0, 128, 4096).astype(np.int32))
        out = move.segment_reduce(v, g, 128, "sum", 0.0)
        assert called.get("yes")
        expect = np.zeros(128)
        np.add.at(expect, np.asarray(g), np.asarray(v))
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-9)
