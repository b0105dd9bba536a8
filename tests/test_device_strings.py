"""Device byte-pool string tier (compute/device_strings.py) vs the host
per-distinct-value tier — the two must agree exactly on every eligible
predicate (reference: compute/kernels/scalar_string_ascii.cc behaviors,
pinned here differentially like the reference's string kernel tests)."""

import random
import string as _string

import numpy as np
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc


def _col(values):
    return at.chunked_array([at.array(values, at.string())])


def _mixed_values(n, seed, unicode_frac=0.0, null_frac=0.1):
    rng = random.Random(seed)
    out = []
    alphabet = _string.ascii_letters + _string.digits + " _%."
    for i in range(n):
        r = rng.random()
        if r < null_frac:
            out.append(None)
        elif r < null_frac + unicode_frac:
            out.append("café" + str(i) + "é中")
        else:
            k = rng.randrange(0, 14)
            out.append("".join(rng.choice(alphabet) for _ in range(k)))
    # ensure distinctness stress: append an index suffix to half
    out = [v if (v is None or i % 2) else v + f"#{i}"
           for i, v in enumerate(out)]
    return out


PREDICATES = [
    ("match_substring", {"pattern": "a%"}),
    ("match_substring", {"pattern": ""}),
    ("match_substring", {"pattern": "zzzzzzzzzzzzzzzzzzzz"}),
    ("starts_with", {"pattern": "ab"}),
    ("starts_with", {"pattern": ""}),
    # patterns longer than the pool width L (ADVICE r3: broadcast
    # TypeError instead of all-False)
    ("starts_with", {"pattern": "z" * 200}),
    ("ends_with", {"pattern": "z" * 200}),
    ("match_substring", {"pattern": "z" * 200}),
    ("count_substring", {"pattern": "z" * 200}),
    ("find_substring", {"pattern": "z" * 200}),
    ("ends_with", {"pattern": "9"}),
    ("ends_with", {"pattern": ""}),
    ("count_substring", {"pattern": "a"}),
    ("count_substring", {"pattern": "ab"}),
    ("find_substring", {"pattern": "b"}),
    ("find_substring", {"pattern": "ab"}),
    ("utf8_length", {}),
    ("binary_length", {}),
    ("string_is_ascii", {}),
    ("match_like", {"pattern": "%ab%"}),
    ("match_like", {"pattern": "ab%"}),
    ("match_like", {"pattern": "%ab"}),
    ("match_like", {"pattern": "ab"}),
    ("match_like", {"pattern": "a_b%"}),  # not simple: host path both ways
]


def _run(name, col, opts):
    return getattr(pc, name)(col, **opts).to_pylist()


class TestDeviceStringTier:
    @pytest.mark.parametrize("name,opts", PREDICATES)
    def test_matches_host_tier_ascii(self, name, opts, monkeypatch):
        vals = _mixed_values(300, seed=hash(name) & 0xffff)
        col = _col(vals)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "off")
        host = _run(name, col, opts)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "on")
        dev = _run(name, col, opts)
        assert dev == host

    @pytest.mark.parametrize("name,opts", PREDICATES)
    def test_matches_host_tier_unicode(self, name, opts, monkeypatch):
        """Non-ASCII data: byte-positional kernels must either agree or
        decline (find_substring declines; others operate on bytes which
        is still correct for containment/affix of ASCII patterns)."""
        vals = _mixed_values(200, seed=1 + (hash(name) & 0xffff),
                             unicode_frac=0.3)
        col = _col(vals)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "off")
        host = _run(name, col, opts)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "on")
        dev = _run(name, col, opts)
        assert dev == host

    @pytest.mark.parametrize("ic", [False, True])
    def test_ignore_case(self, ic, monkeypatch):
        vals = ["Apple", "aPPle sauce", "GRAPE", None, "apple", "",
                "xAPPLEx", "ap"]
        col = _col(vals)
        for name in ("match_substring", "starts_with", "ends_with",
                     "count_substring", "find_substring"):
            monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "off")
            host = _run(name, col, {"pattern": "APple",
                                    "ignore_case": ic})
            monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "on")
            dev = _run(name, col, {"pattern": "APple",
                                   "ignore_case": ic})
            assert dev == host, name

    def test_count_non_overlapping(self, monkeypatch):
        """str.count semantics: 'aaaa'.count('aa') == 2, not 3."""
        vals = ["aaaa", "aaa", "abababa", "aa", "a", "", None, "aabaa"]
        col = _col(vals)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "on")
        got = pc.count_substring(col, pattern="aa").to_pylist()
        want = [v.count("aa") if v is not None else None for v in vals]
        assert got == want
        got2 = pc.count_substring(col, pattern="aba").to_pylist()
        want2 = [v.count("aba") if v is not None else None for v in vals]
        assert got2 == want2

    def test_pool_is_cached_on_dictionary(self, monkeypatch):
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "on")
        from arrow_tpu.compute.device_strings import dictionary_pool
        from arrow_tpu.device.column import upload_column
        arr = at.array(["x" * i for i in range(10)], at.string())
        dc = upload_column(arr)
        p1 = dictionary_pool(dc.dictionary)
        p2 = dictionary_pool(dc.dictionary)
        assert p1 is not None and p1 is p2
        assert p1.mat.shape[0] == len(dc.dictionary)

    def test_large_dictionary_auto_gate(self, monkeypatch):
        """Default auto mode engages the pool at >= 4096 distinct
        values and stays host below it; results identical either way."""
        monkeypatch.delenv("ARROW_TPU_DEVICE_STRINGS", raising=False)
        from arrow_tpu.compute.device_strings import dictionary_pool
        from arrow_tpu.device.column import upload_column
        small = upload_column(at.array(["s%d" % i for i in range(64)],
                                       at.string()))
        bigvals = ["s%d" % i for i in range(5000)]
        big = upload_column(at.array(bigvals, at.string()))
        assert dictionary_pool(small.dictionary) is None
        assert dictionary_pool(big.dictionary) is not None
        got = pc.starts_with(_col(bigvals), pattern="s4").to_pylist()
        assert got == [v.startswith("s4") for v in bigvals]


TRANSFORMS = [
    ("utf8_upper", {}),
    ("utf8_lower", {}),
    ("utf8_swapcase", {}),
    ("utf8_capitalize", {}),
    ("utf8_title", {}),
    ("utf8_reverse", {}),
    ("utf8_trim_whitespace", {}),
    ("utf8_ltrim_whitespace", {}),
    ("utf8_rtrim_whitespace", {}),
    ("utf8_trim", {"characters": "ab "}),
    ("utf8_trim", {"characters": ""}),   # str.strip("") strips nothing
    ("utf8_ltrim", {"characters": "x#"}),
    ("utf8_rtrim", {"characters": "0123456789"}),
    ("utf8_lpad", {"width": 8, "padding": "*"}),
    ("utf8_rpad", {"width": 8, "padding": "-"}),
    ("utf8_center", {"width": 9, "padding": "="}),
    ("utf8_lpad", {"width": 200, "padding": "*"}),  # widens the pool
    ("utf8_slice_codeunits", {"start": 2}),
    ("utf8_slice_codeunits", {"start": 1, "stop": 5}),
    ("utf8_slice_codeunits", {"start": 0, "stop": 0}),
    ("utf8_slice_codeunits", {"start": 2, "stop": 4, "step": 2}),  # host
]


def _ws_values(n, seed):
    """ASCII values with leading/trailing whitespace + case variety so
    trim/case transforms change something and dedupe (many-to-one)."""
    rng = random.Random(seed)
    pads = ["", " ", "  ", "\t", "\n", " \t "]
    out = []
    for i in range(n):
        r = rng.random()
        if r < 0.08:
            out.append(None)
        else:
            body = "".join(rng.choice(_string.ascii_letters + "  _%.")
                           for _ in range(rng.randrange(0, 12)))
            out.append(rng.choice(pads) + body + rng.choice(pads))
    # force collisions after case-fold: both cases of the same body
    out += ["Abc def", "ABC DEF", "abc dEF", "\x1c mixed\x1f ", ""]
    return out


class TestDeviceStringTransforms:
    @pytest.mark.parametrize("name,opts", TRANSFORMS)
    def test_matches_host_tier(self, name, opts, monkeypatch):
        vals = _ws_values(300, seed=hash(name + str(opts)) & 0xffff)
        col = _col(vals)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "off")
        host = _run(name, col, opts)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "on")
        dev = _run(name, col, opts)
        assert dev == host

    @pytest.mark.parametrize("name,opts", TRANSFORMS)
    def test_unicode_falls_back_identically(self, name, opts,
                                            monkeypatch):
        vals = _mixed_values(150, seed=3, unicode_frac=0.3)
        col = _col(vals)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "off")
        host = _run(name, col, opts)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "on")
        dev = _run(name, col, opts)
        assert dev == host

    def test_transform_used_device_path(self, monkeypatch):
        """The ASCII value set must actually exercise pool_transform
        (guard against a silent always-fallback)."""
        from arrow_tpu.compute import device_strings as ds
        calls = []
        orig = ds.pool_transform

        def spy(name, col, options=None):
            r = orig(name, col, options)
            calls.append((name, r is not None))
            return r
        monkeypatch.setattr(ds, "pool_transform", spy)
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "on")
        col = _col(_ws_values(200, seed=9))
        pc.utf8_upper(col)
        pc.utf8_trim_whitespace(col)
        pc.utf8_slice_codeunits(col, start=1, stop=4)
        assert calls and all(hit for _, hit in calls), calls

    def test_transform_dedupes_codes_for_group_keys(self, monkeypatch):
        """Case-folding is many-to-one: the new dictionary must be
        canonical (one slot per value) so grouping on codes is exact."""
        monkeypatch.setenv("ARROW_TPU_DEVICE_STRINGS", "on")
        col = _col(["Aa", "AA", "aa", "aA", "bb", None] * 40)
        up = pc.utf8_upper(col)
        assert up.to_pylist() == (["AA"] * 4 + ["BB", None]) * 40
        distinct = pc.unique(up).to_pylist()
        assert sorted(v for v in distinct if v is not None) == \
            ["AA", "BB"]
