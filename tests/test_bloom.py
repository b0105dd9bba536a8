"""Bloom filter + hash-join pushdown (reference: acero/bloom_filter.h,
hash_join_node.cc:505 BloomFilterPushdownContext)."""
import os
import random

import jax.numpy as jnp
import pytest

import arrow_tpu as at
from arrow_tpu import acero
from arrow_tpu.compute import bloom as B
from arrow_tpu.device.column import upload_table


def _join(lt, rt, jt, keys, bloom_mode):
    os.environ["ARROW_TPU_BLOOM"] = bloom_mode
    try:
        decl = acero.Declaration("hashjoin", acero.HashJoinNodeOptions(
            join_type=jt, left_keys=keys, right_keys=keys),
            inputs=[acero.Declaration("table_source", acero.TableSourceNodeOptions(lt)),
                    acero.Declaration("table_source", acero.TableSourceNodeOptions(rt))])
        return decl.to_table()
    finally:
        os.environ["ARROW_TPU_BLOOM"] = "never"


def _canon(t):
    cols = t.to_pydict()
    names = list(cols)
    rows = list(zip(*(cols[n] for n in names))) if names else []
    return sorted(rows, key=repr)


@pytest.fixture(autouse=True)
def _reset_bloom_env():
    yield
    os.environ.pop("ARROW_TPU_BLOOM", None)


def test_bloom_no_false_negatives():
    rng = random.Random(7)
    build_vals = [rng.randrange(10**9) for _ in range(500)]
    probe_vals = build_vals[:250] + [rng.randrange(10**9) + 10**10
                                     for _ in range(750)]
    bt = upload_table(at.table({"k": build_vals}))
    pt = upload_table(at.table({"k": probe_vals}))
    lb = B.log_bits_for(bt.capacity)
    bf = B.build_bloom([bt.column("k")], bt.row_mask(), lb)
    hit = B.bloom_query(bf, [pt.column("k")], pt.row_mask())
    hits = [bool(h) for h in hit[:1000]]
    build_set = set(build_vals)
    for v, h in zip(probe_vals, hits):
        if v in build_set:
            assert h, f"false negative for {v}"
    # filter should reject most true negatives
    neg = [h for v, h in zip(probe_vals, hits) if v not in build_set]
    assert sum(neg) < len(neg) * 0.1


def test_bloom_padding_rows_rejected():
    bt = upload_table(at.table({"k": [1, 2, 3]}))
    pt = upload_table(at.table({"k": [1, 99]}))
    bf = B.build_bloom([bt.column("k")], bt.row_mask(),
                       B.log_bits_for(bt.capacity))
    hit = B.bloom_query(bf, [pt.column("k")], pt.row_mask())
    assert not bool(jnp.any(hit[int(pt.row_count):]))


@pytest.mark.parametrize("jt", ["inner", "left semi", "right semi",
                                "right outer"])
def test_pushdown_join_types_exact(jt):
    rng = random.Random(11)
    lk = [rng.randrange(40) if rng.random() > 0.1 else None
          for _ in range(400)]
    rk = [rng.randrange(60) if rng.random() > 0.1 else None
          for _ in range(50)]
    lt = at.table({"k": lk, "lv": list(range(400))})
    rt = at.table({"k": rk, "rv": [i * 10 for i in range(50)]})
    base = _canon(_join(lt, rt, jt, ["k"], "never"))
    pushed = _canon(_join(lt, rt, jt, ["k"], "always"))
    assert base == pushed


def test_pushdown_string_and_multicolumn_keys():
    lt = at.table({"a": ["x", "y", "z", "x", None, "w"] * 30,
                   "b": [1, 2, 3, 1, 5, 6] * 30,
                   "lv": list(range(180))})
    rt = at.table({"a": ["x", "z", "q"], "b": [1, 3, 9], "rv": [7, 8, 9]})
    base = _canon(_join(lt, rt, "inner", ["a", "b"], "never"))
    pushed = _canon(_join(lt, rt, "inner", ["a", "b"], "always"))
    assert base == pushed


def test_unsafe_join_types_skip_pushdown():
    # left outer/anti must keep unmatched probe rows — results identical
    # regardless of the env toggle because pushdown is not applied
    lt = at.table({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    rt = at.table({"k": [2], "rv": [5]})
    for jt in ("left outer", "left anti", "full outer"):
        base = _canon(_join(lt, rt, jt, ["k"], "never"))
        pushed = _canon(_join(lt, rt, jt, ["k"], "always"))
        assert base == pushed, jt


def test_disable_bloom_filter_option():
    lt = at.table({"k": list(range(100))})
    rt = at.table({"k": [5, 6]})
    os.environ["ARROW_TPU_BLOOM"] = "always"
    try:
        decl = acero.Declaration("hashjoin", acero.HashJoinNodeOptions(
            join_type="inner", left_keys=["k"], right_keys=["k"],
            disable_bloom_filter=True),
            inputs=[acero.Declaration("table_source", acero.TableSourceNodeOptions(lt)),
                    acero.Declaration("table_source", acero.TableSourceNodeOptions(rt))])
        out = decl.to_table()
    finally:
        os.environ.pop("ARROW_TPU_BLOOM", None)
    assert sorted(out.column("k").to_pylist()) == [5, 6]
