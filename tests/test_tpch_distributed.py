"""Full TPC-H suite under to_table(distributed=True) on the 8-device
mesh (round-2 verdict item 4 done-criterion): every query must produce
results identical to single-device execution. Plans whose shapes the
distributed layer does not cover fall back internally — the contract
tested here is RESULT EQUALITY through the public API either way,
with the exchange paths exercised directly wherever the shape allows
(joins: all_to_all hash repartition; sorts: range exchange; aggregate
spines: shard_map SPMD)."""

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu.io import tpch, tpch_queries as q

SF = 0.005


@pytest.fixture(scope="module")
def t():
    return tpch.generate(SF)


def _builders(t):
    return {
        "q1": lambda: q.q1_plan(t["lineitem"]),
        "q2": lambda: q.q2_plan(t["part"], t["supplier"], t["partsupp"],
                                t["nation"], t["region"]),
        "q3": lambda: q.q3_plan(t["customer"], t["orders"],
                                t["lineitem"]),
        "q4": lambda: q.q4_plan(t["orders"], t["lineitem"]),
        "q5": lambda: q.q5_plan(t["customer"], t["orders"],
                                t["lineitem"], t["supplier"],
                                t["nation"], t["region"]),
        "q6": lambda: q.q6_plan(t["lineitem"]),
        "q7": lambda: q.q7_plan(t["supplier"], t["lineitem"],
                                t["orders"], t["customer"], t["nation"]),
        "q8": lambda: q.q8_plan(t["part"], t["supplier"], t["lineitem"],
                                t["orders"], t["customer"], t["nation"],
                                t["region"]),
        "q9": lambda: q.q9_style_plan(t["part"], t["supplier"],
                                      t["lineitem"], t["partsupp"],
                                      t["orders"], t["nation"]),
        "q10": lambda: q.q10_style_plan(t["customer"], t["orders"],
                                        t["lineitem"]),
        "q11": lambda: q.q11_plan(t["partsupp"], t["supplier"],
                                  t["nation"]),
        "q12": lambda: q.q12_style_plan(t["orders"], t["lineitem"]),
        "q13": lambda: q.q13_plan(t["customer"], t["orders"]),
        "q14": lambda: q.q14_plan(t["lineitem"], t["part"]),
        "q15": lambda: q.q15_plan(t["lineitem"], t["supplier"]),
        "q16": lambda: q.q16_plan(t["partsupp"], t["part"],
                                  t["supplier"]),
        "q17": lambda: q.q17_plan(t["lineitem"], t["part"]),
        "q18": lambda: q.q18_plan(t["customer"], t["orders"],
                                  t["lineitem"], quantity=25.0),
        "q19": lambda: q.q19_plan(t["lineitem"], t["part"]),
        "q20": lambda: q.q20_plan(t["supplier"], t["nation"],
                                  t["partsupp"], t["part"],
                                  t["lineitem"]),
        "q21": lambda: q.q21_plan(t["supplier"], t["lineitem"],
                                  t["orders"], t["nation"]),
        "q22": lambda: q.q22_plan(t["customer"], t["orders"]),
    }


def _assert_equal(dist: at.Table, local: at.Table, name: str):
    assert dist.column_names == local.column_names, name
    assert dist.num_rows == local.num_rows, name
    dd, dl = dist.to_pydict(), local.to_pydict()
    for col in dist.column_names:
        a, b = dd[col], dl[col]
        if any(isinstance(v, float) for v in a if v is not None):
            assert [v is None for v in a] == [v is None for v in b], \
                (name, col)
            fa = np.array([0.0 if v is None else v for v in a])
            fb = np.array([0.0 if v is None else v for v in b])
            np.testing.assert_allclose(fa, fb, rtol=1e-9, atol=1e-12,
                                       err_msg=f"{name}.{col}")
        else:
            assert a == b, (name, col)


# Exchange-coverage expectations (round-4 verdict item 6): which
# queries MUST exercise a real mesh exchange (join all_to_all, sort
# range exchange, or the shard_map SPMD aggregate spine) so an internal
# fallback can't silently absorb a regression. Queries whose outermost
# plan shape is not linearizable (correlated/self-join rewrites built
# from intermediate tables) run their SUB-plans distributed instead and
# are exempt from the outer-plan assertion.
_EXCHANGE_EXPECTED = {
    "q1": {"spmd_aggregate"},
    "q3": {"join_exchange"}, "q4": {"join_exchange"},
    "q5": {"join_exchange"}, "q6": {"spmd_aggregate"},
    "q7": {"join_exchange"}, "q8": {"join_exchange"},
    "q9": {"join_exchange"}, "q10": {"join_exchange"},
    "q12": {"join_exchange"}, "q13": {"join_exchange"},
    "q14": {"join_exchange"},
    # q17's build side (part filtered by brand+container) is EMPTY at
    # this SF, so the degenerate-input fallback is legitimate; the
    # shape is covered by q14/q19
    "q18": {"spmd_aggregate"},  # HAVING aggregate first, joins post
    "q19": {"join_exchange"},
}

_seen_counts = {}


@pytest.mark.parametrize("qname", [f"q{i}" for i in range(1, 23)])
def test_distributed_matches_local(qname, t):
    from arrow_tpu.acero import dist_exec
    plan = _builders(t)[qname]()
    local = plan.to_table()
    dist_exec.reset_exchange_counts()
    dist = plan.to_table(distributed=True)
    _seen_counts[qname] = dict(dist_exec.EXCHANGE_COUNTS)
    expected = _EXCHANGE_EXPECTED.get(qname)
    if expected:
        for kind in expected:
            assert dist_exec.EXCHANGE_COUNTS[kind] >= 1, (
                f"{qname}: expected {kind} exchange, got "
                f"{dist_exec.EXCHANGE_COUNTS}")
    _assert_equal(dist, local, qname)
