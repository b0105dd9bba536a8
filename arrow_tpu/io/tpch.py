"""TPC-H table generator (reference analogue: acero/tpch_node.cc).

Vectorized numpy generation of the TPC-H schema at a given scale factor.
Distributions follow the spec shapes (uniform ranges, date windows,
category sets); text columns are generated as dictionary arrays since the
engine dictionary-encodes strings at upload anyway. Both engines under
differential test consume the SAME generated tables, so benchmark
comparisons are apples-to-apples.
"""

from __future__ import annotations

import numpy as np

from .. import types as T
from ..array.array import Array
from ..array.data import ArrayData
from ..buffer import Buffer
from ..table import Table

_EPOCH_1992 = 8035   # days from 1970-01-01 to 1992-01-01
_EPOCH_1998 = 10561  # ... to 1998-12-01

RETURNFLAGS = ["R", "A", "N"]
LINESTATUS = ["O", "F"]
SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
SHIPINSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE",
                "TAKE BACK RETURN"]
ORDERPRIORITY = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                 "5-LOW"]
ORDERSTATUS = ["F", "O", "P"]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
               "HOUSEHOLD"]
PART_TYPES = [f"{a} {b} {c}" for a in
              ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
              for b in ["ANODIZED", "BURNISHED", "PLATED", "POLISHED",
                        "BRUSHED"]
              for c in ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]]
NATIONS = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
           "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ",
           "JAPAN", "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU",
           "CHINA", "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA",
           "UNITED KINGDOM", "UNITED STATES"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATION_REGION = [0, 1, 1, 1, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4, 0, 0, 0, 1, 2,
                 3, 4, 2, 3, 3, 1]
MANUFACTURERS = [f"Manufacturer#{i}" for i in range(1, 6)]
BRANDS = [f"Brand#{m}{n}" for m in range(1, 6) for n in range(1, 6)]
CONTAINERS = [f"{a} {b}" for a in ["SM", "LG", "MED", "JUMBO", "WRAP"]
              for b in ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN",
                        "DRUM"]]
# dbgen-style part-name word pool (Q20 filters p_name LIKE 'forest%')
P_NAME_WORDS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black",
    "blanched", "blue", "blush", "brown", "burlywood", "burnished",
    "chartreuse", "chiffon", "chocolate", "coral", "cornflower", "cornsilk",
    "cream", "cyan", "dark", "deep", "dim", "dodger", "drab", "firebrick",
    "floral", "forest", "frosted", "gainsboro", "ghost", "goldenrod",
    "green", "grey", "honeydew", "hot", "hrose", "indian", "ivory",
]
# comment word salad; a fraction of orders comments embed the Q13 pattern
# 'special ... requests' and supplier comments the Q16 'Customer ...
# Complaints' pattern, mirroring dbgen's text grammar hooks.
_COMMENT_WORDS = [
    "carefully", "quickly", "furiously", "slyly", "blithely", "ironic",
    "final", "pending", "regular", "express", "bold", "silent", "even",
    "unusual", "packages", "deposits", "foxes", "accounts", "theodolites",
    "instructions", "dependencies", "platelets", "requests", "asymptotes",
]


def _dict_col(rng, choices, n, dtype=np.int32) -> Array:
    codes = rng.integers(0, len(choices), n).astype(dtype)
    from ..array.array import array as make_array
    dict_arr = make_array(choices, T.string())
    data = ArrayData(T.dictionary(T.int32(), T.string()), n,
                     [None, Buffer(codes.astype(np.int32))],
                     null_count=0, dictionary=dict_arr.data)
    return Array(data)


def _f64(v) -> Array:
    from ..array.array import array as make_array
    return make_array(np.asarray(v, dtype=np.float64))


def _i64(v) -> Array:
    from ..array.array import array as make_array
    return make_array(np.asarray(v, dtype=np.int64))


def _date(v) -> Array:
    return Array(ArrayData(T.date32(), len(v),
                           [None, Buffer(np.asarray(v, dtype=np.int32))],
                           null_count=0))


def _str_col(values) -> Array:
    from ..array.array import array as make_array
    return make_array(list(values), T.string())


def _comment_pool(rng, pool_size: int, special: str | None = None,
                  special_frac: float = 0.05) -> list:
    """Pool of word-salad comments; `special_frac` of them embed the
    two-word `special` pattern with a filler word between (the shape the
    TPC-H LIKE '%a%b%' predicates probe)."""
    pool = []
    for i in range(pool_size):
        words = list(rng.choice(_COMMENT_WORDS, 6))
        if special is not None and rng.random() < special_frac:
            a, b = special.split()
            words[2:4] = [a, str(rng.choice(_COMMENT_WORDS)), b]
        pool.append(" ".join(words))
    return pool


def _name_col(prefix: str, keys) -> Array:
    return _str_col(np.char.mod(prefix + "#%09d",
                                np.asarray(keys, dtype=np.int64)))


def _phone_col(rng, nationkeys) -> Array:
    nk = np.asarray(nationkeys, dtype=np.int64)
    n = len(nk)
    parts = (np.char.mod("%d", nk + 10), np.char.mod("%03d", rng.integers(100, 1000, n)),
             np.char.mod("%03d", rng.integers(100, 1000, n)),
             np.char.mod("%04d", rng.integers(1000, 10_000, n)))
    out = parts[0]
    for p in parts[1:]:
        out = np.char.add(np.char.add(out, "-"), p)
    return _str_col(out)


def lineitem_table(scale_factor: float = 1.0, seed: int = 0) -> Table:
    n = int(6_001_215 * scale_factor)
    rng = np.random.default_rng(seed)
    n_orders = max(int(1_500_000 * scale_factor), 1)
    orderkey = rng.integers(1, n_orders + 1, n)
    shipdate = (_EPOCH_1992
                + rng.integers(0, _EPOCH_1998 - _EPOCH_1992, n))
    quantity = rng.integers(1, 51, n).astype(np.float64)
    extendedprice = np.round(rng.uniform(900.0, 105_000.0, n), 2)
    discount = np.round(rng.integers(0, 11, n) * 0.01, 2)
    tax = np.round(rng.integers(0, 9, n) * 0.01, 2)
    cols = {
        "l_orderkey": _i64(orderkey),
        "l_partkey": _i64(rng.integers(1, max(int(200_000 * scale_factor),
                                              2), n)),
        "l_suppkey": _i64(rng.integers(1, max(int(10_000 * scale_factor),
                                              2), n)),
        "l_linenumber": _i64(rng.integers(1, 8, n)),
        "l_quantity": _f64(quantity),
        "l_extendedprice": _f64(extendedprice),
        "l_discount": _f64(discount),
        "l_tax": _f64(tax),
        "l_returnflag": _dict_col(rng, RETURNFLAGS, n),
        "l_linestatus": _dict_col(rng, LINESTATUS, n),
        "l_shipdate": _date(shipdate),
        "l_commitdate": _date(shipdate + rng.integers(-30, 30, n)),
        "l_receiptdate": _date(shipdate + rng.integers(1, 31, n)),
        "l_shipinstruct": _dict_col(rng, SHIPINSTRUCT, n),
        "l_shipmode": _dict_col(rng, SHIPMODES, n),
    }
    return Table.from_pydict(cols)


def orders_table(scale_factor: float = 1.0, seed: int = 1) -> Table:
    n = max(int(1_500_000 * scale_factor), 1)
    rng = np.random.default_rng(seed)
    n_cust = max(int(150_000 * scale_factor), 2)
    cols = {
        "o_orderkey": _i64(np.arange(1, n + 1)),
        "o_custkey": _i64(rng.integers(1, n_cust, n)),
        "o_orderstatus": _dict_col(rng, ORDERSTATUS, n),
        "o_totalprice": _f64(np.round(rng.uniform(850.0, 560_000.0, n), 2)),
        "o_orderdate": _date(_EPOCH_1992 + rng.integers(
            0, _EPOCH_1998 - _EPOCH_1992 - 151, n)),
        "o_orderpriority": _dict_col(rng, ORDERPRIORITY, n),
        "o_clerk": _dict_col(
            rng, list(np.char.mod("Clerk#%09d",
                                  np.arange(1, max(int(n / 1000), 2)))), n),
        "o_shippriority": _i64(np.zeros(n, dtype=np.int64)),
        "o_comment": _dict_col(
            rng, _comment_pool(rng, 256, special="special requests"), n),
    }
    return Table.from_pydict(cols)


def customer_table(scale_factor: float = 1.0, seed: int = 2) -> Table:
    n = max(int(150_000 * scale_factor), 2)
    rng = np.random.default_rng(seed)
    nationkey = rng.integers(0, 25, n)
    cols = {
        "c_custkey": _i64(np.arange(1, n + 1)),
        "c_name": _name_col("Customer", np.arange(1, n + 1)),
        "c_nationkey": _i64(nationkey),
        "c_phone": _phone_col(rng, nationkey),
        "c_mktsegment": _dict_col(rng, MKTSEGMENTS, n),
        "c_acctbal": _f64(np.round(rng.uniform(-999.99, 9999.99, n), 2)),
        "c_comment": _dict_col(rng, _comment_pool(rng, 256), n),
    }
    return Table.from_pydict(cols)


def part_table(scale_factor: float = 1.0, seed: int = 3) -> Table:
    n = max(int(200_000 * scale_factor), 2)
    rng = np.random.default_rng(seed)
    mfgr = rng.integers(1, 6, n)
    brand = mfgr * 10 + rng.integers(1, 6, n)
    w = np.asarray(P_NAME_WORDS)
    name = w[rng.integers(0, len(w), n)]
    for _ in range(4):
        name = np.char.add(np.char.add(name, " "),
                           w[rng.integers(0, len(w), n)])
    cols = {
        "p_partkey": _i64(np.arange(1, n + 1)),
        "p_name": _str_col(name),
        "p_mfgr": _dict_col(rng, MANUFACTURERS, n),
        "p_type": _dict_col(rng, PART_TYPES, n),
        "p_size": _i64(rng.integers(1, 51, n)),
        "p_container": _dict_col(rng, CONTAINERS, n),
        "p_retailprice": _f64(np.round(rng.uniform(900.0, 2000.0, n), 2)),
    }
    # keep p_brand consistent with p_mfgr's dict codes
    mf_codes = cols["p_mfgr"].data.buffers[1].view(np.int32)[:n] + 1
    brand = mf_codes * 10 + rng.integers(1, 6, n)
    from ..array.array import array as make_array
    bdict = make_array([f"Brand#{b}" for b in range(11, 56)], T.string())
    bcodes = (brand - 11).astype(np.int32)
    cols["p_brand"] = Array(ArrayData(
        T.dictionary(T.int32(), T.string()), n,
        [None, Buffer(bcodes)], null_count=0, dictionary=bdict.data))
    return Table.from_pydict(cols)


def supplier_table(scale_factor: float = 1.0, seed: int = 4) -> Table:
    n = max(int(10_000 * scale_factor), 2)
    rng = np.random.default_rng(seed)
    nationkey = rng.integers(0, 25, n)
    cols = {
        "s_suppkey": _i64(np.arange(1, n + 1)),
        "s_name": _name_col("Supplier", np.arange(1, n + 1)),
        "s_address": _str_col(np.char.mod("addr-%x",
                                          rng.integers(0, 1 << 40, n))),
        "s_nationkey": _i64(nationkey),
        "s_phone": _phone_col(rng, nationkey),
        "s_acctbal": _f64(np.round(rng.uniform(-999.99, 9999.99, n), 2)),
        "s_comment": _dict_col(
            rng, _comment_pool(rng, 256, special="Customer Complaints"), n),
    }
    return Table.from_pydict(cols)


def partsupp_table(scale_factor: float = 1.0, seed: int = 5) -> Table:
    n = max(int(800_000 * scale_factor), 2)
    rng = np.random.default_rng(seed)
    cols = {
        "ps_partkey": _i64(rng.integers(1, max(int(200_000 * scale_factor),
                                               2), n)),
        "ps_suppkey": _i64(rng.integers(1, max(int(10_000 * scale_factor),
                                               2), n)),
        "ps_supplycost": _f64(np.round(rng.uniform(1.0, 1000.0, n), 2)),
        "ps_availqty": _i64(rng.integers(1, 10_000, n)),
    }
    return Table.from_pydict(cols)


def nation_table() -> Table:
    from ..array.array import array as make_array
    return Table.from_pydict({
        "n_nationkey": _i64(np.arange(25)),
        "n_name": make_array(NATIONS, T.string()),
        "n_regionkey": _i64(np.asarray(NATION_REGION)),
    })


def region_table() -> Table:
    from ..array.array import array as make_array
    return Table.from_pydict({
        "r_regionkey": _i64(np.arange(5)),
        "r_name": make_array(REGIONS, T.string()),
    })


def generate(scale_factor: float = 1.0):
    """All eight TPC-H tables as a dict."""
    return {
        "lineitem": lineitem_table(scale_factor),
        "orders": orders_table(scale_factor),
        "customer": customer_table(scale_factor),
        "part": part_table(scale_factor),
        "supplier": supplier_table(scale_factor),
        "partsupp": partsupp_table(scale_factor),
        "nation": nation_table(),
        "region": region_table(),
    }
