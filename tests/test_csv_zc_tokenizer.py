"""Zero-copy QUOTED tokenizer (native csv_parse_zc): quoted fields are
stripped by offset arithmetic with no pool copy; any field needing byte
rewriting (doubled quote, escape char, trailing bytes after a closing
quote) must bail to the copying tokenizer. Differential vs Python
csv.reader semantics through the public read_csv."""

import csv as pycsv
import io

import pytest

import arrow_tpu as at
from arrow_tpu.io import csv as acsv
from arrow_tpu.native import csv_parse, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


def _fields(block):
    out = []
    fid = 0
    for rc in block.row_counts.tolist():
        out.append([block.field_bytes(fid + k).decode()
                    for k in range(rc)])
        fid += rc
    return out


CASES = [
    # (data, expect_zero_copy)
    ('a,b,c\n1,"x",3\n', True),
    ('"q","r"\n"1","2"\n', True),
    ('"",""\n"a",""\n', True),                      # empty quoted fields
    ('"multi\nline",2\n"b",3\n', True),             # newline inside quotes
    ('"a""b",2\n', False),                          # doubled quote -> copy
    ('plain,unquoted\n1,2\n', True),
    ('"a"x,2\n', False),                            # bytes after close
    ('"unterminated,2', True),                      # EOF inside quotes
    ('a,b\r\n"1","2"\r\n', True),                   # CRLF
    ('\n\n"a",1\n', True),                          # empty lines
    ('"последний","ряд"\n', True),                  # non-ASCII bytes
]


@pytest.mark.parametrize("data,expect_zc", CASES)
def test_zc_matches_python_csv(data, expect_zc):
    block = csv_parse(data.encode(), ",", '"', True, None)
    assert block is not None
    got = _fields(block)
    want = [row for row in pycsv.reader(io.StringIO(data))]
    assert got == want, data
    assert (block.id_scale == 2) == expect_zc, data


def test_zc_read_csv_end_to_end():
    rows = ["i,s,f"]
    for i in range(5000):
        rows.append(f'{i},"name-{i % 97}",{i / 7.0}')
    rows.append('9999,"has ""quote"" inside",1.5')  # forces copy path
    data = ("\n".join(rows) + "\n").encode()
    t = acsv.read_csv(io.BytesIO(data))
    assert t.num_rows == 5001
    assert t.column("i").to_pylist()[:3] == [0, 1, 2]
    assert t.column("s").to_pylist()[-1] == 'has "quote" inside'
    got = t.column("s").to_pylist()[:97]
    assert got == [f"name-{i}" for i in range(97)]


def test_zc_quoted_flags_ride_through():
    """pyarrow-default semantics (strings_can_be_null=False): empty
    tokens in a STRING column stay "" whether quoted or not; the zc
    tokenizer's per-field quoted flags must survive the zero-copy path
    so null matching stays identical to the copying path."""
    data = b'a,b\n"",\nx,y\n'
    t = acsv.read_csv(io.BytesIO(data))
    assert t.column("a").to_pylist() == ["", "x"]
    assert t.column("b").to_pylist() == ["", "y"]
    block = csv_parse(data[4:], ",", '"', True, None)
    assert block.id_scale == 2
    assert block.quoted.tolist() == [1, 0, 0, 0]


def test_parallel_chunk_merge_matches_single(monkeypatch):
    """csv_parse_parallel with a forced low threshold: zero-copy chunk
    rebase and mixed-form merges must equal the single-block parse."""
    monkeypatch.setenv("ARROW_TPU_CSV_PARALLEL_MIN", "1024")
    import numpy as np

    from arrow_tpu.native import csv_parse_parallel
    rows = ["h1,h2,h3"]
    for i in range(3000):
        if i % 17 == 0:
            rows.append(f'{i},"q{i}",')
        elif i % 29 == 0:
            rows.append(f'{i},"has ""dq"" here",{i * 2}')  # copy chunk
        else:
            rows.append(f"{i},plain{i},{i * 2}")
    data = ("\n".join(rows) + "\n").encode()
    par = csv_parse_parallel(data, ",", '"', True, None)
    single = csv_parse(data, ",", '"', True, None)
    assert par is not None and single is not None
    assert par.row_counts.tolist() == single.row_counts.tolist()
    nf = len(single.quoted)
    assert len(par.quoted) == nf
    for fid in range(nf):
        assert par.field_bytes(fid) == single.field_bytes(fid), fid
