"""CSV reader/writer.

Reference analogue: cpp/src/arrow/csv/ (chunked reader: chunker -> parser ->
column builders -> converters, csv/reader.h:40). Host-side implementation:
parsing via the C-accelerated stdlib csv module, conversion vectorized with
numpy, type inference matching the reference's resolution order
(csv/inference_internal.h): null -> int64 -> float64 -> bool -> timestamp ->
date -> string.
"""

from __future__ import annotations

import csv as _csv
import datetime
import io
from typing import Dict, List, Optional, Union

import numpy as np

from .. import types as T
from ..array.array import Array, array as make_array
from ..table import RecordBatch, Table
from ..types import DataType

DEFAULT_NULL_VALUES = ["", "#N/A", "#N/A N/A", "#NA", "-1.#IND",
                       "-1.#QNAN", "-NaN", "-nan", "1.#IND", "1.#QNAN",
                       "N/A", "NA", "NULL", "NaN", "n/a", "nan", "null"]
DEFAULT_TRUE = ["1", "True", "TRUE", "true"]
DEFAULT_FALSE = ["0", "False", "FALSE", "false"]


class _OptionsBase:
    """equals/validate surface shared by the options classes
    (pyarrow _csv.pyx options semantics)."""

    def equals(self, other) -> bool:
        return (type(self) is type(other) and
                self.__dict__ == other.__dict__)

    def validate(self) -> None:
        return None
class ReadOptions(_OptionsBase):
    def __init__(self, use_threads: bool = True, block_size: int = 1 << 20,
                 skip_rows: int = 0, column_names: Optional[List[str]] = None,
                 autogenerate_column_names: bool = False,
                 encoding: str = "utf8", skip_rows_after_names: int = 0):
        self.use_threads = use_threads
        self.block_size = block_size
        self.skip_rows = skip_rows
        self.column_names = column_names
        self.autogenerate_column_names = autogenerate_column_names
        self.encoding = encoding
        self.skip_rows_after_names = skip_rows_after_names


class ParseOptions(_OptionsBase):
    def __init__(self, delimiter: str = ",", quote_char: str = '"',
                 double_quote: bool = True, escape_char=False,
                 newlines_in_values: bool = False,
                 ignore_empty_lines: bool = True,
                 invalid_row_handler=None):
        self.delimiter = delimiter
        self.quote_char = quote_char
        self.double_quote = double_quote
        self.escape_char = escape_char
        self.newlines_in_values = newlines_in_values
        self.ignore_empty_lines = ignore_empty_lines
        self.invalid_row_handler = invalid_row_handler


class ConvertOptions(_OptionsBase):
    def __init__(self, check_utf8: bool = True,
                 column_types: Optional[Dict[str, DataType]] = None,
                 null_values: Optional[List[str]] = None,
                 true_values: Optional[List[str]] = None,
                 false_values: Optional[List[str]] = None,
                 strings_can_be_null: bool = False,
                 include_columns: Optional[List[str]] = None,
                 include_missing_columns: bool = False,
                 auto_dict_encode: bool = False,
                 auto_dict_max_cardinality: int = 50,
                 decimal_point: str = ".",
                 default_column_type=None,
                 quoted_strings_can_be_null: bool = True,
                 timestamp_parsers=None):
        self.check_utf8 = check_utf8
        self.column_types = column_types or {}
        self.null_values = (null_values if null_values is not None
                            else list(DEFAULT_NULL_VALUES))
        self.true_values = true_values or list(DEFAULT_TRUE)
        self.false_values = false_values or list(DEFAULT_FALSE)
        self.strings_can_be_null = strings_can_be_null
        self.include_columns = include_columns
        self.include_missing_columns = include_missing_columns
        self.auto_dict_encode = auto_dict_encode
        self.auto_dict_max_cardinality = auto_dict_max_cardinality
        self.decimal_point = decimal_point
        self.default_column_type = default_column_type
        self.quoted_strings_can_be_null = quoted_strings_can_be_null
        self.timestamp_parsers = timestamp_parsers


class WriteOptions(_OptionsBase):
    def __init__(self, include_header: bool = True,
                 batch_size: int = 1024, delimiter: str = ",",
                 quoting_style: str = "needed",
                 quoting_header: str = "needed"):
        self.include_header = include_header
        self.batch_size = batch_size
        self.delimiter = delimiter
        self.quoting_style = quoting_style
        self.quoting_header = quoting_header


def _open_text(source, encoding):
    if isinstance(source, (str,)):
        return open(source, "r", encoding=encoding, newline="")
    if isinstance(source, bytes):
        return io.StringIO(source.decode(encoding))
    if hasattr(source, "read"):
        data = source.read()
        if isinstance(data, bytes):
            data = data.decode(encoding)
        return io.StringIO(data)
    raise TypeError(f"cannot read CSV from {type(source)}")


_INT_RE_TYPES = (T.int64(),)


def _try_int64(vals: np.ndarray, nulls: np.ndarray):
    try:
        out = np.where(nulls, "0", vals).astype(np.int64)
        return out
    except ValueError:
        return None


def _try_float64(vals: np.ndarray, nulls: np.ndarray):
    try:
        out = np.where(nulls, "0", vals).astype(np.float64)
        return out
    except ValueError:
        return None


def _convert_column(strs: List[Optional[str]], opts: ConvertOptions,
                    explicit: Optional[DataType]) -> Array:
    n = len(strs)
    null_set = set(opts.null_values)
    raw = np.array([s if s is not None else "" for s in strs], dtype=object)
    nulls = np.array([(s is None) or (s in null_set) for s in strs],
                     dtype=np.bool_)

    def with_nulls(values, t):
        return make_array([None if m else v
                           for m, v in zip(nulls, values)], t)

    if explicit is not None:
        t = explicit
        if t.id == T.TypeId.STRING:
            can_null = opts.strings_can_be_null
            return make_array([None if (s is None or (can_null and
                                                      s in null_set))
                               else s for s in strs], t)
        if t.id == T.TypeId.BOOL:
            tv, fv = set(opts.true_values), set(opts.false_values)
            return with_nulls([v in tv for v in raw], t)
        if t.is_integer or t.is_floating:
            dt = t.to_numpy_dtype()
            sv = raw.astype(str)
            if t.is_floating and opts.decimal_point != ".":
                sv = np.char.replace(sv, opts.decimal_point, ".")
            vals = np.where(nulls, "0", sv).astype(dt)
            return with_nulls(vals.tolist(), t)
        if t.id == T.TypeId.DATE32:
            return with_nulls([_parse_date(v) if not m else None
                               for v, m in zip(raw, nulls)], t)
        if t.id == T.TypeId.TIMESTAMP:
            return with_nulls([_parse_ts(v, opts.timestamp_parsers)
                               if not m else None
                               for v, m in zip(raw, nulls)], t)
        raise NotImplementedError(f"CSV conversion to {t!r}")

    if opts.default_column_type is not None:
        return _convert_column(strs, _replace_default(opts),
                               opts.default_column_type)

    # inference (reference order)
    if nulls.all():
        return make_array([None] * n, T.null())
    svals = raw.astype(str)
    if opts.decimal_point != ".":
        svals = np.char.replace(svals, opts.decimal_point, ".")
    out = _try_int64(svals, nulls)
    if out is not None:
        return with_nulls(out.tolist(), T.int64())
    out = _try_float64(svals, nulls)
    if out is not None:
        return with_nulls(out.tolist(), T.float64())
    tv, fv = set(DEFAULT_TRUE), set(DEFAULT_FALSE)
    if all(nulls[i] or svals[i] in tv or svals[i] in fv for i in range(n)):
        return with_nulls([v in tv for v in svals], T.bool_())
    try:
        return with_nulls([_parse_date(v) if not m else None
                           for v, m in zip(svals, nulls)], T.date32())
    except Exception:
        pass
    try:
        return with_nulls([_parse_ts(v) if not m else None
                           for v, m in zip(svals, nulls)], T.timestamp("s"))
    except Exception:
        pass
    can_null = opts.strings_can_be_null
    out = make_array([None if (s is None or (can_null and s in null_set))
                      else s for s in strs], T.string())
    if opts.auto_dict_encode:
        distinct = {s for s in strs if s is not None}
        if len(distinct) <= opts.auto_dict_max_cardinality:
            return out.dictionary_encode()
    return out


def _replace_default(opts: ConvertOptions) -> ConvertOptions:
    import copy
    o = copy.copy(opts)
    o.default_column_type = None
    return o


def _micros_to_unit(us: np.ndarray, unit: str) -> np.ndarray:
    """Epoch microseconds -> the timestamp unit, floor semantics
    (matching _temporal_to_int's `us // scale`)."""
    if unit == "ns":
        # int64 ns saturates at ~year 2262: the python fallback raises
        # OverflowError on such values, so the native path must too
        # rather than silently wrapping.
        lim = np.iinfo(np.int64).max // 1000
        if us.size and (us.max() > lim or us.min() < -lim):
            raise OverflowError(
                "timestamp out of range for nanosecond unit")
        return us * 1000
    scale = {"s": 1_000_000, "ms": 1000, "us": 1}[unit]
    return us // scale if scale != 1 else us


def _parse_date(v):
    return datetime.date.fromisoformat(v)


def _parse_ts(v, parsers=None):
    if parsers:
        for fmt in parsers:
            if fmt == ISO8601:
                try:
                    return datetime.datetime.fromisoformat(v)
                except ValueError:
                    continue
            try:
                return datetime.datetime.strptime(v, fmt)
            except ValueError:
                continue
        raise ValueError(f"no timestamp parser matched {v!r}")
    return datetime.datetime.fromisoformat(v)


def _read_source_bytes(source, encoding) -> Optional[bytes]:
    """Whole-file bytes for the native tokenizer; None when the source
    can only be consumed as text."""
    enc = encoding.lower().replace("-", "").replace("_", "")
    data = None
    if isinstance(source, str):
        with open(source, "rb") as f:
            data = f.read()
    elif isinstance(source, bytes):
        data = source
    elif hasattr(source, "read"):
        data = source.read()
        if isinstance(data, str):
            data = data.encode("utf8")
            enc = "utf8"
    if data is None:
        return None
    if enc in ("utf8", "ascii", "usascii"):
        return data
    try:
        return data.decode(encoding).encode("utf8")
    except (UnicodeDecodeError, LookupError):
        return None


def _single_ascii(c) -> bool:
    return isinstance(c, str) and len(c) == 1 and ord(c) < 128


def _row_field_strings(block, row_start: int, count: int) -> List[str]:
    return [block.field_bytes(row_start + j).decode("utf8")
            for j in range(count)]


def _gathered_str_list(block, ids, nulls) -> List[Optional[str]]:
    """Materialize python strings (None at nulls) for fallback
    conversions (dates/timestamps/exotic explicit types)."""
    from ..native import csv_gather_bytes
    offs, data = csv_gather_bytes(block, ids, skip=nulls)
    raw = bytes(data)
    return [None if nulls[i] else raw[offs[i]:offs[i + 1]].decode("utf8")
            for i in range(len(ids))]


def _native_convert_column(block, ids, missing, co: ConvertOptions,
                           explicit: Optional[DataType]):
    """Convert one tokenized column (csv/converter.cc analogue). ids are
    field ids per row; missing marks rows too short to have this column.
    Returns an Array, or None to fall back to the python path."""
    from .. import native as nat
    from ..array.array import Array
    from ..array.construct import _make_validity
    from ..array.data import ArrayData
    from ..buffer import Buffer
    from ..utils import bits as bitutil

    n = len(ids)

    def match_nulls(sub_ids):
        """null-token mask over sub_ids (converter.cc IsNull)."""
        m = nat.csv_match_tokens(block, sub_ids, co.null_values)
        if m is None:
            return None
        m = m.astype(np.bool_)
        if not co.quoted_strings_can_be_null:
            m &= block.quoted[sub_ids] == 0
        return m

    valid = None   # set before prim/boolean run

    def prim(t, values, validity=None):
        dt = t.to_numpy_dtype()
        if values.dtype != dt:
            values = values.astype(dt)
        v = valid if validity is None else validity
        return Array(ArrayData(t, n, [_make_validity(v),
                                      Buffer(values)]))

    def boolean(values):
        return Array(ArrayData(
            T.bool_(), n,
            [_make_validity(valid),
             Buffer(bitutil.pack_bits(values & valid))]))

    def string(t, str_nulls):
        offs, data = nat.csv_gather_bytes(block, ids, skip=str_nulls)
        if offs[-1] > np.iinfo(np.int32).max:
            return None
        return Array(ArrayData(
            t, n, [_make_validity(~str_nulls), Buffer(offs.astype(np.int32)),
                   Buffer(data)]))

    if explicit is not None:
        nm = match_nulls(ids)
        if nm is None:
            return None
        nulls = nm | missing
        valid = ~nulls
        t = explicit
        if t.id == T.TypeId.NA:
            if not nulls.all():
                raise ValueError("CSV conversion to null: non-null value")
            return make_array([None] * n, T.null())
        if t.id == T.TypeId.STRING:
            str_nulls = (nulls if co.strings_can_be_null else missing.copy())
            return string(t, str_nulls)
        if t.id == T.TypeId.BOOL:
            tv = nat.csv_match_tokens(block, ids, co.true_values)
            return boolean(tv.astype(np.bool_))
        if t.is_integer:
            r = nat.csv_parse_int64(block, ids, nulls)
            if r is None:
                raise ValueError(
                    f"CSV conversion to {t!r} failed")
            return prim(t, r[0])
        if t.is_floating:
            r = nat.csv_parse_float64(block, ids, nulls)
            if r is None:
                raise ValueError(
                    f"CSV conversion to {t!r} failed")
            return prim(t, r[0])
        if t.id == T.TypeId.DATE32:
            d = nat.csv_parse_date32(block, ids, nulls)
            if d is not None:
                return prim(t, d)
            strs = _gathered_str_list(block, ids, nulls)
            return _convert_column(strs, co, t)
        if t.id == T.TypeId.TIMESTAMP and not co.timestamp_parsers:
            us = nat.csv_parse_ts_micros(block, ids, nulls)
            if us is not None:
                return prim(t, _micros_to_unit(us, t.unit))
            strs = _gathered_str_list(block, ids, nulls)
            return _convert_column(strs, co, t)
        if t.id == T.TypeId.TIMESTAMP:
            strs = _gathered_str_list(block, ids, nulls)
            return _convert_column(strs, co, t)
        if t.id == T.TypeId.DICTIONARY and \
                t.value_type.id == T.TypeId.STRING:
            str_nulls = (nulls if co.strings_can_be_null
                         else missing.copy())
            s = string(t.value_type, str_nulls)
            return None if s is None else s.dictionary_encode()
        raise NotImplementedError(f"CSV conversion to {t!r}")

    if co.default_column_type is not None:
        return _native_convert_column(block, ids, missing,
                                      _replace_default(co),
                                      co.default_column_type)

    # inference (reference resolution order, csv/inference_internal.h),
    # parse-first: numeric candidates are probed on a short prefix, then
    # parsed WITHOUT a null-token prescan — parse failures are resolved
    # against null tokens afterwards (usually a tiny subset), so a clean
    # numeric column costs exactly one pass and a string column five
    # 64-token probes instead of five full scans.
    live = np.flatnonzero(~missing)
    if len(live) == 0:
        return make_array([None] * n, T.null())
    pb_ids = ids[live[:64]]
    pb_m = match_nulls(pb_ids)
    if pb_m is None:
        return None
    pb_skip = pb_m.astype(np.uint8)
    nulls = valid = None
    if pb_m.all():
        nm = match_nulls(ids)
        nulls, valid = nm | missing, ~(nm | missing)
        if nulls.all():
            return make_array([None] * n, T.null())
    miss8 = missing.astype(np.uint8)

    def parse_first(parse, t):
        if parse(block, pb_ids, pb_skip) is None:
            return None
        vals, ok, fails = parse(block, ids, miss8, strict=False)
        okb = ok.astype(np.bool_)
        if fails:
            bad = np.flatnonzero(~okb & ~missing)
            bm = match_nulls(ids[bad])
            if bm is None or not bm.all():
                return None          # genuine failure -> not this type
        validity = okb & ~missing
        if t.id == T.TypeId.DOUBLE:
            # a parseable null token ("nan"/"NaN") must stay null
            nan_idx = np.flatnonzero(np.isnan(vals) & validity)
            if len(nan_idx):
                nanm = match_nulls(ids[nan_idx])
                if nanm is not None and nanm.any():
                    validity[nan_idx[nanm]] = False
        return prim(t, vals, validity)

    out = parse_first(nat.csv_parse_int64, T.int64())
    if out is not None:
        return out
    out = parse_first(nat.csv_parse_float64, T.float64())
    if out is not None:
        return out
    # non-numeric candidates need the full null mask
    if nulls is None:
        nm = match_nulls(ids)
        if nm is None:
            return None
        nulls, valid = nm | missing, ~(nm | missing)
        if nulls.all():
            return make_array([None] * n, T.null())
    pb_live = pb_ids[~pb_m]
    pb_zeros = np.zeros(len(pb_live), dtype=np.uint8)
    bv = (nat.csv_parse_bool(block, ids, nulls, DEFAULT_TRUE,
                             DEFAULT_FALSE)
          if nat.csv_parse_bool(block, pb_live, pb_zeros, DEFAULT_TRUE,
                                DEFAULT_FALSE) is not None else None)
    if bv is not None:
        return boolean(bv.astype(np.bool_))
    # date/timestamp: native bulk ISO parse first (value_parsing.h
    # ParseTimestampISO8601 analogue); a native abort falls through to
    # the python probe so exotic-but-valid ISO forms keep inferring.

    def full_if(parse):
        return (parse(block, ids, nulls)
                if parse(block, pb_live, pb_zeros) is not None else None)

    d = full_if(nat.csv_parse_date32)
    if d is not None:
        return prim(T.date32(), d)
    us = full_if(nat.csv_parse_ts_micros)
    if us is not None:
        return prim(T.timestamp("s"), _micros_to_unit(us, "s"))
    # probe the first non-null value before paying the python-loop
    # conversion
    first = int(np.argmax(valid))
    probe = block.field_bytes(int(ids[first])).decode("utf8", "replace")
    for parser, t in ((_parse_date, T.date32()),
                      (_parse_ts, T.timestamp("s"))):
        try:
            parser(probe)
        except Exception:
            continue
        try:
            strs = _gathered_str_list(block, ids, nulls)
            return _convert_column(strs, co, t)
        except Exception:
            continue
    str_nulls = (nulls if co.strings_can_be_null else missing.copy())
    out = string(T.string(), str_nulls)
    if out is not None and co.auto_dict_encode:
        enc = out.dictionary_encode()
        if len(enc.dictionary) <= co.auto_dict_max_cardinality:
            return enc
    return out


def _tokenize_and_layout(source, ro: ReadOptions, po: ParseOptions,
                         co: ConvertOptions):
    """Tokenize the whole source and resolve header + row selection.
    Returns (block, names, rc_d, starts_d) — data-row field counts and
    field-id starts after header/skip/empty/invalid handling — or None
    when the options force the python path."""
    from .. import native as nat
    if nat.get_lib() is None:
        return None
    if not _single_ascii(po.delimiter):
        return None
    qc = po.quote_char if po.quote_char not in (False, None) else None
    if qc is not None and not _single_ascii(qc):
        return None
    esc = po.escape_char if isinstance(po.escape_char, str) else None
    if esc is not None and not _single_ascii(esc):
        return None
    if co.decimal_point != ".":
        return None
    data = _read_source_bytes(source, ro.encoding)
    if data is None:
        return None
    if ro.use_threads and not po.newlines_in_values:
        block = nat.csv_parse_parallel(data, po.delimiter, qc,
                                       po.double_quote, esc)
    else:
        block = nat.csv_parse(data, po.delimiter, qc, po.double_quote, esc)
    if block is None:
        return None

    rc = block.row_counts
    row_starts = np.zeros(len(rc), np.int64)
    if len(rc) > 1:
        np.cumsum(rc[:-1], out=row_starts[1:])
    pos = ro.skip_rows
    if ro.column_names is not None:
        names = list(ro.column_names)
    elif ro.autogenerate_column_names:
        if pos >= len(rc):
            return block, [], rc[:0], row_starts[:0]
        names = [f"f{i}" for i in range(int(rc[pos]))]
    else:
        if pos >= len(rc):
            return block, [], rc[:0], row_starts[:0]
        names = _row_field_strings(block, int(row_starts[pos]),
                                   int(rc[pos]))
        pos += 1
    pos += ro.skip_rows_after_names
    pos = min(pos, len(rc))

    rc_d = rc[pos:]
    starts_d = row_starts[pos:]
    sel = np.ones(len(rc_d), np.bool_)
    if po.ignore_empty_lines:
        sel &= rc_d != 0
    ncols = len(names)
    if po.invalid_row_handler is not None:
        bad = np.nonzero(sel & (rc_d != ncols))[0]
        for i in bad:
            row_text = ",".join(_row_field_strings(
                block, int(starts_d[i]), int(rc_d[i])))
            decision = po.invalid_row_handler(InvalidRow(
                ncols, int(rc_d[i]), int(i), row_text))
            if decision == "skip":
                sel[i] = False
            elif decision == "error":
                from ..errors import ArrowInvalid
                raise ArrowInvalid(
                    f"CSV row {int(i)}: expected {ncols} columns, "
                    f"got {int(rc_d[i])}")
    return block, names, rc_d[sel], starts_d[sel]


def _convert_rows_native(block, names, rc_d, starts_d, ro, co,
                         column_types) -> Optional[Table]:
    """Convert a row range to a Table; None -> fall back."""
    from .. import native as nat
    # one sequential transpose pass -> per-column contiguous span blocks
    # (native.cpp csv_transpose_columns); identity ids afterwards
    col_blocks = nat.csv_transpose_columns(block, starts_d, rc_d,
                                           len(names))
    ids_all = np.arange(len(rc_d), dtype=np.int64)
    jobs = []
    for j, name in enumerate(names):
        if co.include_columns is not None and \
                name not in co.include_columns:
            continue
        missing = rc_d <= j
        if col_blocks is not None:
            jobs.append((name, col_blocks[j], ids_all, missing))
        else:
            ids = np.where(missing, 0, starts_d + j)
            jobs.append((name, block, ids, missing))

    def convert(job):
        name, blk, ids, missing = job
        return _native_convert_column(blk, ids, missing, co,
                                      column_types.get(name))

    # the bulk work happens in ctypes calls that release the GIL, so
    # per-column threads give real parallelism (reference: csv/reader.h
    # use_threads -> parallel column conversion)
    # threads only pay off once the GIL-held numpy glue per column is
    # small relative to the GIL-released C scans (measured: a 22 MB /
    # 400k-row file runs 25% FASTER single-threaded)
    if ro.use_threads and len(jobs) > 1 and len(rc_d) > 2_000_000:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as ex:
            results = list(ex.map(convert, jobs))
    else:
        results = [convert(job) for job in jobs]

    arrays, out_names = [], []
    for (name, _, _, _), arr in zip(jobs, results):
        if arr is None:
            return None
        arrays.append(arr)
        out_names.append(name)
    if co.include_columns:
        order = [nm for nm in co.include_columns if nm in out_names]
        idx = [out_names.index(nm) for nm in order]
        arrays = [arrays[i] for i in idx]
        out_names = order
    return Table.from_arrays(arrays, out_names)


def _read_csv_native(source, ro: ReadOptions, po: ParseOptions,
                     co: ConvertOptions) -> Optional[Table]:
    """Native-tokenizer read path; None -> caller falls back to the
    python csv module."""
    layout = _tokenize_and_layout(source, ro, po, co)
    if layout is None:
        return None
    block, names, rc_d, starts_d = layout
    if not names:
        return Table.from_arrays([], [])
    return _convert_rows_native(block, names, rc_d, starts_d, ro, co,
                                co.column_types)


class _NativeStreamer:
    """Streaming blocks over one native-tokenized source: the first
    block infers types, later blocks convert with them locked in
    (csv/reader.h:65 StreamingReader semantics)."""

    def __init__(self, block, names, rc_d, starts_d, ro, co):
        self._block = block
        self._names = names
        self._rc = rc_d
        self._starts = starts_d
        self._ro = ro
        self._co = co
        n = len(rc_d)
        # per-row byte cost mirrors the python path's heuristic:
        # field bytes + one separator per field
        sc = block.id_scale
        first_off = starts_d * sc
        last_off = np.maximum((starts_d + rc_d) * sc - (sc - 1),
                              first_off)
        sizes = np.maximum(
            block.offsets[last_off] - block.offsets[first_off], 0) + rc_d
        cum = np.cumsum(sizes)
        cuts = [0]
        target = max(int(ro.block_size), 1)
        while cuts[-1] < n:
            base = int(cum[cuts[-1] - 1]) if cuts[-1] else 0
            nxt = int(np.searchsorted(cum, base + target, side="left")) + 1
            cuts.append(min(max(nxt, cuts[-1] + 1), n))
        self._cuts = cuts
        self._next = 1
        self._types = dict(co.column_types)
        self._first = self._convert(0) if n else None
        self.schema = (self._first.schema if self._first is not None
                       else T.Schema([]))
        if self._first is not None:
            self._types = {f.name: f.type for f in self._first.schema}

    def _convert(self, k):
        a, b = self._cuts[k], self._cuts[k + 1]
        table = _convert_rows_native(
            self._block, self._names, self._rc[a:b], self._starts[a:b],
            self._ro, self._co, self._types)
        if table is None:
            raise ValueError("CSV native block conversion failed")
        batches = table.to_batches()
        return batches[0] if batches else None

    def read_next_batch(self):
        if self._first is not None:
            out, self._first = self._first, None
            return out
        if self._next >= len(self._cuts) - 1:
            raise StopIteration
        k = self._next
        self._next += 1
        out = self._convert(k)
        if out is None:
            raise StopIteration
        return out


def _open_csv_native(source, ro, po, co) -> Optional["_NativeStreamer"]:
    layout = _tokenize_and_layout(source, ro, po, co)
    if layout is None:
        return None
    block, names, rc_d, starts_d = layout
    if not names:
        return None
    try:
        return _NativeStreamer(block, names, rc_d, starts_d, ro, co)
    except ValueError:
        return None


def _parallel_block_bytes() -> int:
    """Target block size for the parallel reader. 1 MB measured best on
    the 2-core host (median-of-9 at 28 MB/1M rows: 1 MB -> 130 ms vs
    4 MB -> 220 ms): finer blocks load-balance the two workers and keep
    per-block numpy buffers cache-resident; below ~512 KB the per-block
    glue overtakes. Reference tunes the same knob (csv/options.h
    block_size, 1 MB default there too)."""
    import os
    try:
        return int(os.environ.get("ARROW_TPU_CSV_BLOCK_BYTES",
                                  str(1 << 20)))
    except ValueError:
        return 1 << 20


def _read_csv_parallel(source, ro: ReadOptions, po: ParseOptions,
                       co: ConvertOptions) -> Optional[Table]:
    """Block-parallel read (reference: csv/reader.h:65 StreamingReader +
    parallel chunker): split the file at newline boundaries into ~4 MB
    blocks, tokenize+transpose+convert each block on its own thread
    (the native calls release the GIL), and return the per-block tables
    as ONE chunked table (no merge copies — pyarrow's reader returns
    chunked columns the same way). Per-block type inference is unified
    by promoting int64 -> float64 and null -> anything; any other
    disagreement falls back to the sequential whole-file path (which
    infers globally)."""
    from .. import native as nat
    if nat.get_lib() is None or not ro.use_threads:
        return None
    if po.newlines_in_values or po.invalid_row_handler is not None:
        return None
    if not _single_ascii(po.delimiter):
        return None
    qc = po.quote_char if po.quote_char not in (False, None) else None
    if (qc is not None and not _single_ascii(qc)) or \
            co.decimal_point != ".":
        return None
    esc = po.escape_char if isinstance(po.escape_char, str) else None
    if esc is not None and not _single_ascii(esc):
        return None
    data = _read_source_bytes(source, ro.encoding)
    blk = _parallel_block_bytes()
    if data is None or len(data) < 2 * blk:
        return None

    # --- resolve header rows on the raw bytes --------------------------
    def next_line(p):
        i = data.find(b"\n", p)
        return len(data) if i < 0 else i + 1

    pos = 0
    for _ in range(ro.skip_rows):
        pos = next_line(pos)

    def parse_one_line(p):
        eol = data.find(b"\n", p)
        line = data[p:(eol if eol >= 0 else len(data))]
        if line.endswith(b"\r"):
            line = line[:-1]
        import io as _io
        txt = line.decode("utf-8", "replace")
        r = _csv.reader(_io.StringIO(txt), delimiter=po.delimiter,
                        quotechar=(qc or '"'),
                        doublequote=po.double_quote,
                        escapechar=esc)
        return next(r, [])

    if ro.column_names is not None:
        names = list(ro.column_names)
    elif ro.autogenerate_column_names:
        names = [f"f{i}" for i in range(len(parse_one_line(pos)))]
    else:
        hdr = parse_one_line(pos)
        if b'"' in data[pos:data.find(b"\n", pos) + 1 or len(data)] \
                and qc is None:
            pass
        names = [str(v) for v in hdr]
        pos = next_line(pos)
    for _ in range(ro.skip_rows_after_names):
        pos = next_line(pos)
    if pos >= len(data) or not names:
        return None

    # --- split the body at newline boundaries --------------------------
    n = len(data)
    nchunks = max(1, min(32, (n - pos) // blk))
    if nchunks <= 1:
        return None
    bounds = [pos]
    for k in range(1, nchunks):
        target = pos + (n - pos) * k // nchunks
        cut = data.find(b"\n", max(target, bounds[-1]))
        if cut < 0:
            break
        if cut + 1 > bounds[-1]:
            bounds.append(cut + 1)
    bounds.append(n)
    views = [memoryview(data)[a:b] for a, b in zip(bounds, bounds[1:])
             if b > a]
    if len(views) <= 1:
        return None

    ro_blk = ReadOptions(use_threads=False, encoding=ro.encoding)

    def work(view):
        block = nat.csv_parse(view, po.delimiter, qc, po.double_quote,
                              esc)
        if block is None:
            return None
        rc = block.row_counts
        starts = np.zeros(len(rc), np.int64)
        if len(rc) > 1:
            np.cumsum(rc[:-1], out=starts[1:])
        sel = np.ones(len(rc), np.bool_)
        if po.ignore_empty_lines:
            sel &= rc != 0
        return _convert_rows_native(block, names, rc[sel], starts[sel],
                                    ro_blk, co, co.column_types)

    from concurrent.futures import ThreadPoolExecutor
    import os as _os
    with ThreadPoolExecutor(max_workers=min(len(views),
                                            _os.cpu_count() or 4)) as ex:
        tables = list(ex.map(work, views))
    if any(t is None for t in tables):
        return None

    # --- unify per-block inferred schemas ------------------------------
    from .. import types as _T
    out_names = tables[0].schema.names
    want = []
    for ci, nm in enumerate(out_names):
        ts = [t.schema.fields[ci].type for t in tables]
        tset = {repr(t) for t in ts}
        if len(tset) == 1:
            want.append(ts[0])
            continue
        non_null = [t for t in ts if t.id != _T.TypeId.NA]
        nn_set = {repr(t) for t in non_null}
        if len(nn_set) == 1:
            want.append(non_null[0])
        elif nn_set <= {repr(_T.int64()), repr(_T.float64())}:
            want.append(_T.float64())
        else:
            return None  # inference disagrees: sequential path decides
    casted = []
    for t in tables:
        cols, changed = [], False
        for ci, nm in enumerate(out_names):
            col = t.column(ci)
            if repr(t.schema.fields[ci].type) != repr(want[ci]):
                col = col.cast(want[ci])
                changed = True
            cols.append(col)
        casted.append(Table.from_arrays(cols, out_names)
                      if changed else t)
    from ..api import concat_tables
    return concat_tables(casted)


def read_csv(source, read_options: Optional[ReadOptions] = None,
             parse_options: Optional[ParseOptions] = None,
             convert_options: Optional[ConvertOptions] = None) -> Table:
    ro = read_options or ReadOptions()
    po = parse_options or ParseOptions()
    co = convert_options or ConvertOptions()

    # materialize byte streams once so an optimization path that
    # declines after peeking cannot leave the stream half-consumed for
    # the next path (text streams keep the legacy single-read flow)
    if hasattr(source, "read") and not isinstance(source, (str, bytes)):
        peek = source.read(0)
        if isinstance(peek, bytes):
            source = source.read()

    try:
        out = _read_csv_parallel(source, ro, po, co)
    except Exception:  # noqa: BLE001 - block path is an optimization
        out = None
    if out is not None:
        return out

    out = _read_csv_native(source, ro, po, co)
    if out is not None:
        return out

    f = _open_text(source, ro.encoding)
    reader = _csv.reader(
        f, delimiter=po.delimiter, quotechar=po.quote_char,
        doublequote=po.double_quote,
        escapechar=(po.escape_char if isinstance(po.escape_char, str)
                    else None))
    rows = iter(reader)
    for _ in range(ro.skip_rows):
        next(rows, None)

    if ro.column_names is not None:
        names = list(ro.column_names)
    elif ro.autogenerate_column_names:
        first = next(rows)
        names = [f"f{i}" for i in range(len(first))]
        rows = _chain_one(first, rows)
    else:
        names = next(rows)
    for _ in range(ro.skip_rows_after_names):
        next(rows, None)

    cols: List[List[Optional[str]]] = [[] for _ in names]
    for rownum, row in enumerate(rows):
        if not row and po.ignore_empty_lines:
            continue
        if len(row) != len(names) and po.invalid_row_handler is not None:
            decision = po.invalid_row_handler(InvalidRow(
                len(names), len(row), rownum, ",".join(row)))
            if decision == "skip":
                continue
            if decision == "error":
                from ..errors import ArrowInvalid
                raise ArrowInvalid(
                    f"CSV row {rownum}: expected {len(names)} columns, "
                    f"got {len(row)}")
        for i in range(len(names)):
            cols[i].append(row[i] if i < len(row) else None)

    arrays, out_names = [], []
    for name, col in zip(names, cols):
        if co.include_columns is not None and \
                name not in co.include_columns:
            continue
        arrays.append(_convert_column(col, co,
                                      co.column_types.get(name)))
        out_names.append(name)
    if co.include_columns:
        order = [n for n in co.include_columns if n in out_names]
        idx = [out_names.index(n) for n in order]
        arrays = [arrays[i] for i in idx]
        out_names = order
    return Table.from_arrays(arrays, out_names)


def _chain_one(first, rest):
    yield first
    yield from rest


ISO8601 = "ISO8601"


class InvalidRow:
    """Passed to ParseOptions.invalid_row_handler (csv/options.h
    InvalidRow): a row whose column count mismatches the header."""

    __slots__ = ("expected_columns", "actual_columns", "number", "text")

    def __init__(self, expected_columns, actual_columns, number, text):
        self.expected_columns = expected_columns
        self.actual_columns = actual_columns
        self.number = number
        self.text = text

    def __repr__(self):
        return (f"InvalidRow(expected={self.expected_columns}, "
                f"actual={self.actual_columns}, number={self.number})")


class CSVStreamingReader:
    """Block-wise streaming reader (reference: csv/reader.h:65
    StreamingReader). The first block infers the schema; later blocks
    convert with the locked-in column types. Blocks split at row
    boundaries (chunker.cc's newline-safe splitting falls out of
    reading whole rows)."""

    def __init__(self, source, read_options=None, parse_options=None,
                 convert_options=None):
        self._ro = read_options or ReadOptions()
        self._po = parse_options or ParseOptions()
        self._co = convert_options or ConvertOptions()
        self._native = None
        native = _open_csv_native(source, self._ro, self._po, self._co)
        if native is not None:
            self._native = native
            self.schema = native.schema
            return
        f = _open_text(source, self._ro.encoding)
        self._reader = _csv.reader(
            f, delimiter=self._po.delimiter,
            quotechar=self._po.quote_char,
            doublequote=self._po.double_quote,
            escapechar=(self._po.escape_char
                        if isinstance(self._po.escape_char, str)
                        else None))
        rows = iter(self._reader)
        for _ in range(self._ro.skip_rows):
            next(rows, None)
        if self._ro.column_names is not None:
            self._names = list(self._ro.column_names)
        elif self._ro.autogenerate_column_names:
            first = next(rows)
            self._names = [f"f{i}" for i in range(len(first))]
            rows = _chain_one(first, rows)
        else:
            self._names = next(rows)
        for _ in range(self._ro.skip_rows_after_names):
            next(rows, None)
        self._rows = rows
        # rows per block: approximate the byte-oriented block_size with
        # an initial 64Ki-row cap refined after the first block
        self._rows_per_block = None
        self._first = self._read_block(first=True)
        self.schema = (self._first.schema if self._first is not None
                       else T.Schema([]))

    def _read_block(self, first=False):
        target = self._ro.block_size
        cols = [[] for _ in self._names]
        nbytes = 0
        nrows = 0
        for row in self._rows:
            if not row and self._po.ignore_empty_lines:
                continue
            for i in range(len(self._names)):
                cols[i].append(row[i] if i < len(row) else None)
            nbytes += sum(len(v) for v in row) + len(row)
            nrows += 1
            if nbytes >= target:
                break
        if nrows == 0:
            return None
        arrays, out_names = [], []
        for name, col in zip(self._names, cols):
            if self._co.include_columns is not None and \
                    name not in self._co.include_columns:
                continue
            t = self._types.get(name) if not first else \
                self._co.column_types.get(name)
            arrays.append(_convert_column(col, self._co, t))
            out_names.append(name)
        batch = Table.from_arrays(arrays, out_names).to_batches()[0]
        if first:
            self._types = {f.name: f.type for f in batch.schema}
        return batch

    def read_next_batch(self):
        if self._native is not None:
            return self._native.read_next_batch()
        if self._first is not None:
            out, self._first = self._first, None
            return out
        b = self._read_block()
        if b is None:
            raise StopIteration
        return b

    def __iter__(self):
        while True:
            try:
                yield self.read_next_batch()
            except StopIteration:
                return

    def read_all(self) -> Table:
        batches = list(self)
        if not batches:
            return Table.from_arrays([], [])
        return Table.from_batches(batches, batches[0].schema)


def open_csv(source, read_options=None, parse_options=None,
             convert_options=None) -> CSVStreamingReader:
    """Streaming CSV reader (csv/reader.h:65 StreamingReader)."""
    return CSVStreamingReader(source, read_options, parse_options,
                              convert_options)


class CSVWriter:
    """Incremental CSV writer (pyarrow.csv.CSVWriter)."""

    def __init__(self, sink, schema, write_options=None):
        self._wo = write_options or WriteOptions()
        self._schema = schema
        self._close = False
        if isinstance(sink, str):
            sink = open(sink, "w", newline="")
            self._close = True
        self._text = sink
        self._wrap = False
        try:
            sink.write("")
        except TypeError:
            self._text = io.TextIOWrapper(sink, encoding="utf8",
                                          newline="")
            self._wrap = True
        self._w = _csv.writer(self._text, delimiter=self._wo.delimiter,
                              quoting=_csv.QUOTE_MINIMAL,
                              lineterminator="\r\n")
        if self._wo.include_header:
            self._w.writerow([f.name for f in schema])

    def write(self, data):
        if isinstance(data, Table):
            for b in data.to_batches():
                self.write(b)
            return
        pyd = data.to_pydict()
        names = data.column_names
        cols = [pyd[nm] for nm in names]
        for i in range(data.num_rows):
            self._w.writerow([_format_value(c[i]) for c in cols])

    write_table = write
    write_batch = write

    def close(self):
        if self._wrap:
            self._text.flush()
            self._text.detach()
        elif self._close:
            self._text.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _format_value(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.decode("utf8", "replace")
    return str(v)


def _raw_format_column(col, delim: str):
    """(offsets int64[n+1], pool u8) of csv-ready cells for one column,
    staying in native byte pools end to end (no python string
    materialization), or None when the type needs another path.
    Supported: ints (<= int64 range), float64, string (+dictionary of
    string)."""
    import numpy as np

    from .. import native as nat
    from .. import types as T
    if nat.get_lib() is None:
        return None
    arr = col.combine() if hasattr(col, "combine") else col
    t = arr.type
    if t.id == T.TypeId.DICTIONARY:
        if t.value_type.id not in (T.TypeId.STRING,
                                   T.TypeId.LARGE_STRING):
            return None
        try:
            arr = arr.cast(t.value_type)
        except Exception:  # noqa: BLE001
            return None
        t = arr.type
    valid = arr.is_valid_mask() if arr.null_count else None
    if t.is_integer:
        try:
            a = np.asarray(arr.data.values(), dtype=t.to_numpy_dtype())
        except (ValueError, TypeError):
            return None
        if t.id == T.TypeId.UINT64 and len(a) and \
                a.max() > np.iinfo(np.int64).max:
            return None
        return nat.csv_format_i64(a.astype(np.int64, copy=False),
                                  valid, raw=True)
    if t.id == T.TypeId.DOUBLE:
        try:
            a = np.asarray(arr.data.values(), dtype=np.float64)
        except (ValueError, TypeError):
            return None
        return nat.csv_format_f64(a, valid, raw=True)
    if t.id in (T.TypeId.STRING, T.TypeId.LARGE_STRING):
        offs = np.asarray(arr.data.offsets())
        if offs.dtype != np.int32:
            if len(offs) and offs[-1] > np.iinfo(np.int32).max:
                return None
            offs = offs.astype(np.int32)
        pool = np.asarray(arr.data.data_bytes())
        return nat.csv_quote_cells(pool, offs, valid, delim)
    return None


def _write_csv_body_native(data, names, delim: str):
    """Whole CSV body as one u8 array via the native per-column
    formatters + row interleave (csv/writer.cc assembly analogue), or
    None when any column needs the generic path."""
    from .. import native as nat
    cols = []
    for nm in names:
        r = _raw_format_column(data.column(nm), delim)
        if r is None:
            return None
        cols.append(r)
    return nat.csv_interleave(cols, data.num_rows, delim)


def _fast_format_column(col, delim: str):
    """One list of csv-ready cell strings for a primitive column, or
    None when the type needs the generic row path. Numerics format in
    one C-level U-cast (str()-identical for int64/float64); strings
    quote with a single comprehension (QUOTE_MINIMAL semantics)."""
    import numpy as np

    from .. import types as T
    arr = col.combine() if hasattr(col, "combine") else col
    t = arr.type
    tid = t.id
    if tid == T.TypeId.DICTIONARY:
        t = t.value_type
        tid = t.id
        try:
            arr = arr.cast(t)  # decode codes -> values (honors validity)
        except Exception:
            return None
    if t.is_integer or t.is_floating:
        try:
            a = np.asarray(arr.data.values(), dtype=t.to_numpy_dtype())
        except (ValueError, TypeError):
            return None
        valid = arr.is_valid_mask() if arr.null_count else None
        if t.id == T.TypeId.DOUBLE:
            from ..native import csv_format_f64
            out = csv_format_f64(a, valid)
            if out is not None:
                # to_chars prefers scientific whenever shorter
                # (1e-04); python repr keeps fixed down to 1e-4 —
                # normalize the (rare) e-cells for byte-identical
                # output vs the generic path
                return [repr(float(x)) if "e" in x else x
                        for x in out]
        elif t.id == T.TypeId.INT64:
            from ..native import csv_format_i64
            out = csv_format_i64(a, valid)
            if out is not None:
                return out
        out = a.astype("U32").tolist()
        if arr.null_count:
            m = arr.is_valid_mask().tolist()
            out = [o if ok else "" for o, ok in zip(out, m)]
        return out
    if tid == T.TypeId.BOOL:
        return ["" if v is None else ("true" if v else "false")
                for v in arr.to_pylist()]
    if tid in (T.TypeId.STRING, T.TypeId.LARGE_STRING):
        def cell(v, d=delim):
            if v is None:
                return ""
            if '"' in v or d in v or "\n" in v or "\r" in v:
                return '"' + v.replace('"', '""') + '"'
            return v
        return [cell(v) for v in arr.to_pylist()]
    return None


def write_csv(data: Union[Table, RecordBatch], sink,
              write_options: Optional[WriteOptions] = None):
    wo = write_options or WriteOptions()
    close = False
    if isinstance(sink, str):
        sink = open(sink, "w", newline="")
        close = True
    text = sink
    wrap = False
    if hasattr(sink, "write"):
        try:
            sink.write("")
        except TypeError:
            text = io.TextIOWrapper(sink, encoding="utf8", newline="")
            wrap = True
    w = _csv.writer(text, delimiter=wo.delimiter,
                    quoting=_csv.QUOTE_MINIMAL, lineterminator="\r\n")
    names = data.column_names
    if wo.include_header:
        w.writerow(names)
    # fastest path: int64/float64/string columns stay native byte
    # pools end to end — per-column C formatters + one C row
    # interleave, no python string materialization at all
    if wo.quoting_style == "needed" and _single_ascii(wo.delimiter) \
            and data.num_rows:
        body = _write_csv_body_native(data, names, wo.delimiter)
        if body is not None:
            raw = getattr(text, "buffer", None)
            if raw is not None:
                text.flush()
                raw.write(body.tobytes())
            else:
                text.write(body.tobytes().decode("utf8"))
            if wrap:
                text.flush()
                text.detach()
            if close:
                text.close()
            return
    # fast path: all-primitive columns pre-format per COLUMN (C-level
    # U-casts + one quoting pass), rows assemble with zip + join —
    # ~10x over per-cell csv.writer (reference: csv/writer.cc casts
    # whole columns too)
    if wo.quoting_style == "needed":
        colstrs = []
        for nm in names:
            f = _fast_format_column(data.column(nm), wo.delimiter)
            if f is None:
                colstrs = None
                break
            colstrs.append(f)
        if colstrs is not None:
            if colstrs and colstrs[0]:
                sep = wo.delimiter
                body = "\r\n".join(map(sep.join, zip(*colstrs)))
                text.write(body)
                text.write("\r\n")
            if wrap:
                text.flush()
                text.detach()
            if close:
                text.close()
            return
    pyd = data.to_pydict()
    n = data.num_rows
    cols = [pyd[nm] for nm in names]
    for i in range(n):
        w.writerow([_format_value(c[i]) for c in cols])
    if wrap:
        text.flush()
        text.detach()
    if close:
        text.close()
