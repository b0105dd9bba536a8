"""Plan node options (reference: acero/options.h:64-870)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

from ..table import RecordBatch, Table
from .expression import Expression


class ExecNodeOptions:
    pass


class TableSourceNodeOptions(ExecNodeOptions):
    def __init__(self, table: Union[Table, RecordBatch]):
        if isinstance(table, RecordBatch):
            table = Table.from_batches([table])
        self.table = table


class FilterNodeOptions(ExecNodeOptions):
    def __init__(self, filter_expression: Expression):
        self.filter_expression = filter_expression


class ProjectNodeOptions(ExecNodeOptions):
    def __init__(self, expressions: Sequence[Expression],
                 names: Optional[Sequence[str]] = None):
        self.expressions = [e if isinstance(e, Expression)
                            else Expression.literal(e) for e in expressions]
        self.names = list(names) if names is not None else None


class AggregateNodeOptions(ExecNodeOptions):
    """aggregates: list of (target, function, options, output_name);
    target is a column name (or list for 0-ary like count_all)."""

    def __init__(self, aggregates: Sequence[Tuple], keys: Sequence = (),
                 segment_keys: Sequence = ()):
        norm = []
        for agg in aggregates:
            if len(agg) == 4:
                target, fn, options, out_name = agg
            elif len(agg) == 3:
                target, fn, out_name = agg
                options = None
            else:
                raise ValueError("aggregate spec needs 3 or 4 elements")
            norm.append((target, fn, options or {}, out_name))
        self.aggregates = norm
        self.keys = [k if isinstance(k, str) else str(k) for k in keys]
        # segment keys (reference: RowSegmenter, compute/row/grouper.h:80):
        # inputs are ordered by these; outputs come back segment-ordered.
        # With whole-batch execution they fold into the grouping keys plus
        # an output sort.
        self.segment_keys = [k if isinstance(k, str) else str(k)
                             for k in segment_keys]


class PivotLongerRowTemplate:
    """One output row per input row (reference: acero/options.h
    PivotLongerRowTemplate). feature_values: literal strings for the
    feature columns; measurement_values: input column names (or None for
    null) feeding the measurement columns."""

    def __init__(self, feature_values: Sequence[str],
                 measurement_values: Sequence[Optional[str]]):
        self.feature_values = list(feature_values)
        self.measurement_values = list(measurement_values)


class PivotLongerNodeOptions(ExecNodeOptions):
    """Wide -> long reshape (reference: acero/options.h
    PivotLongerNodeOptions, pivot_longer_node.cc). The output carries all
    input columns plus the feature/measurement columns; each input row
    emits one output row per template."""

    def __init__(self, row_templates: Sequence[PivotLongerRowTemplate],
                 feature_field_names: Sequence[str],
                 measurement_field_names: Sequence[str]):
        self.row_templates = [
            t if isinstance(t, PivotLongerRowTemplate)
            else PivotLongerRowTemplate(*t) for t in row_templates]
        self.feature_field_names = list(feature_field_names)
        self.measurement_field_names = list(measurement_field_names)


class OrderByNodeOptions(ExecNodeOptions):
    def __init__(self, sort_keys: Sequence[Tuple[str, str]],
                 null_placement: str = "at_end"):
        self.sort_keys = [(k, "ascending") if isinstance(k, str) else
                          (k[0], k[1]) for k in sort_keys]
        self.null_placement = null_placement


class FetchNodeOptions(ExecNodeOptions):
    def __init__(self, offset: int = 0, count: int = -1):
        self.offset = int(offset)
        self.count = int(count)


class HashJoinNodeOptions(ExecNodeOptions):
    def __init__(self, join_type: str = "inner",
                 left_keys: Sequence[str] = (),
                 right_keys: Sequence[str] = (),
                 left_output: Optional[Sequence[str]] = None,
                 right_output: Optional[Sequence[str]] = None,
                 output_suffix_for_left: str = "",
                 output_suffix_for_right: str = "",
                 disable_bloom_filter: bool = False,
                 filter: Optional[Expression] = None):
        valid = {"inner", "left outer", "right outer", "full outer",
                 "left semi", "right semi", "left anti", "right anti"}
        if join_type not in valid:
            raise ValueError(f"bad join type {join_type!r}")
        self.join_type = join_type
        # bloom-filter probe pushdown (reference:
        # acero/hash_join_node.cc:505 BloomFilterPushdownContext;
        # QueryOptions equivalent knob). Applied only for join types where
        # unmatched probe rows produce no output.
        self.disable_bloom_filter = disable_bloom_filter
        self.left_keys = list(left_keys)
        self.right_keys = list(right_keys)
        self.left_output = list(left_output) if left_output is not None \
            else None
        self.right_output = list(right_output) if right_output is not None \
            else None
        self.output_suffix_for_left = output_suffix_for_left
        self.output_suffix_for_right = output_suffix_for_right
        # residual (non-equi) filter evaluated on each equi-matched row
        # pair BEFORE join-type semantics apply (reference:
        # acero/options.h HashJoinNodeOptions::filter,
        # swiss_join_internal.h:882 JoinResidualFilter). Bound against
        # the concatenated [left fields..., right fields...] schema
        # with UNSUFFIXED names (left wins name lookups on collision,
        # like the reference's field-path binding). Null evaluations
        # reject the pair (Kleene false).
        self.filter_expression = filter


class UnionNodeOptions(ExecNodeOptions):
    pass


class AsofJoinNodeOptions(ExecNodeOptions):
    """As-of join (reference: acero/asof_join_node.cc:1612): for each left
    row, the most recent right row whose `on` value is <= (tolerance < 0)
    or >= (tolerance > 0) within |tolerance|, matching on by-keys."""

    def __init__(self, left_on: str, left_by: Sequence[str],
                 right_on: str, right_by: Sequence[str],
                 tolerance: int = 0):
        self.left_on = left_on
        self.left_by = list(left_by)
        self.right_on = right_on
        self.right_by = list(right_by)
        self.tolerance = int(tolerance)


class SortedMergeNodeOptions(ExecNodeOptions):
    """K-way merge of sorted inputs (reference: sorted_merge_node.cc)."""

    def __init__(self, sort_keys, null_placement: str = "at_end"):
        self.sort_keys = [(k, "ascending") if isinstance(k, str) else
                          (k[0], k[1]) for k in sort_keys]
        self.null_placement = null_placement


class RecordBatchReaderSourceNodeOptions(ExecNodeOptions):
    """Source draining a RecordBatchReader (source_node.cc:582)."""

    def __init__(self, reader, schema=None):
        self.reader = reader
        self.schema = schema


class ScanNodeOptions(ExecNodeOptions):
    """Dataset scan as a plan source (reference: dataset/scan_node.cc:123
    "scan"). Fragments are loaded host-side (with the dataset's
    partition pruning when ``filter`` is set) and enter the plan as one
    device table; pushdown beyond that is the plan's own filter node."""

    def __init__(self, dataset, columns=None, filter=None,
                 require_sequenced_output: bool = False):
        self.dataset = dataset
        self.columns = columns
        self.filter = filter
        self.require_sequenced_output = require_sequenced_output

    @property
    def table(self):
        return self.dataset.to_table(columns=self.columns,
                                     filter=self.filter)


class SinkNodeOptions(ExecNodeOptions):
    """Generic stream sink (sink_node.cc:557 "sink"). The engine's pull
    model surfaces results through Declaration.to_table/to_reader; the
    node itself is a pass-through terminal."""

    def __init__(self, schema=None, backpressure=None):
        self.schema = schema
        self.backpressure = backpressure


class TableSinkNodeOptions(SinkNodeOptions):
    """Accumulate into a Table (sink_node.cc "table_sink")."""


class ConsumingSinkNodeOptions(ExecNodeOptions):
    """Push each output batch into a consumer callback
    (sink_node.cc "consuming_sink"; acero/options.h ConsumingSinkNodeOptions).
    ``consumer`` receives each RecordBatch; an optional ``finish``
    attribute/callable runs when the plan completes."""

    def __init__(self, consumer):
        self.consumer = consumer


class OrderBySinkNodeOptions(SinkNodeOptions):
    """Sort-then-sink (sink_node.cc "order_by_sink")."""

    def __init__(self, sort_keys, null_placement: str = "at_end",
                 schema=None):
        super().__init__(schema)
        self.sort_keys = [(k, "ascending") if isinstance(k, str) else
                          (k[0], k[1]) for k in sort_keys]
        self.null_placement = null_placement


class SelectKSinkNodeOptions(SinkNodeOptions):
    """Top-k select then sink (sink_node.cc "select_k_sink";
    SelectKOptions in compute/api_vector.h)."""

    def __init__(self, k: int, sort_keys, schema=None):
        super().__init__(schema)
        self.k = int(k)
        self.sort_keys = [(kk, "ascending") if isinstance(kk, str) else
                          (kk[0], kk[1]) for kk in sort_keys]
