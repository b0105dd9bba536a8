"""Per-query execution state.

Reference analogue: acero/query_context.h:36 — QueryContext owns the
query's memory pool accounting, executor handles, and cancellation
state; every ExecNode allocates through it so a query's footprint is
attributable and boundable.

TPU redesign: device buffers are static-shape XLA values, so the
accounting model is CAPACITY-based — every node output's padded buffer
bytes accumulate into the query's materialization total. That total is
a deterministic upper bound on the device footprint (XLA may fuse away
or free intermediates early; same plan + capacities -> same
accounting), which is the right direction of error for a budget
check.

QueryOptions(memory_limit=...) turns the accounting into enforcement:
exceeding the limit raises ArrowMemoryError BEFORE dispatching further
nodes — the static-shape analogue of the reference's pool limit
(CappedMemoryPool, memory_pool.h:254, and QueryOptions in
exec_plan.h:510).
"""

from __future__ import annotations

import threading
from typing import List, Optional, Tuple

from ..compute.registry import ArrowInvalid

__all__ = ["QueryOptions", "QueryContext", "ArrowMemoryError",
           "current_query_context"]


class ArrowMemoryError(ArrowInvalid):
    """Query exceeded its memory budget (reference: Status::OutOfMemory
    from a capped pool)."""


class QueryOptions:
    """Per-query knobs (reference: acero/exec_plan.h:510 QueryOptions).

    memory_limit: optional byte budget for the plan's device frontier.
    collect_metrics: record per-node dispatch times on the context.
    """

    def __init__(self, memory_limit: Optional[int] = None,
                 collect_metrics: bool = True):
        self.memory_limit = memory_limit
        self.collect_metrics = collect_metrics


class QueryContext:
    """State for one plan execution (reference acero/query_context.h:36):
    byte accounting, peak watermark, node metrics, cancellation."""

    def __init__(self, options: Optional[QueryOptions] = None,
                 stop_token=None):
        self.options = options or QueryOptions()
        self.bytes_materialized = 0
        self.node_metrics: List[Tuple[str, float, int]] = []
        if stop_token is None:
            from ..cancel import default_stop_token
            stop_token = default_stop_token()
        self.stop_token = stop_token

    # --- memory accounting -------------------------------------------
    @staticmethod
    def batch_nbytes(batch) -> int:
        """Padded device bytes of a DeviceBatch (values + validity)."""
        total = 0
        for c in getattr(batch, "columns", ()):
            v = getattr(c, "values", None)
            if v is not None and hasattr(v, "size"):
                total += v.size * v.dtype.itemsize
            m = getattr(c, "validity", None)
            if m is not None and hasattr(m, "size"):
                total += m.size  # bool mask: 1 byte/row
        return total

    def track_batch(self, factory: str, batch) -> int:
        n = self.batch_nbytes(batch)
        self.bytes_materialized += n
        limit = self.options.memory_limit
        if limit is not None and self.bytes_materialized > limit:
            raise ArrowMemoryError(
                f"query exceeded memory_limit={limit} bytes at node "
                f"'{factory}' (tracked {self.bytes_materialized})")
        return n

    # --- metrics -----------------------------------------------------
    def record_node(self, factory: str, seconds: float,
                    out_bytes: int) -> None:
        if self.options.collect_metrics:
            self.node_metrics.append((factory, seconds, out_bytes))

    def to_string(self) -> str:
        lines = [f"{f}: {s * 1e3:.2f} ms dispatch, {b} B out"
                 for f, s, b in self.node_metrics]
        lines.append(f"materialized bytes: {self.bytes_materialized}")
        return "\n".join(lines)


_TLS = threading.local()


def current_query_context() -> Optional[QueryContext]:
    return getattr(_TLS, "ctx", None)


class query_scope:
    """Context manager installing a QueryContext for the current thread
    (the plan executor consults it per node)."""

    def __init__(self, ctx: QueryContext):
        self.ctx = ctx

    def __enter__(self) -> QueryContext:
        self.prev = getattr(_TLS, "ctx", None)
        _TLS.ctx = self.ctx
        return self.ctx

    def __exit__(self, *exc):
        _TLS.ctx = self.prev
