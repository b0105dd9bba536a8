"""OpenTelemetry trace export for query execution.

Reference analogue: cpp/src/arrow/util/tracing.h + tracing_internal.cc
— the reference wires Acero spans into opentelemetry-cpp with an OTLP
exporter. This module renders a QueryContext's per-node metrics as
OTLP/JSON ResourceSpans (the standard protobuf-JSON mapping of
opentelemetry-proto trace/v1/trace.proto) and writes them to a file or
POSTs them to an OTLP/HTTP collector — no third-party dependency.

Enable per process with ``ARROW_TPU_OTEL_EXPORT=<path or http URL>``
(Declaration.to_table exports automatically when query_options are
passed), or call ``export_query(qc, destination)`` directly.
"""

from __future__ import annotations

import json
import os
import secrets
import time
from typing import Optional

_SPAN_KIND_INTERNAL = 1


def _otlp_payload(node_metrics, plan_name: str,
                  end_unix_nano: Optional[int] = None) -> dict:
    """OTLP/JSON ExportTraceServiceRequest for one query execution.

    node_metrics: [(factory_name, seconds, out_bytes), ...] in dispatch
    order. Spans are laid out sequentially ending at export time, each
    a child of one root span covering the whole plan."""
    end = end_unix_nano or time.time_ns()
    total_s = sum(s for _f, s, _b in node_metrics) or 1e-9
    trace_id = secrets.token_hex(16)
    root_id = secrets.token_hex(8)
    start = end - int(total_s * 1e9)
    spans = [{
        "traceId": trace_id,
        "spanId": root_id,
        "name": plan_name,
        "kind": _SPAN_KIND_INTERNAL,
        "startTimeUnixNano": str(start),
        "endTimeUnixNano": str(end),
        "attributes": [
            {"key": "arrow.engine", "value": {"stringValue": "arrow_tpu"}},
            {"key": "arrow.node_count",
             "value": {"intValue": str(len(node_metrics))}},
        ],
    }]
    t = start
    for factory, seconds, out_bytes in node_metrics:
        t2 = t + int(seconds * 1e9)
        spans.append({
            "traceId": trace_id,
            "spanId": secrets.token_hex(8),
            "parentSpanId": root_id,
            "name": factory,
            "kind": _SPAN_KIND_INTERNAL,
            "startTimeUnixNano": str(t),
            "endTimeUnixNano": str(t2),
            "attributes": [
                {"key": "arrow.out_bytes",
                 "value": {"intValue": str(int(out_bytes))}},
                {"key": "arrow.seconds",
                 "value": {"doubleValue": seconds}},
            ],
        })
        t = t2
    return {
        "resourceSpans": [{
            "resource": {"attributes": [
                {"key": "service.name",
                 "value": {"stringValue": "arrow_tpu"}},
            ]},
            "scopeSpans": [{
                "scope": {"name": "arrow_tpu.acero"},
                "spans": spans,
            }],
        }],
    }


def export_query(query_context, destination: Optional[str] = None,
                 plan_name: str = "acero.plan") -> Optional[dict]:
    """Export a finished QueryContext's node metrics as OTLP/JSON.

    destination: file path (appends one JSON line), an http(s) URL
    (POST to the OTLP/HTTP traces endpoint), or None to read
    ARROW_TPU_OTEL_EXPORT. Returns the payload (or None if no
    destination is configured)."""
    dest = destination or os.environ.get("ARROW_TPU_OTEL_EXPORT")
    if not dest:
        return None
    metrics = getattr(query_context, "node_metrics", None) or []
    payload = _otlp_payload(metrics, plan_name)
    if dest.startswith("http://") or dest.startswith("https://"):
        import urllib.request
        req = urllib.request.Request(
            dest, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=10).close()
        except Exception:  # noqa: BLE001 - tracing must never fail a query
            pass
    else:
        try:
            with open(dest, "a") as f:
                f.write(json.dumps(payload) + "\n")
        except OSError:
            pass
    return payload
