"""In-process S3 REST emulator for filesystem tests.

The reference tests its S3 client against a local MinIO process
(filesystem/s3_test_util.h); no S3-compatible binary ships in this
image, so this is a minimal threading HTTP server speaking the subset
of the S3 REST API the native client (arrow_tpu/fs_s3.py) uses:
CreateBucket, PutObject (+x-amz-copy-source), GetObject (+Range),
HeadObject, DeleteObject, ListObjectsV2 with prefix/delimiter. SigV4
Authorization headers are accepted but only checked for presence."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.sax.saxutils import escape


class _State:
    def __init__(self):
        self.buckets = {}  # bucket -> {key: bytes}
        self.lock = threading.Lock()


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _split(self):
            parsed = urllib.parse.urlparse(self.path)
            parts = urllib.parse.unquote(parsed.path).lstrip("/")
            q = dict(urllib.parse.parse_qsl(parsed.query,
                                            keep_blank_values=True))
            if "/" in parts:
                b, k = parts.split("/", 1)
            else:
                b, k = parts, ""
            return b, k, q

        def _reply(self, code, body=b"", headers=()):
            self.send_response(code)
            for k, v in headers:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body and self.command != "HEAD":
                self.wfile.write(body)

        def do_PUT(self):
            b, k, _q = self._split()
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length) if length else b""
            copy_src = self.headers.get("x-amz-copy-source")
            with state.lock:
                if not k:
                    state.buckets.setdefault(b, {})
                    return self._reply(200)
                if b not in state.buckets:
                    return self._reply(404)
                if copy_src:
                    sb, sk = copy_src.lstrip("/").split("/", 1)
                    src = state.buckets.get(sb, {}).get(sk)
                    if src is None:
                        return self._reply(404)
                    state.buckets[b][k] = src
                    return self._reply(
                        200, b"<CopyObjectResult></CopyObjectResult>")
                state.buckets[b][k] = data
            self._reply(200)

        def _get(self, want_body):
            b, k, q = self._split()
            with state.lock:
                if b not in state.buckets:
                    return self._reply(404)
                objs = state.buckets[b]
                if not k:
                    return self._list(objs, q)
                if k not in objs:
                    return self._reply(404)
                data = objs[k]
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                a, _, z = rng[6:].partition("-")
                start = int(a) if a else 0
                end = int(z) if z else len(data) - 1
                part = data[start:end + 1]
                return self._reply(
                    206, part if want_body else b"",
                    [("Content-Range",
                      f"bytes {start}-{end}/{len(data)}")])
            self._reply(200, data if want_body else b"",
                        [("Content-Length", str(len(data)))]
                        if not want_body else ())

        def do_GET(self):
            self._get(True)

        def do_HEAD(self):
            b, k, _q = self._split()
            with state.lock:
                objs = state.buckets.get(b)
                if objs is None or (k and k not in objs):
                    return self._reply(404)
                size = len(objs[k]) if k else 0
            self._reply(200, b"",
                        [("Content-Length", str(size))])

        def do_DELETE(self):
            b, k, _q = self._split()
            with state.lock:
                objs = state.buckets.get(b)
                if objs is not None:
                    objs.pop(k, None)
            self._reply(204)

        def _list(self, objs, q):
            prefix = q.get("prefix", "")
            delim = q.get("delimiter", "")
            keys, prefixes = [], set()
            for key in sorted(objs):
                if not key.startswith(prefix):
                    continue
                rest = key[len(prefix):]
                if delim and delim in rest:
                    prefixes.add(prefix + rest.split(delim, 1)[0]
                                 + delim)
                else:
                    keys.append((key, len(objs[key])))
            parts = ["<?xml version=\"1.0\"?><ListBucketResult>",
                     "<IsTruncated>false</IsTruncated>"]
            for key, size in keys:
                parts.append(f"<Contents><Key>{escape(key)}</Key>"
                             f"<Size>{size}</Size></Contents>")
            for p in sorted(prefixes):
                parts.append(f"<CommonPrefixes><Prefix>{escape(p)}"
                             "</Prefix></CommonPrefixes>")
            parts.append("</ListBucketResult>")
            self._reply(200, "".join(parts).encode())

    return Handler


class S3Emulator:
    """with S3Emulator() as em: S3FileSystem(endpoint_override=em.endpoint)"""

    def __init__(self):
        self.state = _State()
        self.server = ThreadingHTTPServer(
            ("127.0.0.1", 0), _make_handler(self.state))
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)

    @property
    def endpoint(self) -> str:
        host, port = self.server.server_address
        return f"{host}:{port}"

    def __enter__(self):
        if not self.thread.is_alive():
            self.thread.start()
        return self

    def __exit__(self, *a):
        self.server.shutdown()
        self.server.server_close()
