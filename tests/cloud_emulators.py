"""In-process cloud-storage emulators for the native filesystem
clients (pattern: tests/s3_emulator.py; reference analogues:
gcsfs_test.cc's fake-gcs-server, azurefs_test.cc's Azurite fixture,
and the HDFS minicluster).

Each speaks just the REST subset its client (arrow_tpu/fs_gcs.py,
fs_azure.py, fs_hdfs.py) uses, over a threading HTTP server."""

from __future__ import annotations

import json
import posixpath
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.sax.saxutils import escape


class _BaseEmulator:
    handler_factory = None

    def __init__(self):
        self.state = self._make_state()
        self.server = ThreadingHTTPServer(
            ("127.0.0.1", 0), self.handler_factory(self.state))
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True)

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


def _quiet(cls):
    cls.log_message = lambda *a: None
    cls.protocol_version = "HTTP/1.1"
    return cls


def _reply(h, code, body=b"", headers=(), is_head=False):
    h.send_response(code)
    for k, v in headers:
        h.send_header(k, v)
    h.send_header("Content-Length", str(len(body)))
    h.end_headers()
    if body and not is_head:
        h.wfile.write(body)


def _prefix_list(objs, prefix, delim):
    keys, prefixes = [], set()
    for key in sorted(objs):
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        if delim and delim in rest:
            prefixes.add(prefix + rest.split(delim, 1)[0] + delim)
        else:
            keys.append((key, len(objs[key])))
    return keys, sorted(prefixes)


# --- GCS (JSON API, fake-gcs-server analogue) -------------------------------

class _GcsState:
    def __init__(self):
        self.buckets = {}
        self.lock = threading.Lock()


def _gcs_handler(state):
    @_quiet
    class Handler(BaseHTTPRequestHandler):
        def _q(self):
            parsed = urllib.parse.urlparse(self.path)
            return (urllib.parse.unquote(parsed.path),
                    dict(urllib.parse.parse_qsl(
                        parsed.query, keep_blank_values=True)))

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n) if n else b""

        def do_POST(self):
            path, q = self._q()
            body = self._body()
            with state.lock:
                if path == "/storage/v1/b":
                    name = json.loads(body or b"{}").get("name", "")
                    if name in state.buckets:
                        return _reply(self, 409)
                    state.buckets[name] = {}
                    return _reply(self, 200, b"{}")
                if path.startswith("/upload/storage/v1/b/"):
                    bucket = path.split("/")[5]
                    key = q.get("name", "")
                    objs = state.buckets.setdefault(bucket, {})
                    objs[key] = body
                    return _reply(self, 200, json.dumps(
                        {"name": key, "size": str(len(body))}).encode())
                if "/copyTo/b/" in path:
                    pre, post = path.split("/copyTo/b/", 1)
                    sb, so = pre.split("/b/", 1)[1].split("/o/", 1)
                    db, do = post.split("/o/", 1)
                    src = state.buckets.get(sb, {}).get(so)
                    if src is None:
                        return _reply(self, 404)
                    state.buckets.setdefault(db, {})[do] = src
                    return _reply(self, 200, b"{}")
            _reply(self, 400)

        def do_GET(self):
            path, q = self._q()
            with state.lock:
                if path.startswith("/download/storage/v1/b/"):
                    _, rest = path.split("/download/storage/v1/b/", 1)
                    bucket, key = rest.split("/o/", 1)
                    data = state.buckets.get(bucket, {}).get(key)
                    if data is None:
                        return _reply(self, 404)
                    return _reply(self, 200, data)
                if path.startswith("/storage/v1/b/"):
                    rest = path[len("/storage/v1/b/"):]
                    if "/o/" in rest:
                        bucket, key = rest.split("/o/", 1)
                        data = state.buckets.get(bucket, {}).get(key)
                        if data is None:
                            return _reply(self, 404)
                        return _reply(self, 200, json.dumps(
                            {"name": key,
                             "size": str(len(data))}).encode())
                    bucket = rest.rstrip("/").removesuffix("/o")
                    objs = state.buckets.get(bucket)
                    if objs is None:
                        return _reply(self, 404)
                    keys, prefixes = _prefix_list(
                        objs, q.get("prefix", ""),
                        q.get("delimiter", ""))
                    doc = {"items": [{"name": k, "size": str(sz)}
                                     for k, sz in keys],
                           "prefixes": prefixes}
                    return _reply(self, 200, json.dumps(doc).encode())
            _reply(self, 400)

        def do_DELETE(self):
            path, _q = self._q()
            if path.startswith("/storage/v1/b/") and "/o/" in path:
                rest = path[len("/storage/v1/b/"):]
                bucket, key = rest.split("/o/", 1)
                with state.lock:
                    objs = state.buckets.get(bucket, {})
                    objs.pop(key, None)
                return _reply(self, 204)
            _reply(self, 400)

    return Handler


class GcsEmulator(_BaseEmulator):
    _make_state = staticmethod(_GcsState)
    handler_factory = staticmethod(_gcs_handler)


# --- Azure Blob (Azurite analogue, path-style /account/container/...) ------

class _AzureState:
    def __init__(self):
        self.containers = {}
        self.lock = threading.Lock()


def _azure_handler(state):
    @_quiet
    class Handler(BaseHTTPRequestHandler):
        def _q(self):
            parsed = urllib.parse.urlparse(self.path)
            parts = urllib.parse.unquote(parsed.path).strip(
                "/").split("/", 2)
            # /account/container/blob...
            account = parts[0] if parts else ""
            container = parts[1] if len(parts) > 1 else ""
            blob = parts[2] if len(parts) > 2 else ""
            q = dict(urllib.parse.parse_qsl(parsed.query,
                                            keep_blank_values=True))
            return account, container, blob, q

        def do_PUT(self):
            _a, c, b, q = self._q()
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n) if n else b""
            copy_src = self.headers.get("x-ms-copy-source")
            with state.lock:
                if q.get("restype") == "container" and not b:
                    if c in state.containers:
                        return _reply(self, 409)
                    state.containers[c] = {}
                    return _reply(self, 201)
                if c not in state.containers:
                    return _reply(self, 404)
                if copy_src:
                    # .../account/container/blob
                    src_path = urllib.parse.urlparse(copy_src).path
                    sparts = urllib.parse.unquote(src_path).strip(
                        "/").split("/", 2)
                    src = state.containers.get(
                        sparts[1], {}).get(sparts[2])
                    if src is None:
                        return _reply(self, 404)
                    state.containers[c][b] = src
                    return _reply(self, 202)
                state.containers[c][b] = data
            _reply(self, 201)

        def _serve_blob(self, want_body):
            _a, c, b, q = self._q()
            with state.lock:
                objs = state.containers.get(c)
                if objs is None:
                    return _reply(self, 404)
                if not b and q.get("comp") == "list":
                    keys, prefixes = _prefix_list(
                        objs, q.get("prefix", ""),
                        q.get("delimiter", ""))
                    parts = ["<?xml version=\"1.0\"?>"
                             "<EnumerationResults><Blobs>"]
                    for k, sz in keys:
                        parts.append(
                            f"<Blob><Name>{escape(k)}</Name>"
                            f"<Properties><Content-Length>{sz}"
                            "</Content-Length></Properties></Blob>")
                    for p in prefixes:
                        parts.append(f"<BlobPrefix><Name>{escape(p)}"
                                     "</Name></BlobPrefix>")
                    parts.append("</Blobs></EnumerationResults>")
                    return _reply(self, 200, "".join(parts).encode())
                if b not in objs:
                    return _reply(self, 404)
                data = objs[b]
            _reply(self, 200, data, is_head=not want_body)

        def do_GET(self):
            self._serve_blob(True)

        def do_HEAD(self):
            _a, c, b, _q = self._q()
            with state.lock:
                objs = state.containers.get(c)
                if objs is None or b not in objs:
                    return _reply(self, 404, is_head=True)
                size = len(objs[b])
            _reply(self, 200, b" " * size, is_head=True)

        def do_DELETE(self):
            _a, c, b, _q = self._q()
            with state.lock:
                objs = state.containers.get(c)
                if objs is not None:
                    objs.pop(b, None)
            _reply(self, 202)

    return Handler


class AzureEmulator(_BaseEmulator):
    _make_state = staticmethod(_AzureState)
    handler_factory = staticmethod(_azure_handler)


# --- WebHDFS (namenode REST analogue) ---------------------------------------

class _HdfsState:
    def __init__(self):
        self.files = {}          # path -> bytes
        self.dirs = {"/"}        # explicit directories
        self.lock = threading.Lock()


def _hdfs_handler(state):
    @_quiet
    class Handler(BaseHTTPRequestHandler):
        def _q(self):
            parsed = urllib.parse.urlparse(self.path)
            path = urllib.parse.unquote(
                parsed.path)[len("/webhdfs/v1"):] or "/"
            q = dict(urllib.parse.parse_qsl(parsed.query,
                                            keep_blank_values=True))
            return path, q

        def _status(self, path):
            if path in state.files:
                return {"type": "FILE",
                        "length": len(state.files[path]),
                        "pathSuffix": posixpath.basename(path)}
            children = any(
                f.startswith(path.rstrip("/") + "/")
                for f in list(state.files) + list(state.dirs))
            if path in state.dirs or children:
                return {"type": "DIRECTORY", "length": 0,
                        "pathSuffix": posixpath.basename(path)}
            return None

        def do_GET(self):
            path, q = self._q()
            op = q.get("op", "").upper()
            with state.lock:
                if op == "OPEN":
                    data = state.files.get(path)
                    if data is None:
                        return _reply(self, 404)
                    return _reply(self, 200, data)
                if op == "GETFILESTATUS":
                    st = self._status(path)
                    if st is None:
                        return _reply(self, 404, json.dumps(
                            {"RemoteException":
                             {"exception":
                              "FileNotFoundException"}}).encode())
                    return _reply(self, 200, json.dumps(
                        {"FileStatus": st}).encode())
                if op == "LISTSTATUS":
                    base = path.rstrip("/") or "/"
                    if self._status(base) is None:
                        return _reply(self, 404)
                    names = set()
                    for f in list(state.files) + list(state.dirs):
                        if f == base or not f.startswith(
                                base.rstrip("/") + "/"):
                            continue
                        rest = f[len(base.rstrip("/")) + 1:]
                        names.add(rest.split("/", 1)[0])
                    sts = []
                    for nm in sorted(names):
                        st = self._status(
                            posixpath.join(base, nm))
                        if st:
                            st["pathSuffix"] = nm
                            sts.append(st)
                    return _reply(self, 200, json.dumps(
                        {"FileStatuses":
                         {"FileStatus": sts}}).encode())
            _reply(self, 400)

        def do_PUT(self):
            path, q = self._q()
            op = q.get("op", "").upper()
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n) if n else b""
            with state.lock:
                if op == "CREATE":
                    state.files[path] = data
                    d = posixpath.dirname(path)
                    while d and d != "/":
                        state.dirs.add(d)
                        d = posixpath.dirname(d)
                    return _reply(self, 201)
                if op == "MKDIRS":
                    d = path.rstrip("/") or "/"
                    while d and d != "/":
                        state.dirs.add(d)
                        d = posixpath.dirname(d)
                    return _reply(self, 200,
                                  b"{\"boolean\": true}")
                if op == "RENAME":
                    dest = q.get("destination", "")
                    moved = False
                    for f in list(state.files):
                        if f == path:
                            state.files[dest] = state.files.pop(f)
                            moved = True
                        elif f.startswith(path.rstrip("/") + "/"):
                            state.files[dest + f[len(path):]] = \
                                state.files.pop(f)
                            moved = True
                    if path in state.dirs:
                        state.dirs.discard(path)
                        state.dirs.add(dest)
                        moved = True
                    return _reply(self, 200, json.dumps(
                        {"boolean": moved}).encode())
            _reply(self, 400)

        def do_DELETE(self):
            path, q = self._q()
            with state.lock:
                state.files.pop(path, None)
                state.dirs.discard(path)
                if q.get("recursive") == "true":
                    for f in list(state.files):
                        if f.startswith(path.rstrip("/") + "/"):
                            del state.files[f]
                    for d in list(state.dirs):
                        if d.startswith(path.rstrip("/") + "/"):
                            state.dirs.discard(d)
            _reply(self, 200, b"{\"boolean\": true}")

    return Handler


class WebHdfsEmulator(_BaseEmulator):
    _make_state = staticmethod(_HdfsState)
    handler_factory = staticmethod(_hdfs_handler)

    @property
    def host_port(self):
        return self.server.server_address
