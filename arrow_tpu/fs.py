"""Filesystem abstraction.

Reference analogue: cpp/src/arrow/filesystem/filesystem.h — FileSystem API
with FileInfo/FileSelector, LocalFileSystem, SubTreeFileSystem and an
in-memory MockFileSystem (filesystem/mockfs.h) for tests. Cloud
implementations (S3/GCS/Azure) plug into the same interface; this
environment has no egress so only local/in-memory are provided.
"""

from __future__ import annotations

import io
import os
import posixpath
import shutil
from typing import Dict, List


class FileType:
    NotFound = "NotFound"
    File = "File"
    Directory = "Directory"


class FileInfo:
    __slots__ = ("path", "type", "size", "mtime")

    def __init__(self, path: str, type: str, size: int = -1, mtime=None):
        self.path = path
        self.type = type
        self.size = size
        self.mtime = mtime

    @property
    def base_name(self) -> str:
        return posixpath.basename(self.path)

    @property
    def is_file(self) -> bool:
        return self.type == FileType.File

    def __repr__(self):
        return f"FileInfo({self.path!r}, {self.type}, size={self.size})"


class FileSelector:
    def __init__(self, base_dir: str, recursive: bool = False,
                 allow_not_found: bool = False):
        self.base_dir = base_dir
        self.recursive = recursive
        self.allow_not_found = allow_not_found


class FileSystem:
    def get_file_info(self, path_or_selector):
        raise NotImplementedError

    def open_input_stream(self, path: str):
        raise NotImplementedError

    def open_input_file(self, path: str):
        return self.open_input_stream(path)

    def open_output_stream(self, path: str):
        raise NotImplementedError

    def create_dir(self, path: str, recursive: bool = True):
        raise NotImplementedError

    def delete_dir(self, path: str):
        raise NotImplementedError

    def delete_file(self, path: str):
        raise NotImplementedError

    def move(self, src: str, dest: str):
        raise NotImplementedError

    def equals(self, other) -> bool:
        return self is other


class LocalFileSystem(FileSystem):
    def get_file_info(self, path_or_selector):
        if isinstance(path_or_selector, FileSelector):
            sel = path_or_selector
            out: List[FileInfo] = []
            if not os.path.isdir(sel.base_dir):
                if sel.allow_not_found:
                    return out
                raise FileNotFoundError(sel.base_dir)
            if sel.recursive:
                for root, dirs, files in os.walk(sel.base_dir):
                    for d in dirs:
                        p = os.path.join(root, d)
                        out.append(FileInfo(p, FileType.Directory))
                    for f in files:
                        p = os.path.join(root, f)
                        out.append(FileInfo(p, FileType.File,
                                            os.path.getsize(p),
                                            os.path.getmtime(p)))
            else:
                for name in sorted(os.listdir(sel.base_dir)):
                    p = os.path.join(sel.base_dir, name)
                    if os.path.isdir(p):
                        out.append(FileInfo(p, FileType.Directory))
                    else:
                        out.append(FileInfo(p, FileType.File,
                                            os.path.getsize(p),
                                            os.path.getmtime(p)))
            return sorted(out, key=lambda i: i.path)
        p = path_or_selector
        if os.path.isdir(p):
            return FileInfo(p, FileType.Directory)
        if os.path.isfile(p):
            return FileInfo(p, FileType.File, os.path.getsize(p),
                            os.path.getmtime(p))
        return FileInfo(p, FileType.NotFound)

    def open_input_stream(self, path: str):
        return open(path, "rb")

    def open_output_stream(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        return open(path, "wb")

    def create_dir(self, path: str, recursive: bool = True):
        os.makedirs(path, exist_ok=True)

    def delete_dir(self, path: str):
        shutil.rmtree(path)

    def delete_file(self, path: str):
        os.remove(path)

    def move(self, src: str, dest: str):
        shutil.move(src, dest)


class MockFileSystem(FileSystem):
    """In-memory filesystem (reference: filesystem/mockfs.h)."""

    def __init__(self):
        self.files: Dict[str, bytes] = {}
        self.dirs = {""}

    def _norm(self, p: str) -> str:
        return p.strip("/")

    def get_file_info(self, path_or_selector):
        if isinstance(path_or_selector, FileSelector):
            sel = path_or_selector
            base = self._norm(sel.base_dir)
            out = []
            seen_dirs = set()
            for p, data in sorted(self.files.items()):
                if base and not p.startswith(base + "/"):
                    continue
                rel = p[len(base) + 1:] if base else p
                if "/" in rel:
                    d = rel.split("/")[0]
                    full_d = posixpath.join(base, d) if base else d
                    if full_d not in seen_dirs:
                        seen_dirs.add(full_d)
                        out.append(FileInfo(full_d, FileType.Directory))
                    if not sel.recursive:
                        continue
                out.append(FileInfo(p, FileType.File, len(data)))
            return sorted(out, key=lambda i: i.path)
        p = self._norm(path_or_selector)
        if p in self.files:
            return FileInfo(p, FileType.File, len(self.files[p]))
        if p in self.dirs or any(f.startswith(p + "/")
                                 for f in self.files):
            return FileInfo(p, FileType.Directory)
        return FileInfo(p, FileType.NotFound)

    def open_input_stream(self, path: str):
        p = self._norm(path)
        if p not in self.files:
            raise FileNotFoundError(path)
        return io.BytesIO(self.files[p])

    def open_output_stream(self, path: str):
        fs = self
        p = self._norm(path)

        class _Sink(io.BytesIO):
            def close(self):
                fs.files[p] = self.getvalue()
                super().close()

            def __exit__(self, *exc):
                self.close()
        return _Sink()

    def create_dir(self, path: str, recursive: bool = True):
        self.dirs.add(self._norm(path))

    def delete_dir(self, path: str):
        p = self._norm(path)
        self.dirs.discard(p)
        for f in [f for f in self.files if f.startswith(p + "/")]:
            del self.files[f]

    def delete_file(self, path: str):
        del self.files[self._norm(path)]

    def move(self, src: str, dest: str):
        self.files[self._norm(dest)] = self.files.pop(self._norm(src))


class SubTreeFileSystem(FileSystem):
    """Re-roots another filesystem at a prefix
    (reference: filesystem/filesystem.h SubTreeFileSystem)."""

    def __init__(self, base_path: str, base_fs: FileSystem):
        self.base_path = base_path.rstrip("/")
        self.base_fs = base_fs

    def _full(self, p: str) -> str:
        return posixpath.join(self.base_path, p.lstrip("/"))

    def get_file_info(self, path_or_selector):
        if isinstance(path_or_selector, FileSelector):
            sel = FileSelector(self._full(path_or_selector.base_dir),
                               path_or_selector.recursive,
                               path_or_selector.allow_not_found)
            return self.base_fs.get_file_info(sel)
        return self.base_fs.get_file_info(self._full(path_or_selector))

    def open_input_stream(self, path):
        return self.base_fs.open_input_stream(self._full(path))

    def open_output_stream(self, path):
        return self.base_fs.open_output_stream(self._full(path))

    def create_dir(self, path, recursive=True):
        return self.base_fs.create_dir(self._full(path), recursive)

    def delete_dir(self, path):
        return self.base_fs.delete_dir(self._full(path))

    def delete_file(self, path):
        return self.base_fs.delete_file(self._full(path))


class FsspecFileSystem(FileSystem):
    """Adapter exposing any fsspec filesystem through this FileSystem API
    (reference analogue: pyarrow's PyFileSystem + FSSpecHandler, which is
    how pyarrow itself reaches S3/GCS/Azure when the native builds are
    absent). Works with fsspec's memory/local/http/... protocols and, when
    the corresponding drivers are installed, s3/gcs/abfs/hdfs."""

    def __init__(self, fs):
        self.fs = fs

    @classmethod
    def from_uri(cls, protocol: str, **storage_options):
        import fsspec
        return cls(fsspec.filesystem(protocol, **storage_options))

    def _info(self, raw) -> FileInfo:
        t = FileType.Directory if raw.get("type") == "directory" \
            else FileType.File
        size = raw.get("size") or -1
        return FileInfo(raw["name"], t, size if size is not None else -1)

    def get_file_info(self, path_or_selector):
        if isinstance(path_or_selector, FileSelector):
            sel = path_or_selector
            try:
                raws = self.fs.ls(sel.base_dir, detail=True)
            except FileNotFoundError:
                if sel.allow_not_found:
                    return []
                raise
            out = [self._info(r) for r in raws]
            if sel.recursive:
                for r in list(raws):
                    if r.get("type") == "directory":
                        out.extend(self.get_file_info(
                            FileSelector(r["name"], True, True)))
            return out
        path = path_or_selector
        if not self.fs.exists(path):
            return FileInfo(path, FileType.NotFound)
        return self._info(self.fs.info(path))

    def open_input_stream(self, path: str):
        return self.fs.open(path, "rb")

    open_input_file = open_input_stream

    def open_output_stream(self, path: str):
        return self.fs.open(path, "wb")

    def create_dir(self, path: str, recursive: bool = True):
        self.fs.makedirs(path, exist_ok=True)

    def delete_dir(self, path: str):
        self.fs.rm(path, recursive=True)

    def delete_file(self, path: str):
        self.fs.rm_file(path) if hasattr(self.fs, "rm_file") \
            else self.fs.rm(path)

    def move(self, src: str, dest: str):
        self.fs.mv(src, dest)

    def equals(self, other) -> bool:
        return isinstance(other, FsspecFileSystem) and \
            self.fs == other.fs


def _fsspec_backed(protocol: str, doc_name: str):
    class _Cloud(FsspecFileSystem):
        __doc__ = (f"{doc_name} via fsspec (reference: "
                   f"filesystem/{protocol}fs.h). Requires the fsspec "
                   f"{protocol} driver package at construction time.")

        def __init__(self, **storage_options):
            import fsspec
            super().__init__(fsspec.filesystem(protocol,
                                               **storage_options))
    _Cloud.__name__ = doc_name
    return _Cloud


# fsspec-backed variants remain available for drivers this package does
# not speak natively (http, ftp, ...)
FsspecS3FileSystem = _fsspec_backed("s3", "FsspecS3FileSystem")
FsspecGcsFileSystem = _fsspec_backed("gcs", "FsspecGcsFileSystem")
FsspecAzureFileSystem = _fsspec_backed("abfs", "FsspecAzureFileSystem")
FsspecHadoopFileSystem = _fsspec_backed("hdfs", "FsspecHadoopFileSystem")

# native REST clients are the default cloud filesystems (reference:
# filesystem/s3fs.h, gcsfs.h, azurefs.h, hdfs.h). Resolved lazily
# (PEP 562) because those modules import this one for the base classes.
_NATIVE_FS = {"S3FileSystem": "fs_s3", "GcsFileSystem": "fs_gcs",
              "AzureFileSystem": "fs_azure",
              "HadoopFileSystem": "fs_hdfs"}


def __getattr__(name):
    mod = _NATIVE_FS.get(name)
    if mod is None:
        raise AttributeError(name)
    import importlib
    return getattr(importlib.import_module(f".{mod}", __package__),
                   name)


def __dir__():
    return sorted(list(globals()) + list(_NATIVE_FS))


# --- pyarrow.fs name parity --------------------------------------------------

FileStats = FileInfo  # deprecated pyarrow alias


class FileSystemHandler:
    """Abstract handler backing PyFileSystem (python/pyarrow/fs.py).
    Subclasses implement the filesystem primitives."""

    def get_type_name(self):
        raise NotImplementedError

    def get_file_info(self, paths):
        raise NotImplementedError

    def open_input_stream(self, path):
        raise NotImplementedError

    def open_output_stream(self, path, metadata=None):
        raise NotImplementedError


class PyFileSystem(FileSystem):
    """FileSystem over a python FileSystemHandler (pyarrow
    PyFileSystem)."""

    def __init__(self, handler):
        self.handler = handler

    @property
    def type_name(self):
        return self.handler.get_type_name()

    def get_file_info(self, paths):
        single = isinstance(paths, str)
        infos = self.handler.get_file_info(
            [paths] if single else list(paths))
        return infos[0] if single else infos

    def open_input_stream(self, path):
        return self.handler.open_input_stream(path)

    def open_input_file(self, path):
        return self.handler.open_input_stream(path)

    def open_output_stream(self, path, metadata=None):
        return self.handler.open_output_stream(path, metadata)

    def create_dir(self, path, recursive=True):
        return self.handler.create_dir(path, recursive)

    def delete_file(self, path):
        return self.handler.delete_file(path)

    def __getattr__(self, name):
        return getattr(self.handler, name)


class FSSpecHandler(FileSystemHandler):
    """Handler adapting an fsspec filesystem (pyarrow FSSpecHandler)."""

    def __init__(self, fs):
        self.fs = fs

    def get_type_name(self):
        return f"fsspec+{getattr(self.fs, 'protocol', '?')}"

    def get_file_info(self, paths):
        out = []
        for p in paths:
            try:
                info = self.fs.info(p)
                ftype = FileType.Directory if info.get("type") == \
                    "directory" else FileType.File
                out.append(FileInfo(p, ftype,
                                    size=info.get("size") or 0))
            except FileNotFoundError:
                out.append(FileInfo(p, FileType.NotFound))
        return out

    def open_input_stream(self, path):
        return self.fs.open(path, "rb")

    def open_output_stream(self, path, metadata=None):
        return self.fs.open(path, "wb")

    def create_dir(self, path, recursive=True):
        self.fs.makedirs(path, exist_ok=True)

    def delete_file(self, path):
        self.fs.rm(path)


class S3LogLevel:
    Off = 0
    Fatal = 1
    Error = 2
    Warn = 3
    Info = 4
    Debug = 5
    Trace = 6


class S3RetryStrategy:
    def __init__(self, max_attempts: int = 3):
        self.max_attempts = max_attempts


class AwsStandardS3RetryStrategy(S3RetryStrategy):
    pass


class AwsDefaultS3RetryStrategy(S3RetryStrategy):
    pass


_S3_INITIALIZED = [False]


def initialize_s3(log_level=None, num_event_loop_threads: int = 1):
    """S3 subsystem init (no-op: S3 rides the fsspec driver here)."""
    _S3_INITIALIZED[0] = True


def ensure_s3_initialized():
    _S3_INITIALIZED[0] = True


def finalize_s3():
    _S3_INITIALIZED[0] = False


def ensure_s3_finalized():
    _S3_INITIALIZED[0] = False


def resolve_s3_region(bucket: str) -> str:
    raise OSError("S3 region resolution requires network access "
                  "(unavailable in this environment)")


def copy_files(source, destination, source_filesystem=None,
               destination_filesystem=None, chunk_size=1024 * 1024,
               use_threads=True):
    """Copy files/directories between filesystems
    (pyarrow.fs.copy_files)."""
    src_fs = source_filesystem or LocalFileSystem()
    dst_fs = destination_filesystem or LocalFileSystem()
    info = src_fs.get_file_info(source)
    if isinstance(info, list):
        info = info[0]
    if info.type == FileType.Directory:
        sel = FileSelector(source, recursive=True)
        for fi in src_fs.get_file_info(sel):
            if fi.type != FileType.File:
                continue
            rel = fi.path[len(source):].lstrip("/")
            dst = f"{destination}/{rel}"
            parent = dst.rsplit("/", 1)[0]
            try:
                dst_fs.create_dir(parent, recursive=True)
            except Exception:
                pass
            with src_fs.open_input_stream(fi.path) as r, \
                    dst_fs.open_output_stream(dst) as w:
                w.write(r.read())
    else:
        with src_fs.open_input_stream(source) as r, \
                dst_fs.open_output_stream(destination) as w:
            w.write(r.read())
