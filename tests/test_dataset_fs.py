"""Filesystem + dataset layer tests."""

import os

from arrow_tpu import fs

import pytest

import arrow_tpu as at
from arrow_tpu import dataset as ds
from arrow_tpu.acero import field
from arrow_tpu.fs import (FileSelector, FileType, LocalFileSystem,
                          MockFileSystem, SubTreeFileSystem)


def test_local_fs(tmp_path):
    fs = LocalFileSystem()
    p = str(tmp_path / "a" / "f.bin")
    with fs.open_output_stream(p) as f:
        f.write(b"hello")
    info = fs.get_file_info(p)
    assert info.is_file and info.size == 5
    with fs.open_input_stream(p) as f:
        assert f.read() == b"hello"
    infos = fs.get_file_info(FileSelector(str(tmp_path), recursive=True))
    assert any(i.path.endswith("f.bin") for i in infos)
    fs.delete_file(p)
    assert fs.get_file_info(p).type == FileType.NotFound


def test_mock_fs():
    fs = MockFileSystem()
    with fs.open_output_stream("dir/x.txt") as f:
        f.write(b"abc")
    assert fs.get_file_info("dir/x.txt").size == 3
    assert fs.get_file_info("dir").type == FileType.Directory
    with fs.open_input_stream("dir/x.txt") as f:
        assert f.read() == b"abc"
    infos = fs.get_file_info(FileSelector("dir"))
    assert [i.path for i in infos if i.is_file] == ["dir/x.txt"]
    fs.move("dir/x.txt", "y.txt")
    assert fs.get_file_info("dir/x.txt").type == FileType.NotFound
    assert fs.get_file_info("y.txt").is_file


def test_subtree_fs(tmp_path):
    base = LocalFileSystem()
    sub = SubTreeFileSystem(str(tmp_path), base)
    with sub.open_output_stream("inner/f.txt") as f:
        f.write(b"z")
    assert (tmp_path / "inner" / "f.txt").exists()
    assert sub.get_file_info("inner/f.txt").is_file


@pytest.fixture
def sample_table():
    return at.table({"year": [2020, 2020, 2021, 2021, 2022],
                     "v": [1.0, 2.0, 3.0, 4.0, 5.0],
                     "s": ["a", "b", "c", "d", "e"]})


@pytest.mark.parametrize("fmt", ["parquet", "ipc", "csv"])
def test_dataset_roundtrip_formats(tmp_path, sample_table, fmt):
    d = str(tmp_path / fmt)
    ds.write_dataset(sample_table, d, format=fmt)
    data = ds.dataset(d, format=fmt)
    back = data.to_table()
    assert back.num_rows == 5
    assert sorted(back.column_names) == ["s", "v", "year"]


def test_hive_partitioned_roundtrip_and_pruning(tmp_path, sample_table):
    d = str(tmp_path / "hive")
    ds.write_dataset(sample_table, d, partitioning=["year"],
                     partitioning_flavor="hive")
    data = ds.dataset(d, partitioning=ds.partitioning(flavor="hive"))
    assert data.to_table().num_rows == 5

    pruned = data.to_table(filter=(field("year") == 2021))
    assert sorted(pruned.to_pydict()["v"]) == [3.0, 4.0]
    # fragments actually pruned, not just filtered
    frags = list(data.get_fragments(field("year") == 2021))
    assert len(frags) == 1

    mixed = data.to_table(filter=(field("year") == 2021)
                          & (field("v") > 3.0))
    assert mixed.to_pydict()["v"] == [4.0]

    sel = data.to_table(columns=["v", "year"])
    assert sel.column_names == ["v", "year"]


def test_directory_partitioning(tmp_path, sample_table):
    d = str(tmp_path / "dirpart")
    ds.write_dataset(sample_table, d, partitioning=["year"])
    part = ds.partitioning(at.schema([("year", at.int64())]))
    data = ds.dataset(d, partitioning=part)
    t = data.to_table(filter=(field("year") == 2022))
    assert t.to_pydict()["v"] == [5.0]


def test_pyarrow_reads_our_dataset(tmp_path, sample_table):
    pads = pytest.importorskip("pyarrow.dataset")
    d = str(tmp_path / "interop")
    ds.write_dataset(sample_table, d, partitioning=["year"],
                     partitioning_flavor="hive")
    pa_ds = pads.dataset(d, partitioning="hive")
    assert pa_ds.to_table().num_rows == 5


def test_our_dataset_reads_pyarrow_written(tmp_path, sample_table):
    pads = pytest.importorskip("pyarrow.dataset")
    import pyarrow as pa
    import pyarrow.parquet  # noqa: F401
    d = str(tmp_path / "pa_written")
    pads.write_dataset(
        pa.table(sample_table.to_pydict()), d, format="parquet",
        partitioning=["year"], partitioning_flavor="hive",
        file_options=pads.ParquetFileFormat().make_write_options(
            compression="zstd"))
    data = ds.dataset(d, partitioning=ds.partitioning(flavor="hive"))
    t = data.to_table()
    assert t.num_rows == 5
    assert sorted(t.to_pydict()["year"]) == [2020, 2020, 2021, 2021, 2022]


def test_mock_fs_dataset(sample_table):
    fs = MockFileSystem()
    ds.write_dataset(sample_table, "root", format="ipc", filesystem=fs)
    data = ds.dataset("root", format="ipc", filesystem=fs)
    assert data.to_table().num_rows == 5


def test_fragment_readahead_threaded(tmp_path, sample_table):
    """Threaded fragment readahead (dataset/scanner.h fragment_readahead
    analogue): same rows, same order as serial scan."""
    d = str(tmp_path / "ra")
    ds.write_dataset(sample_table, d, partitioning=["year"])
    data = ds.dataset(d, partitioning=ds.partitioning(flavor="hive"))
    serial = data.to_table(use_threads=False)
    threaded = data.to_table(fragment_readahead=4)
    assert threaded.to_pydict() == serial.to_pydict()
    one = data.to_table(fragment_readahead=1)
    assert one.to_pydict() == serial.to_pydict()


# --- fsspec adapter (fs.FsspecFileSystem vs pyarrow PyFileSystem) -----------


class TestFsspecFileSystem:
    def test_memory_protocol_full_surface(self):
        pytest.importorskip("fsspec")
        m = fs.FsspecFileSystem.from_uri("memory")
        with m.open_output_stream("/bkt/dir/a.bin") as f:
            f.write(b"hello")
        info = m.get_file_info("/bkt/dir/a.bin")
        assert info.is_file and info.size == 5
        sel = fs.FileSelector("/bkt", recursive=True)
        paths = [i.path for i in m.get_file_info(sel)]
        assert "/bkt/dir/a.bin" in paths
        with m.open_input_stream("/bkt/dir/a.bin") as f:
            assert f.read() == b"hello"
        m.move("/bkt/dir/a.bin", "/bkt/dir/b.bin")
        assert m.get_file_info("/bkt/dir/a.bin").type == \
            fs.FileType.NotFound
        m.delete_file("/bkt/dir/b.bin")

    def test_parquet_roundtrip_through_fsspec(self):
        pytest.importorskip("fsspec")
        import io as _io

        from arrow_tpu.io.parquet import read_table, write_table
        m = fs.FsspecFileSystem.from_uri("memory")
        t = at.table({"a": [1, 2, 3], "s": ["x", None, "z"]})
        buf = _io.BytesIO()
        write_table(t, buf)
        with m.open_output_stream("/data/p.parquet") as f:
            f.write(buf.getvalue())
        with m.open_input_stream("/data/p.parquet") as f:
            assert read_table(f).to_pydict() == t.to_pydict()

    def test_cloud_classes(self):
        pytest.importorskip("fsspec")
        # fsspec-backed variants: drivers absent in this env -> clean
        # ImportError at construction
        for cls in (fs.FsspecS3FileSystem, fs.FsspecAzureFileSystem):
            with pytest.raises(ImportError):
                cls()
        # gcsfs is installed: construction works (network calls would
        # need egress, which tests never do)
        pytest.importorskip("gcsfs")
        assert fs.FsspecGcsFileSystem(token="anon") is not None


# --- dataset compat classes (dataset/dataset.h variants) --------------------


class TestDatasetCompat:
    def test_in_memory_and_union(self):
        t = at.table({"a": [1, 2, 3]})
        imd = ds.InMemoryDataset(t)
        assert imd.to_table().num_rows == 3
        u = ds.UnionDataset(None, [imd, ds.InMemoryDataset(t)])
        assert u.to_table().num_rows == 6

    def test_orc_and_json_formats(self, tmp_path):
        t = at.table({"a": [1, 2, 3], "s": ["x", "y", None]})
        root = str(tmp_path / "orc_ds")
        ds.write_dataset(t, root, format="orc")
        back = ds.dataset(root, format="orc").to_table()
        assert sorted(back.column("a").to_pylist()) == [1, 2, 3]
        jdir = tmp_path / "json_ds"
        jdir.mkdir()
        (jdir / "j.json").write_text('{"a": 1}\n{"a": 2}\n')
        jt = ds.dataset(str(jdir), format="json").to_table()
        assert sorted(jt.column("a").to_pylist()) == [1, 2]

    def test_filesystem_dataset_and_partition_keys(self, tmp_path):
        from arrow_tpu.acero import field
        t = at.table({"a": [1, 2]})
        root = str(tmp_path / "fsd")
        ds.write_dataset(t, root, format="parquet")
        files = [str(p) for p in (tmp_path / "fsd").iterdir()]
        fsd = ds.FileSystemDataset.from_paths(files, format="parquet")
        assert fsd.files == files
        assert fsd.to_table().num_rows == 2
        e = (field("p") == 1) & (field("q") == "x")
        assert ds.get_partition_keys(e) == {"p": 1, "q": "x"}


# --- emulated S3 (native client, arrow_tpu/fs_s3.py) ------------------------

def _s3_fs():
    from s3_emulator import S3Emulator
    from arrow_tpu.fs_s3 import S3FileSystem
    em = S3Emulator()
    em.__enter__()
    s3 = S3FileSystem(access_key="test", secret_key="secret",
                      endpoint_override=em.endpoint,
                      allow_bucket_creation=True)
    return em, s3


def test_s3_file_roundtrip():
    em, s3 = _s3_fs()
    with em:
        s3.create_dir("bkt")
        with s3.open_output_stream("bkt/dir/a.bin") as f:
            f.write(b"hello s3")
        info = s3.get_file_info("bkt/dir/a.bin")
        assert info.is_file and info.size == 8
        with s3.open_input_stream("bkt/dir/a.bin") as f:
            assert f.read() == b"hello s3"
        # selector: file + synthesized directory entries
        infos = s3.get_file_info(FileSelector("bkt", recursive=True))
        assert any(i.path == "bkt/dir/a.bin" and i.is_file
                   for i in infos)
        assert any(i.path == "bkt/dir"
                   and i.type == FileType.Directory for i in infos)
        s3.move("bkt/dir/a.bin", "bkt/dir/b.bin")
        assert s3.get_file_info("bkt/dir/a.bin").type == \
            FileType.NotFound
        assert s3.get_file_info("bkt/dir/b.bin").size == 8
        s3.delete_file("bkt/dir/b.bin")
        assert s3.get_file_info("bkt/dir/b.bin").type == \
            FileType.NotFound


def test_s3_partitioned_dataset_scan_and_prune(sample_table):
    em, s3 = _s3_fs()
    with em:
        s3.create_dir("lake")
        ds.write_dataset(sample_table, "lake/t", partitioning=["year"],
                         partitioning_flavor="hive", filesystem=s3)
        data = ds.dataset("lake/t",
                          partitioning=ds.partitioning(flavor="hive"),
                          filesystem=s3)
        t = data.to_table()
        assert t.num_rows == 5
        assert sorted(t.to_pydict()["year"]) == \
            [2020, 2020, 2021, 2021, 2022]
        # partition pruning: only matching years survive
        pruned = data.to_table(filter=field("year") == 2021)
        assert pruned.num_rows == 2
        assert set(pruned.to_pydict()["year"]) == {2021}


def test_s3_dataset_matches_local(tmp_path, sample_table):
    em, s3 = _s3_fs()
    with em:
        s3.create_dir("lake")
        ds.write_dataset(sample_table, "lake/t2", format="ipc",
                         filesystem=s3)
        local_dir = str(tmp_path / "local_t2")
        ds.write_dataset(sample_table, local_dir, format="ipc")
        via_s3 = ds.dataset("lake/t2", format="ipc",
                            filesystem=s3).to_table()
        via_local = ds.dataset(local_dir, format="ipc").to_table()
        a = {k: sorted(map(repr, v))
             for k, v in via_s3.to_pydict().items()}
        b = {k: sorted(map(repr, v))
             for k, v in via_local.to_pydict().items()}
        assert a == b


# --- emulated GCS / Azure / WebHDFS (native clients) ------------------------
# Reference analogues: gcsfs_test.cc (fake-gcs-server), azurefs_test.cc
# (Azurite), libhdfs minicluster tests. One shared battery runs each
# native client through object ops + a partitioned dataset round trip.

def _gcs_fs():
    from cloud_emulators import GcsEmulator
    from arrow_tpu.fs_gcs import GcsFileSystem
    em = GcsEmulator()
    em.__enter__()
    return em, GcsFileSystem(access_token="tok",
                             endpoint_override=em.endpoint,
                             project_id="p", scheme="http")


def _azure_fs():
    import base64
    from cloud_emulators import AzureEmulator
    from arrow_tpu.fs_azure import AzureFileSystem
    em = AzureEmulator()
    em.__enter__()
    key = base64.b64encode(b"secretsecretsecret").decode()
    return em, AzureFileSystem(
        "acct", account_key=key,
        blob_storage_authority=em.endpoint, scheme="http")


def _hdfs_fs():
    from cloud_emulators import WebHdfsEmulator
    from arrow_tpu.fs_hdfs import HadoopFileSystem
    em = WebHdfsEmulator()
    em.__enter__()
    host, port = em.host_port
    return em, HadoopFileSystem(host, port, user="u")


def _file_battery(fs, base):
    fs.create_dir(base)
    with fs.open_output_stream(f"{base}/dir/a.bin") as f:
        f.write(b"hello cloud")
    info = fs.get_file_info(f"{base}/dir/a.bin")
    assert info.is_file and info.size == 11
    with fs.open_input_stream(f"{base}/dir/a.bin") as f:
        assert f.read() == b"hello cloud"
    infos = fs.get_file_info(FileSelector(base, recursive=True))
    assert any(i.path.endswith("dir/a.bin") and i.is_file
               for i in infos)
    assert any(i.path.endswith("dir") and
               i.type == FileType.Directory for i in infos)
    fs.move(f"{base}/dir/a.bin", f"{base}/dir/b.bin")
    assert fs.get_file_info(f"{base}/dir/a.bin").type == \
        FileType.NotFound
    assert fs.get_file_info(f"{base}/dir/b.bin").size == 11
    fs.delete_file(f"{base}/dir/b.bin")
    assert fs.get_file_info(f"{base}/dir/b.bin").type == \
        FileType.NotFound


def _dataset_battery(fs, base, sample_table):
    fs.create_dir(base)
    ds.write_dataset(sample_table, f"{base}/t", partitioning=["year"],
                     partitioning_flavor="hive", filesystem=fs)
    data = ds.dataset(f"{base}/t",
                      partitioning=ds.partitioning(flavor="hive"),
                      filesystem=fs)
    t = data.to_table()
    assert t.num_rows == 5
    pruned = data.to_table(filter=field("year") == 2021)
    assert pruned.num_rows == 2


def test_gcs_file_roundtrip():
    em, fs = _gcs_fs()
    with em:
        _file_battery(fs, "bkt")


def test_gcs_partitioned_dataset(sample_table):
    em, fs = _gcs_fs()
    with em:
        _dataset_battery(fs, "lake", sample_table)


def test_azure_file_roundtrip():
    em, fs = _azure_fs()
    with em:
        _file_battery(fs, "ctr")


def test_azure_partitioned_dataset(sample_table):
    em, fs = _azure_fs()
    with em:
        _dataset_battery(fs, "lake", sample_table)


def test_hdfs_file_roundtrip():
    em, fs = _hdfs_fs()
    with em:
        _file_battery(fs, "/data")


def test_hdfs_partitioned_dataset(sample_table):
    em, fs = _hdfs_fs()
    with em:
        _dataset_battery(fs, "/lake", sample_table)


def test_native_clients_are_default_names():
    """arrow_tpu.fs exposes the native REST clients under the pyarrow
    names (filesystem/s3fs.h, gcsfs.h, azurefs.h, hdfs.h)."""
    from arrow_tpu import fs as afs
    assert afs.S3FileSystem.__module__ == "arrow_tpu.fs_s3"
    assert afs.GcsFileSystem.__module__ == "arrow_tpu.fs_gcs"
    assert afs.AzureFileSystem.__module__ == "arrow_tpu.fs_azure"
    assert afs.HadoopFileSystem.__module__ == "arrow_tpu.fs_hdfs"
