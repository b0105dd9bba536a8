"""Parquet modular encryption (reference: cpp/src/parquet/encryption/).

Round-trips with direct keys, the KMS/CryptoFactory envelope layer, and
byte-level interop against pyarrow in both directions.
"""

import base64
import io
import os

import pytest

import arrow_tpu as at
from arrow_tpu.io.parquet import ParquetFile, read_table, write_table
from arrow_tpu.io.parquet.encryption import (
    ALG_AES_GCM_CTR_V1, CryptoFactory, DecryptionConfiguration,
    EncryptionConfiguration, FileDecryptionProperties,
    FileEncryptionProperties, KmsClient, KmsConnectionConfig)

FOOTER_KEY = b"0123456789112345"
COL_KEY = b"1234567890123450"


def _table():
    return at.table({
        "a": at.array([1, 2, 3, None, 5], at.int64()),
        "b": at.array(["x", "y", None, "w", "v"], at.string()),
        "c": at.array([1.5, 2.5, 3.5, 4.5, 5.5], at.float64()),
    })


def _assert_tables_equal(t1, t2):
    assert t1.num_rows == t2.num_rows
    for name in t1.schema.names:
        assert t1.column(name).to_pylist() == \
            t2.column(name).to_pylist(), name


def _roundtrip(enc_props, dec_props, **wkw):
    tbl = _table()
    buf = io.BytesIO()
    write_table(tbl, buf, encryption_properties=enc_props, **wkw)
    data = buf.getvalue()
    assert data[:4] == b"PARE" and data[-4:] == b"PARE"
    got = read_table(data, decryption_properties=dec_props)
    _assert_tables_equal(tbl, got)
    return data


def test_uniform_gcm_roundtrip():
    _roundtrip(FileEncryptionProperties(FOOTER_KEY),
               FileDecryptionProperties(footer_key=FOOTER_KEY))


def test_uniform_gcm_ctr_roundtrip():
    _roundtrip(FileEncryptionProperties(FOOTER_KEY,
                                        algorithm=ALG_AES_GCM_CTR_V1),
               FileDecryptionProperties(footer_key=FOOTER_KEY))


def test_column_keys_roundtrip():
    enc = FileEncryptionProperties(FOOTER_KEY,
                                   column_keys={"a": COL_KEY})
    dec = FileDecryptionProperties(footer_key=FOOTER_KEY,
                                   column_keys={"a": COL_KEY})
    _roundtrip(enc, dec)


def test_compressed_encrypted():
    _roundtrip(FileEncryptionProperties(FOOTER_KEY),
               FileDecryptionProperties(footer_key=FOOTER_KEY),
               compression="zstd")


def test_aad_prefix():
    enc = FileEncryptionProperties(FOOTER_KEY, aad_prefix=b"file1")
    dec = FileDecryptionProperties(footer_key=FOOTER_KEY)
    _roundtrip(enc, dec)


def test_wrong_key_fails():
    data = _roundtrip(FileEncryptionProperties(FOOTER_KEY),
                      FileDecryptionProperties(footer_key=FOOTER_KEY))
    with pytest.raises(Exception):
        read_table(data, decryption_properties=FileDecryptionProperties(
            footer_key=b"xxxxxxxxxxxxxxxx"))


def test_no_key_fails():
    data = _roundtrip(FileEncryptionProperties(FOOTER_KEY),
                      FileDecryptionProperties(footer_key=FOOTER_KEY))
    with pytest.raises(Exception):
        read_table(data)


def test_statistics_survive_encryption():
    data = _roundtrip(FileEncryptionProperties(FOOTER_KEY),
                      FileDecryptionProperties(footer_key=FOOTER_KEY))
    pf = ParquetFile(data, decryption_properties=FileDecryptionProperties(
        footer_key=FOOTER_KEY))
    st = pf.statistics(0)
    assert st["a"][0] == 1 and st["a"][1] == 5
    # row-group pruning + bloom filters on the encrypted file
    got = pf.read(filters=[("a", "=", 2)])
    assert got.column("a").to_pylist() == [2]


# --- KMS / CryptoFactory layer --------------------------------------------

MASTER_KEYS = {"kf": b"0123456789012345", "kc": b"1234567890123456"}


class _LocalWrapKms(KmsClient):
    """Test KMS: AES-GCM wrap under the master key (nonce||ct b64)."""

    def wrap_key(self, key_bytes, master_key_identifier):
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
        nonce = os.urandom(12)
        ct = AESGCM(MASTER_KEYS[master_key_identifier]).encrypt(
            nonce, key_bytes, b"")
        return base64.b64encode(nonce + ct).decode()

    def unwrap_key(self, wrapped_key, master_key_identifier):
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
        raw = base64.b64decode(wrapped_key)
        return AESGCM(MASTER_KEYS[master_key_identifier]).decrypt(
            raw[:12], raw[12:], b"")


@pytest.mark.parametrize("double_wrapping", [True, False])
def test_crypto_factory_roundtrip(double_wrapping):
    factory = CryptoFactory(lambda cfg: _LocalWrapKms())
    kms_cfg = KmsConnectionConfig()
    enc = factory.file_encryption_properties(
        kms_cfg, EncryptionConfiguration(
            footer_key="kf", column_keys={"kc": ["a", "b"]},
            double_wrapping=double_wrapping))
    dec = factory.file_decryption_properties(
        kms_cfg, DecryptionConfiguration())
    _roundtrip(enc, dec)


# --- pyarrow interop -------------------------------------------------------

pa = pytest.importorskip("pyarrow")
papq = pytest.importorskip("pyarrow.parquet")
pe = pytest.importorskip("pyarrow.parquet.encryption")


class _PyarrowKms(pe.KmsClient):
    def __init__(self, config=None):
        pe.KmsClient.__init__(self)

    def wrap_key(self, key_bytes, master_key_identifier):
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
        nonce = os.urandom(12)
        ct = AESGCM(MASTER_KEYS[master_key_identifier]).encrypt(
            nonce, key_bytes, b"")
        return base64.b64encode(nonce + ct)

    def unwrap_key(self, wrapped_key, master_key_identifier):
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM
        raw = base64.b64decode(wrapped_key)
        return AESGCM(MASTER_KEYS[master_key_identifier]).decrypt(
            raw[:12], raw[12:], b"")


def _pa_table():
    return pa.table({
        "a": pa.array([1, 2, 3, None, 5], pa.int64()),
        "b": pa.array(["x", "y", None, "w", "v"], pa.string()),
        "c": pa.array([1.5, 2.5, 3.5, 4.5, 5.5], pa.float64()),
    })


@pytest.mark.parametrize("algo", ["AES_GCM_V1", "AES_GCM_CTR_V1"])
def test_read_pyarrow_encrypted(tmp_path, algo):
    """pyarrow writes an encrypted file; our reader decrypts it."""
    path = str(tmp_path / "enc.parquet")
    pa_factory = pe.CryptoFactory(_PyarrowKms)
    kms_cfg = pe.KmsConnectionConfig()
    enc_cfg = pe.EncryptionConfiguration(
        footer_key="kf", column_keys={"kc": ["a", "b"]},
        encryption_algorithm=algo)
    props = pa_factory.file_encryption_properties(kms_cfg, enc_cfg)
    papq.write_table(_pa_table(), path, encryption_properties=props)

    our_factory = CryptoFactory(lambda cfg: _LocalWrapKms())
    dec = our_factory.file_decryption_properties(KmsConnectionConfig())
    got = read_table(path, decryption_properties=dec)
    _assert_tables_equal(_table(), got)


@pytest.mark.parametrize("algo", ["AES_GCM_V1", "AES_GCM_CTR_V1"])
def test_pyarrow_reads_ours(tmp_path, algo):
    """We write an encrypted file; pyarrow decrypts it."""
    path = str(tmp_path / "enc2.parquet")
    our_factory = CryptoFactory(lambda cfg: _LocalWrapKms())
    enc = our_factory.file_encryption_properties(
        KmsConnectionConfig(), EncryptionConfiguration(
            footer_key="kf", column_keys={"kc": ["a", "b"]},
            encryption_algorithm=algo))
    write_table(_table(), path, encryption_properties=enc)

    pa_factory = pe.CryptoFactory(_PyarrowKms)
    dec = pa_factory.file_decryption_properties(
        pe.KmsConnectionConfig(), pe.DecryptionConfiguration())
    got = papq.read_table(path, decryption_properties=dec)
    want = _pa_table()
    assert got.num_rows == want.num_rows
    for name in ("a", "b", "c"):
        assert got.column(name).to_pylist() == \
            want.column(name).to_pylist(), name


def test_create_properties_helpers():
    """pyarrow.parquet.encryption.create_*_properties direct-key API."""
    from arrow_tpu.io.parquet.encryption import (
        create_decryption_properties, create_encryption_properties)
    enc = create_encryption_properties(FOOTER_KEY, aad_prefix=b"p1")
    dec = create_decryption_properties(FOOTER_KEY)
    _roundtrip(enc, dec)
    # store_aad_prefix=False: the reader must supply the prefix
    enc2 = create_encryption_properties(FOOTER_KEY, aad_prefix=b"p2",
                                        store_aad_prefix=False)
    tbl = _table()
    buf = io.BytesIO()
    write_table(tbl, buf, encryption_properties=enc2)
    with pytest.raises(Exception):
        read_table(buf.getvalue(),
                   decryption_properties=create_decryption_properties(
                       FOOTER_KEY))
    got = read_table(buf.getvalue(),
                     decryption_properties=create_decryption_properties(
                         FOOTER_KEY, aad_prefix=b"p2"))
    _assert_tables_equal(tbl, got)


# --- plaintext-footer mode ---------------------------------------------------

def test_plaintext_footer_roundtrip():
    enc = FileEncryptionProperties(FOOTER_KEY, plaintext_footer=True)
    dec = FileDecryptionProperties(footer_key=FOOTER_KEY)
    tbl = _table()
    buf = io.BytesIO()
    write_table(tbl, buf, encryption_properties=enc)
    data = buf.getvalue()
    assert data[:4] == b"PAR1" and data[-4:] == b"PAR1"
    _assert_tables_equal(tbl, read_table(data,
                                         decryption_properties=dec))
    # legacy reader sees the schema; encrypted columns need keys
    pf = ParquetFile(data)
    assert pf.schema_arrow.names == ["a", "b", "c"]
    # wrong key -> signature verification fails
    with pytest.raises(Exception):
        read_table(data, decryption_properties=FileDecryptionProperties(
            footer_key=b"x" * 16))


def test_plaintext_footer_column_keys_mixed():
    enc = FileEncryptionProperties(FOOTER_KEY,
                                   column_keys={"a": COL_KEY},
                                   plaintext_footer=True)
    dec = FileDecryptionProperties(footer_key=FOOTER_KEY,
                                   column_keys={"a": COL_KEY})
    tbl = _table()
    buf = io.BytesIO()
    write_table(tbl, buf, encryption_properties=enc)
    _assert_tables_equal(tbl, read_table(buf.getvalue(),
                                         decryption_properties=dec))
    # plaintext columns remain readable without any keys
    pf = ParquetFile(buf.getvalue())
    assert pf.read(columns=["b"]).column("b").to_pylist() == \
        ["x", "y", None, "w", "v"]


def test_plaintext_footer_pyarrow_interop(tmp_path):
    """Both directions via the KMS layer with plaintext_footer=True."""
    our_factory = CryptoFactory(lambda cfg: _LocalWrapKms())
    enc = our_factory.file_encryption_properties(
        KmsConnectionConfig(), EncryptionConfiguration(
            footer_key="kf", column_keys={"kc": ["a"]},
            plaintext_footer=True))
    p1 = str(tmp_path / "ours.parquet")
    write_table(_table(), p1, encryption_properties=enc)
    pa_dec = pe.CryptoFactory(_PyarrowKms).file_decryption_properties(
        pe.KmsConnectionConfig())
    got = papq.ParquetFile(p1, decryption_properties=pa_dec).read()
    want = _pa_table()
    for name in ("a", "b", "c"):
        assert got.column(name).to_pylist() == \
            want.column(name).to_pylist(), name

    pa_enc = pe.CryptoFactory(_PyarrowKms).file_encryption_properties(
        pe.KmsConnectionConfig(), pe.EncryptionConfiguration(
            footer_key="kf", column_keys={"kc": ["a"]},
            plaintext_footer=True))
    p2 = str(tmp_path / "theirs.parquet")
    papq.write_table(_pa_table(), p2, encryption_properties=pa_enc)
    dec = our_factory.file_decryption_properties(KmsConnectionConfig())
    _assert_tables_equal(_table(),
                         read_table(p2, decryption_properties=dec))
