"""Extension types: user-defined logical types over storage types.

Reference analogue: cpp/src/arrow/extension_type.h:39 + registry (:131) and
the built-ins under cpp/src/arrow/extension/. Wire representation follows
the spec: the storage type plus field metadata keys ``ARROW:extension:name``
and ``ARROW:extension:metadata``.
"""

from __future__ import annotations

from typing import Dict, Optional

from .types import DataType, TypeId


class ExtensionType(DataType):
    __slots__ = ("storage_type", "extension_name_")

    def __init__(self, storage_type: DataType, extension_name: str):
        super().__init__(TypeId.EXTENSION)
        object.__setattr__(self, "storage_type", storage_type)
        object.__setattr__(self, "extension_name_", extension_name)

    @property
    def extension_name(self) -> str:
        return self.extension_name_

    def extension_metadata(self) -> bytes:
        """Serialized parameters (override in subclasses)."""
        return b""

    @classmethod
    def deserialize(cls, storage_type: DataType,
                    metadata: bytes) -> "ExtensionType":
        raise NotImplementedError

    @property
    def fields(self):
        return self.storage_type.fields

    @property
    def bit_width(self):
        return self.storage_type.bit_width

    @property
    def byte_width(self):
        return self.storage_type.byte_width

    def _key(self):
        return (int(self.id), self.extension_name_,
                self.storage_type._key(), self.extension_metadata())

    def __repr__(self):
        return (f"extension<{self.extension_name_}, "
                f"storage={self.storage_type!r}>")


_REGISTRY: Dict[str, type] = {}


def register_extension_type(ext_type_cls, name: Optional[str] = None):
    """Register by extension name so IPC/C-ABI readers can reconstruct."""
    if name is None:
        probe = ext_type_cls.__new__(ext_type_cls)
        name = getattr(ext_type_cls, "EXTENSION_NAME", None)
        if name is None:
            raise ValueError("pass name= or set EXTENSION_NAME")
    _REGISTRY[name] = ext_type_cls


def unregister_extension_type(name: str):
    _REGISTRY.pop(name, None)


def lookup_extension_type(name: str) -> Optional[type]:
    return _REGISTRY.get(name)


def reconstruct(storage_type: DataType, name: str,
                metadata: bytes) -> DataType:
    cls = _REGISTRY.get(name)
    if cls is None:
        return storage_type  # unknown extension: fall back to storage
    return cls.deserialize(storage_type, metadata)


# --- built-ins (reference: cpp/src/arrow/extension/) -----------------------

class UuidType(ExtensionType):
    EXTENSION_NAME = "arrow.uuid"

    def __init__(self):
        from . import types as T
        super().__init__(T.fixed_size_binary(16), self.EXTENSION_NAME)

    @classmethod
    def deserialize(cls, storage_type, metadata):
        return cls()


class JsonType(ExtensionType):
    EXTENSION_NAME = "arrow.json"

    def __init__(self, storage_type=None):
        from . import types as T
        super().__init__(storage_type or T.string(), self.EXTENSION_NAME)

    @classmethod
    def deserialize(cls, storage_type, metadata):
        return cls(storage_type)


class Bool8Type(ExtensionType):
    EXTENSION_NAME = "arrow.bool8"

    def __init__(self):
        from . import types as T
        super().__init__(T.int8(), self.EXTENSION_NAME)

    @classmethod
    def deserialize(cls, storage_type, metadata):
        return cls()


class OpaqueType(ExtensionType):
    EXTENSION_NAME = "arrow.opaque"

    def __init__(self, storage_type, type_name: str = "",
                 vendor_name: str = ""):
        super().__init__(storage_type, self.EXTENSION_NAME)
        object.__setattr__(self, "type_name", type_name)
        object.__setattr__(self, "vendor_name", vendor_name)

    def extension_metadata(self) -> bytes:
        import json
        return json.dumps({"type_name": self.type_name,
                           "vendor_name": self.vendor_name}).encode()

    @classmethod
    def deserialize(cls, storage_type, metadata):
        import json
        d = json.loads(metadata or b"{}")
        return cls(storage_type, d.get("type_name", ""),
                   d.get("vendor_name", ""))


class FixedShapeTensorType(ExtensionType):
    """Canonical fixed-shape tensor extension
    (cpp/src/arrow/extension/fixed_shape_tensor.h): storage is
    fixed_size_list(value_type, prod(shape)); metadata is JSON with
    shape / permutation / dim_names."""

    EXTENSION_NAME = "arrow.fixed_shape_tensor"

    def __init__(self, value_type: DataType, shape,
                 dim_names=None, permutation=None):
        import math
        from . import types as T
        shape = list(int(s) for s in shape)
        size = math.prod(shape) if shape else 1
        super().__init__(T.fixed_size_list(value_type, size),
                         self.EXTENSION_NAME)
        object.__setattr__(self, "value_type", value_type)
        object.__setattr__(self, "shape", shape)
        object.__setattr__(self, "dim_names",
                           list(dim_names) if dim_names else None)
        object.__setattr__(self, "permutation",
                           list(permutation) if permutation else None)

    def extension_metadata(self) -> bytes:
        import json
        d = {"shape": self.shape}
        if self.permutation:
            d["permutation"] = self.permutation
        if self.dim_names:
            d["dim_names"] = self.dim_names
        return json.dumps(d).encode()

    @classmethod
    def deserialize(cls, storage_type, metadata):
        import json
        d = json.loads(metadata or b"{}")
        return cls(storage_type.value_type, d.get("shape", []),
                   d.get("dim_names"), d.get("permutation"))


class VariableShapeTensorType(ExtensionType):
    """Canonical variable-shape tensor extension
    (cpp/src/arrow/extension/variable_shape_tensor.h): storage is
    struct<data: list(value_type), shape: fixed_size_list(int32, ndim)>."""

    EXTENSION_NAME = "arrow.variable_shape_tensor"

    def __init__(self, value_type: DataType, ndim: int,
                 dim_names=None, permutation=None,
                 uniform_shape=None):
        from . import types as T
        storage = T.struct([
            ("data", T.list_(value_type)),
            ("shape", T.fixed_size_list(T.int32(), int(ndim)))])
        super().__init__(storage, self.EXTENSION_NAME)
        object.__setattr__(self, "value_type", value_type)
        object.__setattr__(self, "ndim", int(ndim))
        object.__setattr__(self, "dim_names",
                           list(dim_names) if dim_names else None)
        object.__setattr__(self, "permutation",
                           list(permutation) if permutation else None)
        object.__setattr__(self, "uniform_shape",
                           list(uniform_shape) if uniform_shape else None)

    def extension_metadata(self) -> bytes:
        import json
        d: Dict = {}
        if self.permutation:
            d["permutation"] = self.permutation
        if self.dim_names:
            d["dim_names"] = self.dim_names
        if self.uniform_shape:
            d["uniform_shape"] = self.uniform_shape
        return json.dumps(d).encode()

    @classmethod
    def deserialize(cls, storage_type, metadata):
        import json
        d = json.loads(metadata or b"{}")
        shape_f = storage_type.fields[1].type
        return cls(storage_type.fields[0].type.value_type,
                   shape_f.list_size, d.get("dim_names"),
                   d.get("permutation"), d.get("uniform_shape"))


# --- pyarrow-style factory functions ---------------------------------------

def uuid() -> UuidType:
    return UuidType()


def json_(storage_type=None) -> JsonType:
    return JsonType(storage_type)


def bool8() -> Bool8Type:
    return Bool8Type()


def opaque(storage_type, type_name: str = "",
           vendor_name: str = "") -> OpaqueType:
    return OpaqueType(storage_type, type_name, vendor_name)


def fixed_shape_tensor(value_type, shape, dim_names=None,
                       permutation=None) -> FixedShapeTensorType:
    return FixedShapeTensorType(value_type, shape, dim_names, permutation)


def variable_shape_tensor(value_type, ndim, dim_names=None,
                          permutation=None,
                          uniform_shape=None) -> VariableShapeTensorType:
    return VariableShapeTensorType(value_type, ndim, dim_names,
                                   permutation, uniform_shape)


class ExtensionArray:
    """Array of an extension type over its storage array (reference:
    cpp/src/arrow/extension_type.h ExtensionArray). Wraps the storage
    array; values/pylist delegate to storage."""

    def __init__(self, type: ExtensionType, storage):
        self.type = type
        self.storage = storage

    @classmethod
    def from_storage(cls, typ: ExtensionType, storage) -> "ExtensionArray":
        if storage.type != typ.storage_type:
            raise TypeError(
                f"storage type {storage.type!r} does not match "
                f"{typ.storage_type!r}")
        if isinstance(typ, FixedShapeTensorType):
            return FixedShapeTensorArray(typ, storage)
        return cls(typ, storage)

    def __len__(self):
        return len(self.storage)

    @property
    def null_count(self):
        return self.storage.null_count

    def to_pylist(self):
        return self.storage.to_pylist()

    def __repr__(self):
        return (f"<arrow_tpu.ExtensionArray {self.type!r}>"
                f"\n{self.to_pylist()!r}")


class FixedShapeTensorArray(ExtensionArray):
    """Tensor-valued array (extension/fixed_shape_tensor.h
    FixedShapeTensorArray)."""

    def to_numpy_ndarray(self):
        import numpy as np
        n = len(self.storage)
        flat = np.asarray(
            [v for row in self.storage.to_pylist() for v in row])
        return flat.reshape([n] + list(self.type.shape))

    @classmethod
    def from_numpy_ndarray(cls, arr) -> "FixedShapeTensorArray":
        import numpy as np
        from . import types as T
        from .array.array import array as make_array
        arr = np.asarray(arr)
        if arr.ndim < 2:
            raise ValueError("need at least 2 dimensions "
                             "(batch + tensor dims)")
        np_to_at = {"float32": T.float32, "float64": T.float64,
                    "int8": T.int8, "int16": T.int16, "int32": T.int32,
                    "int64": T.int64, "uint8": T.uint8,
                    "uint16": T.uint16, "uint32": T.uint32,
                    "uint64": T.uint64, "float16": T.float16}
        vt = np_to_at[str(arr.dtype)]()
        shape = list(arr.shape[1:])
        typ = FixedShapeTensorType(vt, shape)
        size = 1
        for s in shape:
            size *= s
        storage = make_array(
            arr.reshape(arr.shape[0], size).tolist(),
            T.fixed_size_list(vt, size))
        return cls(typ, storage)


for _cls in (UuidType, JsonType, Bool8Type, OpaqueType,
             FixedShapeTensorType, VariableShapeTensorType):
    register_extension_type(_cls, _cls.EXTENSION_NAME)
