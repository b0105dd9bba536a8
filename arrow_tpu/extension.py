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


for _cls in (UuidType, JsonType, Bool8Type, OpaqueType):
    register_extension_type(_cls, _cls.EXTENSION_NAME)
