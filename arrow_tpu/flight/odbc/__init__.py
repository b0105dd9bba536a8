"""Flight SQL ODBC driver (reference: cpp/src/arrow/flight/sql/odbc/).

``driver_path()`` lazily builds the native driver shared library
(driver.cpp — a dependency-free ODBC 3.x driver any driver manager can
load) and returns its path. The driver forwards statements to an
``arrow_tpu.flight.odbc_gateway.OdbcGateway``, which executes them on a
Flight SQL endpoint. Connection string:

    Driver=<driver_path()>;Gateway_Host=127.0.0.1;Gateway_Port=<port>
"""

from __future__ import annotations

import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "driver.cpp")
_SO = os.path.join(_DIR, "libarrow_tpu_odbc.so")
_lock = threading.Lock()
_failed = False


def driver_path() -> Optional[str]:
    """Path to the built ODBC driver .so, or None if the toolchain is
    unavailable."""
    global _failed
    if _failed:
        return None
    with _lock:
        if os.path.exists(_SO) and \
                os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                 "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        except Exception:  # noqa: BLE001
            _failed = True
            return None
    return _SO
