"""Deadline-bounded platform self-check.

Reference analogue: util/cpu_info.h — the reference detects hardware
capabilities at startup (AVX2/AVX512 flags) and picks kernel dispatch
levels automatically. This module plays the same role for the TPU
engine: it probes the attached JAX platform with *hard deadlines* and
derives safe defaults for the availability knobs
(ARROW_TPU_PALLAS_AGG / ARROW_TPU_SYNC_NODES / ARROW_TPU_MOVEMENT)
instead of relying on hand-set environment variables.

Why subprocess probes: on the tunneled "axon" TPU platform the remote
Mosaic (Pallas) compiler can hang an RPC *forever*, and a hung compile
wedges the device for every process on the host for ~10 minutes
(observed round 2, VERDICT.md weak #1). An in-process probe with no
deadline therefore cannot be allowed anywhere near the default path.
Every probe here runs in a child process killed at its deadline; a
timeout is recorded as a negative result and cached so later processes
never repeat it.

Policy for the Pallas gate specifically:
  * env ARROW_TPU_PALLAS_AGG=on|off always wins (handled by callers);
  * tunneled axon platform -> OFF without probing (a probe can poison
    the device even from a subprocess);
  * real local TPU -> one subprocess probe with a deadline, cached;
  * cpu/gpu -> OFF (the kernels are TPU Mosaic kernels).

Cache file: <repo>/.platform_probe.json keyed by (jax version,
platform, JAX_PLATFORMS) so a stale cache from a different attachment
is ignored.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from typing import Any, Dict, Optional

__all__ = ["self_check", "cached_probe", "pallas_allowed",
           "platform_kind", "probe_cache_path"]

_PROBE: Optional[Dict[str, Any]] = None


def probe_cache_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.access(root, os.W_OK):
        return os.path.join(root, ".platform_probe.json")
    return os.path.join(tempfile.gettempdir(), "arrow_tpu_probe.json")


def _cache_key() -> str:
    import jax
    return "|".join([jax.__version__,
                     os.environ.get("JAX_PLATFORMS", ""),
                     _platform_name()])


def _platform_name() -> str:
    import jax
    try:
        return jax.devices()[0].platform
    except Exception:
        return "unknown"


def platform_kind() -> str:
    """Classify the attachment: 'axon' (tunneled TPU), 'tpu' (local),
    'cpu', or 'other'. The tunnel is identified by the JAX_PLATFORMS
    env or the device platform string itself."""
    name = _platform_name()
    if name == "axon" or "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return "axon"
    if name == "tpu":
        return "tpu"
    if name == "cpu":
        return "cpu"
    return "other"


def cached_probe() -> Optional[Dict[str, Any]]:
    """Read the probe cache; None when absent or keyed differently."""
    global _PROBE
    if _PROBE is not None:
        return _PROBE
    try:
        with open(probe_cache_path()) as f:
            data = json.load(f)
        if data.get("key") == _cache_key():
            _PROBE = data
            return data
    except Exception:
        pass
    return None


def _write_cache(data: Dict[str, Any]) -> None:
    global _PROBE
    _PROBE = data
    path = probe_cache_path()
    try:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except Exception:
        pass


_PALLAS_PROBE_SRC = """
import jax, jax.numpy as jnp, numpy as np
import jax.experimental.pallas as pl
def _probe(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] * 2.0
x = jnp.zeros((8, 128), jnp.float32)
out = pl.pallas_call(_probe,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
assert float(np.asarray(out[0, 0])) == 0.0
print("PALLAS_OK")
"""

_F64_BITCAST_PROBE_SRC = """
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
x = jnp.asarray(np.array([1.5, -0.0, 5e-324], np.float64))
planes = jax.jit(
    lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32))(x)
back = jax.jit(
    lambda p: jax.lax.bitcast_convert_type(p, jnp.float64))(planes)
assert np.asarray(back).view(np.uint64).tolist() == \\
    np.array([1.5, -0.0, 5e-324]).view(np.uint64).tolist()
print("F64_BITCAST_OK")
"""

_JIT_PROBE_SRC = """
import time, jax, jax.numpy as jnp, numpy as np
t0 = time.perf_counter()
# 4096 elements: the f32 sum (8386560) is exactly representable, so the
# equality check is valid on every backend (a 2^20 arange sum is NOT --
# it exceeds f32's 2^24 integer range and rounds)
x = jnp.arange(4096, dtype=jnp.float32)
s = float(np.asarray(jax.jit(lambda v: v.sum())(x)))
assert s == 4096 * 4095 / 2, s
print("JIT_OK", time.perf_counter() - t0)
"""


def _run_probe(src: str, deadline: float) -> Dict[str, Any]:
    """Run probe source in a child with a hard deadline. The child is
    killed (and its whole process group with it) on timeout so a hung
    Mosaic RPC cannot outlive the deadline."""
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", src], capture_output=True, text=True,
            timeout=deadline, start_new_session=True)
        ok = proc.returncode == 0
        tail = (proc.stdout + proc.stderr).strip().splitlines()
        return {"ok": ok, "secs": time.perf_counter() - t0,
                "tail": tail[-1][:200] if tail else ""}
    except subprocess.TimeoutExpired:
        return {"ok": False, "secs": deadline, "tail": "deadline"}
    except Exception as exc:  # pragma: no cover
        return {"ok": False, "secs": time.perf_counter() - t0,
                "tail": repr(exc)[:200]}


def self_check(force: bool = False, jit_deadline: float = 120.0,
               pallas_deadline: float = 90.0,
               probe_pallas_on_axon: bool = False) -> Dict[str, Any]:
    """Run the platform probe suite (cached across processes).

    Returns {"kind", "trivial_jit", "pallas", "chosen": {knobs}}. The
    Pallas probe is skipped entirely on the tunneled axon platform
    unless explicitly requested: even a subprocess probe can wedge the
    shared device there (VERDICT.md round 2)."""
    cached = None if force else cached_probe()
    if cached is not None:
        return cached
    kind = platform_kind()
    result: Dict[str, Any] = {"key": _cache_key(), "kind": kind,
                              "ts": time.time()}
    if kind == "cpu":
        result["trivial_jit"] = {"ok": True, "secs": 0.0, "tail": "cpu"}
        result["pallas"] = {"ok": False, "secs": 0.0,
                            "tail": "cpu platform: TPU kernels n/a"}
        result["f64_bitcast"] = {"ok": True, "secs": 0.0, "tail": "cpu"}
    else:
        result["trivial_jit"] = _run_probe(_JIT_PROBE_SRC, jit_deadline)
        # only probe further when basic jit works — a wedged device
        # makes every extra probe another hung process
        if result["trivial_jit"]["ok"]:
            result["f64_bitcast"] = _run_probe(_F64_BITCAST_PROBE_SRC,
                                               jit_deadline)
        else:
            result["f64_bitcast"] = {"ok": False, "secs": 0.0,
                                     "tail": "skipped: trivial jit failed"}
        if kind == "axon" and not probe_pallas_on_axon:
            result["pallas"] = {
                "ok": False, "secs": 0.0,
                "tail": "axon tunnel: probe skipped (Mosaic compile "
                        "hang wedges the shared device)"}
        else:
            result["pallas"] = _run_probe(_PALLAS_PROBE_SRC,
                                          pallas_deadline)
    result["chosen"] = {
        "pallas_agg": "on" if result["pallas"]["ok"] else "off",
        "sync_nodes": "on" if kind == "axon" else "off",
        "movement": "auto",
        "f64_planes": "bitcast" if result["f64_bitcast"]["ok"] else "off",
    }
    _write_cache(result)
    return result


def pallas_measured(name: str) -> bool:
    """True when a chip session measured the Pallas path named `name`
    ('compact', 'group_sum') FASTER than the XLA path on this platform
    and banked it in the probe cache (chip_session_r5.py bank_probe).
    The movement layer auto-selects Pallas only on this evidence —
    never from a bare compile-probe."""
    cached = cached_probe()
    if not cached:
        return False
    return bool(cached.get("measured", {}).get(name)) and \
        bool(cached.get("pallas", {}).get("ok"))


def pallas_allowed() -> bool:
    """Availability of the Pallas TPU kernel tier, probe-backed.

    Never probe-compiles in this process (see module docstring). Reads
    the cached self-check; when absent, runs the subprocess suite for
    real TPU platforms and returns the safe default (False) for the
    axon tunnel and cpu."""
    kind = platform_kind()
    cached = cached_probe()
    if cached is not None:
        return bool(cached.get("pallas", {}).get("ok"))
    if kind in ("cpu", "axon", "other", "unknown"):
        return False
    return bool(self_check()["pallas"]["ok"])
