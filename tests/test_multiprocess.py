"""Multi-host validation via jax.distributed with N local processes.

SURVEY §4 translation: archery's cross-process integration pattern maps
to one jax process per simulated host — two OS processes each owning 4
virtual CPU devices join a jax.distributed coordinator, form one global
8-device mesh, and run the distributed group-by (local partial agg ->
all_to_all -> final agg) end-to-end with Gloo cross-process collectives.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.parallel import (DistAggSpec, distributed_groupby,
                                    make_mesh, shard_table)

    rng = np.random.default_rng(7)
    n = 4000
    ks = [f"g{v}" for v in rng.integers(0, 13, n)]
    vs = [float(v) for v in rng.normal(size=n)]
    t = at.table({"k": ks, "v": vs})

    mesh = make_mesh()
    db = shard_table(mesh, t)
    out = distributed_groupby(mesh, db, ["k"], [
        DistAggSpec("v", "sum", "v_sum"),
        DistAggSpec("v", "count", "v_count"),
    ])

    expected_sum, expected_cnt = {}, {}
    for k, v in zip(ks, vs):
        expected_sum[k] = expected_sum.get(k, 0.0) + v
        expected_cnt[k] = expected_cnt.get(k, 0) + 1
    got = {r["k"]: (r["v_sum"], r["v_count"]) for r in out.to_pylist()}
    assert set(got) == set(expected_sum), (sorted(got),
                                           sorted(expected_sum))
    for k in expected_sum:
        s, c = got[k]
        assert c == expected_cnt[k], (k, c, expected_cnt[k])
        assert abs(s - expected_sum[k]) < 1e-9 * max(1, abs(expected_sum[k]))
    print(f"proc {pid}: OK groups={len(got)}", flush=True)
""")


def test_two_process_distributed_groupby(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i}: OK" in out, out[-2000:]
