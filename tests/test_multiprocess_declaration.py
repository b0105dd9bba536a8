"""Multi-host Declaration execution (round-4 verdict item 7): the FULL
``to_table(distributed=True)`` path — hash-exchange join, SPMD
aggregate spine and range-exchange sort — across 2 jax.distributed
processes with Gloo collectives, mirroring test_multiprocess.py's
harness (SURVEY §4 archery process-pair pattern). Results must equal
the single-process local execution computed inside each worker."""

import os
import socket
import subprocess
import sys
import textwrap


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
    from arrow_tpu.acero import dist_exec
    from arrow_tpu.acero.exec import Declaration
    from arrow_tpu.acero.options import (AggregateNodeOptions,
                                         FilterNodeOptions,
                                         HashJoinNodeOptions,
                                         OrderByNodeOptions,
                                         TableSourceNodeOptions)
    from arrow_tpu.acero.expression import field
    from arrow_tpu.parallel.distributed import make_mesh

    rng = np.random.default_rng(11)
    n = 3000
    left = at.table({
        "k": at.array([int(v) for v in rng.integers(0, 37, n)],
                      at.int64()),
        "v": at.array([float(v) for v in rng.normal(size=n)]),
    })
    right = at.table({
        "k": at.array(list(range(0, 50, 2)), at.int64()),
        "w": at.array([float(-i) for i in range(25)]),
    })
    mesh = make_mesh()

    def check(name, decl, expect_kinds):
        dist_exec.reset_exchange_counts()
        dist = decl.to_table(distributed=True, mesh=mesh)
        for kind in expect_kinds:
            assert dist_exec.EXCHANGE_COUNTS[kind] >= 1, (
                name, dist_exec.EXCHANGE_COUNTS)
        local = decl.to_table()
        assert dist.column_names == local.column_names, name
        assert dist.num_rows == local.num_rows, (
            name, dist.num_rows, local.num_rows)
        dd, dl = dist.to_pydict(), local.to_pydict()
        for col in dist.column_names:
            a, b = dd[col], dl[col]
            assert [x is None for x in a] == [x is None for x in b], (
                name, col)
            fa = [0.0 if x is None else x for x in a]
            fb = [0.0 if x is None else x for x in b]
            if any(isinstance(x, float) for x in fa):
                for x, y in zip(fa, fb):
                    assert abs(x - y) <= 1e-9 * max(abs(x), abs(y), 1.0), \\
                        (name, col, x, y)
            else:
                assert fa == fb, (name, col)
        print(f"proc {pid}: {name} OK rows={dist.num_rows}", flush=True)

    lsrc = Declaration("table_source", TableSourceNodeOptions(left))
    rsrc = Declaration("table_source", TableSourceNodeOptions(right))

    # 1. join (filter pre-chain sharded in the exchange program) ->
    #    terminal aggregate: all_to_all + SPMD spine across processes
    join = Declaration("hashjoin", HashJoinNodeOptions(
        "inner", left_keys=["k"], right_keys=["k"],
        right_output=["w"]), inputs=[
            Declaration("filter", FilterNodeOptions(field("v") > -1.0),
                        inputs=[lsrc]), rsrc])
    agg = Declaration("aggregate", AggregateNodeOptions(
        [("v", "hash_sum", None, "v_sum"),
         ("w", "hash_count", None, "w_n")], keys=["k"]), inputs=[join])
    check("join+aggregate", agg, ["join_exchange", "spmd_aggregate"])

    # 2. range-exchange sort across processes
    sort = Declaration("order_by", OrderByNodeOptions(
        [("v", "descending"), ("k", "ascending")]), inputs=[lsrc])
    check("sort", sort, ["sort_exchange"])

    # 3. outer join type through the exchange across processes
    outer = Declaration("hashjoin", HashJoinNodeOptions(
        "full outer", left_keys=["k"], right_keys=["k"],
        output_suffix_for_left="_l", output_suffix_for_right="_r"),
        inputs=[lsrc, rsrc])
    check("full-outer", outer, ["join_exchange"])
""")


def test_two_process_declaration_paths(tmp_path):
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
        for name in ("join+aggregate", "sort", "full-outer"):
            assert f"proc {i}: {name} OK" in out, (name, out[-2000:])
