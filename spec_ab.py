import numpy as np, time, os
import arrow_tpu.device
import jax
from arrow_tpu.io.tpch_device import q3_device_plan
plan, n = q3_device_plan(0.1)
plan.to_table()  # warm compile
for label, env in (("spec_off", "off"), ("spec_on", "on"), ("spec_off2", "off")):
    os.environ["ARROW_TPU_SPECULATIVE_CAPS"] = env
    plan.to_table()  # warm the spec cache / settle
    t0 = time.perf_counter()
    for _ in range(8):
        out = plan.to_table()
    dt = (time.perf_counter() - t0) / 8
    print(f"{label}: {dt*1e3:.1f} ms/iter, {n/dt/1e6:.2f}M rows/s", flush=True)
print("rows_out:", out.num_rows, "DONE", flush=True)
