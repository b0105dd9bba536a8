import numpy as np, time
import arrow_tpu.device
import jax, jax.numpy as jnp
from arrow_tpu.compute import move, pallas_move
rng = np.random.default_rng(0)
nm = 1 << 22
f64 = jax.device_put(rng.normal(size=nm))
keys512 = jax.device_put(rng.integers(0, 512, nm).astype(np.int32))

def timed(name, fn, args, bytes_moved):
    t0 = time.perf_counter()
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(leaves[0].ravel()[:1])[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10): out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(leaves[0].ravel()[:1])[0])
    dt = (time.perf_counter() - t0) / 10
    print(f"{name}: {dt*1e3:.2f} ms, {bytes_moved/dt/1e9:.2f} GB/s (compile {compile_s:.1f}s)", flush=True)

timed("copy_roofline", jax.jit(lambda v: v + 1.0), (f64,), 2*8*nm)

def compact4_x(v):
    keep = v > 0
    outs, cnt = move.compact_by_mask(keep, [v, v*2, v*3, v*4])
    return outs[0], cnt
timed("compact4_xla_sort", jax.jit(compact4_x), (f64,), 2*4*8*nm)

def compact4_p(v):
    keep = v > 0
    outs = pallas_move.compact_arrays_pallas(keep, [v, v*2, v*3, v*4])
    return outs[0]
timed("compact4_pallas", jax.jit(compact4_p), (f64,), 2*4*8*nm)

timed("gsum512_xla", jax.jit(lambda v, g: move.segment_reduce(v, g, 512, "sum", 0.0)), (f64, keys512), 2*8*nm)
timed("gsum512_pallas", jax.jit(lambda v, g: pallas_move.grouped_sum_pallas(v, g, 512)), (f64, keys512), 2*8*nm)
keys8 = jax.device_put(rng.integers(0, 8, nm).astype(np.int32))
timed("gsum8_pallas", jax.jit(lambda v, g: pallas_move.grouped_sum_pallas(v, g, 8)), (f64, keys8), 2*8*nm)
print("DONE", flush=True)
