"""Quarantined experimental kernels (round-4 verdict item 10).

PARITY NOTE: the Pallas TPU kernels here (float-float grouped sum,
u32 xxhash32) are bit-exact against their XLA counterparts in Pallas
interpreter mode (tests/test_pallas_agg.py), but deliver ZERO value on
the only TPU path available to this engine: the tunneled Mosaic
compiler rejects some of these kernels and can hang the compile RPC
indefinitely (platform_check.py probes this in a deadlined child
process). They are therefore NOT wired into any engine execution path;
the engine's hot ops ride XLA lowerings (compute/move.py,
compute/hashing.py). Re-evaluate if a directly-attached TPU platform
becomes available.
"""
