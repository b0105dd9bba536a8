"""Device-resident execution layer (JAX/XLA/Pallas)."""

import jax

# The engine needs 64-bit integers (keys, counts) and float64 (bit-exact
# aggregation vs the reference). XLA emulates 64-bit on TPU where needed.
jax.config.update("jax_enable_x64", True)

from .column import (  # noqa: F401,E402
    BLOCK, DeviceBatch, DeviceColumn, download_batch, download_column,
    download_table, jnp_dtype_for, round_up, upload_batch, upload_column,
    upload_table,
)
