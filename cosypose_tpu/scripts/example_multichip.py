"""Multi-chip smoke test.

Capability match for the reference's ``cosypose/scripts/example_multigpu.py``
(:1-17, the README's parallelization check): print the device mesh, run one
sharded computation, verify the all-reduce. On a single-chip or CPU host, run
with XLA_FLAGS=--xla_force_host_platform_device_count=8 to emulate 8 devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel import make_mesh
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main():
    logger.info(f"process {jax.process_index()}/{jax.process_count()}")
    logger.info(f"devices: {jax.devices()}")
    mesh = make_mesh()
    logger.info(f"mesh: {mesh}")

    n = len(jax.devices())
    x = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
    x = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def global_sum(x):
        return x.sum()

    total = float(global_sum(x))
    expected = float(jnp.arange(n * 4).sum())
    assert abs(total - expected) < 1e-3, (total, expected)
    logger.info(f"all-reduce over {n} devices ok: {total}")


if __name__ == "__main__":
    main()
