"""Local CHIPLESS Mosaic/XLA AOT compile harness — real error messages.

The remote axon compile helper hides every Mosaic failure behind
"HTTP 500: tpu_compile_helper subprocess exit code 1". The local jaxlib
ships libtpu, which can AOT-compile for a v5e topology WITHOUT a chip
and surfaces the actual Mosaic errors ("unsupported shape cast",
scoped-vmem OOM with sizes, etc.) in ~seconds instead of ~4-minute
remote probes.

Usage (NOTE the env: CPU platform + TPU topology vars):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  TPU_ACCELERATOR_TYPE=v5litepod-1 TPU_WORKER_HOSTNAMES=localhost \
  python -c "from tools.aot_compile import aot_compile; aot_compile(f, *shape_structs)"

Caveat: the LOCAL libtpu (pip `libtpu`) is not the same build as the
remote helper's — a kernel can AOT-compile locally and still 500
remotely (e.g. lane-concat of shifted sublane slices). Local success is
necessary-not-sufficient; use this to fix local errors first, then
verify once against the chip.
"""

import jax


def aot_compile(f, *args):
    """Compile `f(*args)` (ShapeDtypeStructs) for a v5e:1x1x1 topology."""
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1x1",
        chips_per_host_bounds=[1, 1, 1])
    dev = topo.devices[0]
    with jax.default_device(dev):
        lowered = jax.jit(f).trace(*args).lower()
        return lowered.compile()
