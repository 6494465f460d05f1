"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing
the host platform and splitting it into 8 virtual devices, mirroring
the driver's ``dryrun_multichip`` check.

NB: this image pre-imports jax in sitecustomize (axon TPU plugin), so
environment variables alone are too late — use jax.config.update, which
takes effect because no backend has been *used* yet at conftest time.
"""
import os

if os.environ.get("CSW_TEST_TPU"):
    # real-chip mode: leave the TPU backend alone so the TPU-marked
    # tests (Mosaic ring gather, 1-device-mesh shard_map production
    # path) actually run; the rest of the suite is CPU-designed — run
    # only the TPU-marked nodes under this flag
    import jax  # noqa: F401
else:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # XLA_FLAGS fallback above covers older jax
