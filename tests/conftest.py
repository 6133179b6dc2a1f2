import os

# Run the test suite on a virtual 8-device CPU mesh: fast, deterministic, and
# exercises the same sharding code paths the driver dry-runs. The axon TPU
# plugin force-prepends itself via JAX_PLATFORMS, so set the config directly.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
