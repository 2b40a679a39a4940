import os

# Tests run on a virtual 8-device CPU mesh so sharding is exercised without
# TPUs; bench.py / training run on the real chip.
#
# NOTE: this machine's sitecustomize registers a remote "axon" TPU backend
# and force-updates jax's platform config at interpreter start, overriding
# JAX_PLATFORMS from the environment — so we must update the config again
# here, before any jax computation runs.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
