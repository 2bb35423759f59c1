import os

# Tests run on a virtual 8-device CPU mesh; f64 is enabled so parity tests can
# match the reference's f64 maths exactly. The axon sitecustomize pins
# jax_platforms to the tunneled TPU, so override via the config (env vars are
# ignored) before any backend is initialised.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
