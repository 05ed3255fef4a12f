import os

# Parity tests run in f64 on a virtual 8-device CPU mesh; must be configured
# before jax initializes.  LIDP_TEST_TPU=1 keeps the real accelerator so the
# TPU-gated Mosaic-precision tests (test_df_panels.py) can run on hardware.
if os.environ.get("LIDP_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if os.environ.get("LIDP_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
