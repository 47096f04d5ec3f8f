import os

# Tests run on CPU with 8 virtual devices so sharding tests work anywhere;
# Pallas kernels run in interpreter mode (webdgs_tpu.config.use_interpret_mode).
# Set WEBDGS_TEST_TPU=1 to run the suite against the real chip instead.
if os.environ.get("WEBDGS_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("WEBDGS_TEST_TPU") != "1":
    # The env var alone is not enough when a TPU platform plugin is
    # preloaded; the config update reliably pins the suite to CPU.
    jax.config.update("jax_platforms", "cpu")
else:
    # on-chip runs reuse compiled executables across tunnel windows
    from webdgs_tpu.config import enable_compilation_cache
    enable_compilation_cache()
jax.config.update("jax_enable_x64", False)
