"""Test env: force an 8-virtual-device CPU platform BEFORE jax initializes.

Multi-chip data parallelism is tested here via
``--xla_force_host_platform_device_count=8`` device emulation (no pod needed);
the driver's ``dryrun_multichip`` does the same. Real-TPU benchmarking happens
in ``bench.py``, not under pytest.
"""

import os

# NOTE: this environment's axon TPU plugin ignores the JAX_PLATFORMS env var
# and the --xla_force_host_platform_device_count XLA flag; only programmatic
# config updates (before first backend use) are honored.
import jax  # noqa: E402

# ISTNET_TPU_TESTS=1 keeps the real TPU backend so the `tpu`-marked
# on-device kernel-parity tier can run (ISTNET_TPU_TESTS=1 python -m pytest
# -m tpu tests/); everything else runs on 8 virtual CPU devices.
if os.environ.get("ISTNET_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the test runner has ONE cpu core; full-model
# grad graphs take minutes to compile the first time, milliseconds after.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
