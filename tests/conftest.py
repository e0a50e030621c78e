"""Test env: force an 8-virtual-device CPU platform BEFORE jax initializes.

Multi-chip data parallelism is tested here via
``--xla_force_host_platform_device_count=8`` device emulation (no pod needed);
the driver's ``dryrun_multichip`` does the same. Real-TPU benchmarking happens
in ``bench.py``, not under pytest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
