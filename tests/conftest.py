import os
import sys

# Tests run on a virtual 8-device CPU mesh; set before any jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS and installs itself as the
# default backend; pin computation placement to the virtual CPU mesh so
# the suite never compiles through the (slow, single-chip) TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
