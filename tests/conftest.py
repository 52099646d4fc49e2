import os
import sys

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding tests rely
# on it). The axon TPU plugin force-selects itself via jax.config at
# interpreter start (sitecustomize), so env vars alone are not enough —
# override the config after import. Benches use the real chip instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
