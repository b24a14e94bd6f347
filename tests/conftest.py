"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-device tests (data-parallel step parity, sync-BN, psum'd metrics) run on CPU with
XLA host-platform device virtualisation — no TPU needed for the test suite.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

# The environment's site customisation can force JAX_PLATFORMS back to the TPU plugin;
# pin the platform through the config API as well (must run before any backend init).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# persistent compilation cache: model-forward compiles are expensive on CPU
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_fiery_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
