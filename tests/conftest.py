"""Test config: force a virtual 8-device CPU mesh so sharding paths are exercised
without TPU hardware (SURVEY.md §4: fake-backend strategy).

NB: the axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
jax.config.update call below is what actually pins tests to CPU.
"""
import os

xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache makes repeated test runs cheap
cache_dir = os.path.join(os.path.dirname(__file__), '..', '.jax_cache')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(cache_dir))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
