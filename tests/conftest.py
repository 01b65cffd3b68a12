"""Test config: force an 8-device virtual CPU mesh so sharding paths are exercised
without TPU hardware (SURVEY.md §4: fake-backend strategy)."""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()
