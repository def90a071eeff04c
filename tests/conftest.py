"""Test configuration: run all tests on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (replaces the
reference's GPU-count conditional skips, SURVEY.md section 4)."""

import os

# Force CPU even though the environment pre-imports jax with a TPU platform:
# jax captures JAX_PLATFORMS at import, so use config.update (backend
# creation is lazy; XLA_FLAGS is read at client creation, so setting it here
# still yields 8 virtual CPU devices).
# remember the rig's real platform so opt-in hardware tests
# (test_tpu_hardware.py) can restore it in their subprocesses
os.environ.setdefault('DEEPLIIF_ORIG_JAX_PLATFORMS',
                      os.environ.get('JAX_PLATFORMS', ''))
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


def cpu_subprocess_env(**extra):
    """os.environ copy for a CPU-forced child process, with the TPU
    platform plugin stripped: the plugin's sitecustomize initializes its
    backend eagerly at interpreter start (ignoring JAX_PLATFORMS=cpu), so
    a tunnel outage would hang otherwise-CPU-only subprocess tests.
    test_tpu_hardware.py builds its own env to keep the plugin."""
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    for k in [k for k in env if k.startswith('PALLAS_AXON')
              or k == 'AXON_LOOPBACK_RELAY']:
        env.pop(k)
    pp = [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
          if p and 'axon' not in os.path.basename(p.rstrip('/'))]
    if pp:
        env['PYTHONPATH'] = os.pathsep.join(pp)
    else:
        env.pop('PYTHONPATH', None)
    env.update(extra)
    return env


@pytest.fixture(scope='session')
def rng_key():
    import jax
    return jax.random.PRNGKey(0)
