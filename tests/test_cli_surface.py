"""Every CLI command exposes working --help (catches lazy-import breakage)."""

import subprocess
import sys

import pytest

COMMANDS = ['train', 'trainlaunch', 'serialize', 'test', 'test-wsi',
            'wsi-cells', 'eval', 'serve', 'compute-statistics',
            'prepare-training-data', 'prepare-testing-data', 'visualize',
            'register']


@pytest.mark.parametrize('cmd', COMMANDS)
def test_cli_help(cmd):
    res = subprocess.run(
        [sys.executable, '-m', 'deepliif_tpu.cli', cmd, '--help'],
        capture_output=True, text=True, cwd='/root/repo', timeout=120,
        env={'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin:/opt/venv/bin'})
    assert res.returncode == 0, res.stderr[-500:]
    assert 'Usage' in res.stdout
