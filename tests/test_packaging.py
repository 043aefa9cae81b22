"""Packaging gate (VERDICT r3 #6): `pip install -e .` must produce a
working installation — library importable without PYTHONPATH, CLI tools
importable as ``stereotracking_tpu.tools.*`` and runnable via their console
entry points.  Reference analog: /root/reference/setup.py:1-51 (installable
mmtrack package).

The test venv is seeded with a .pth to this interpreter's site-packages so
the baked-in jax/numpy stack is visible (no network in this environment;
the editable install itself runs --no-deps --no-build-isolation).
"""
import os
import subprocess
import sys
import sysconfig
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope='module')
def venv(tmp_path_factory):
    root = tmp_path_factory.mktemp('pkg') / 'venv'
    subprocess.run([sys.executable, '-m', 'venv', str(root)], check=True)
    # expose the parent environment's packages (jax etc.)
    sp = subprocess.run(
        [str(root / 'bin' / 'python'), '-c',
         "import sysconfig; print(sysconfig.get_paths()['purelib'])"],
        capture_output=True, text=True, check=True).stdout.strip()
    (Path(sp) / '_parent.pth').write_text(
        sysconfig.get_paths()['purelib'] + '\n')
    r = subprocess.run(
        [str(root / 'bin' / 'pip'), 'install', '--no-deps',
         '--no-build-isolation', '--quiet', '-e', str(REPO)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    return root


def _env():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PYTHONPATH', None)  # the install must stand on its own
    return env


def test_editable_install_imports(venv):
    r = subprocess.run(
        [str(venv / 'bin' / 'python'), '-c',
         'import stereotracking_tpu\n'
         'import stereotracking_tpu.tools.test as t\n'
         'import stereotracking_tpu.tools.train as tr\n'
         'import stereotracking_tpu.tools.misc.print_config as pc\n'
         'assert all(hasattr(m, "main") for m in (t, tr, pc))\n'
         'print("ok")'],
        env=_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'ok' in r.stdout


def test_console_entry_points(venv):
    for script in ('sttpu-test', 'sttpu-train', 'sttpu-print-config'):
        r = subprocess.run([str(venv / 'bin' / script), '--help'],
                           env=_env(), capture_output=True, text=True,
                           timeout=300)
        assert r.returncode == 0, (script, r.stderr[-2000:])
        assert 'usage' in r.stdout.lower()


def test_print_config_through_entry_point(venv, tmp_path):
    """A real tool run through the installed entry point: print the
    flagship config's merged _base_ chain."""
    cfg = REPO / 'configs' / 'stereo_tracking' / 'ocsort' / \
        'yolox_s_airdrone_disp.py'
    r = subprocess.run([str(venv / 'bin' / 'sttpu-print-config'), str(cfg)],
                       env=_env(), capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'OCSORT_Disparity' in r.stdout
