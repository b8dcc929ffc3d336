"""Library-level outage immunity (utils/backend_guard).

Through a half-dead TPU tunnel, jax backend init hangs FOREVER with no
exception to catch; the guard probes init in a killable subprocess so
CLIs and BlockEncoder fail over to the host path instead of hanging
(VERDICT r3 next #4).  The hang is simulated for real here: the env
hook MINNOW_TPU_TEST_HANG_BACKEND=1 makes the probe child sleep
indefinitely, so the parent's timeout machinery is what passes these
tests.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from minnow_tpu.formats import minh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HANG_ENV = {
    "MINNOW_TPU_FORCE_PROBE": "1",       # treat the env as tunneled
    "MINNOW_TPU_TEST_HANG_BACKEND": "1",  # probe child sleeps forever
    "MINNOW_TPU_BACKEND_PROBE_TIMEOUT": "3",
}


def _hang_env():
    env = dict(os.environ)
    env.update(HANG_ENV)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _write_minh(path):
    cols = [minh.Column(type=minh.Int),
            minh.Column(type=minh.Float, low=0.0, high=250.0, dx=0.001)]
    w = minh.create(path)
    w.header(["id", "x"], "guard test", cols)
    w.geometry(250.0, 0, 0)
    w.block([np.arange(100, dtype=np.int64),
             np.linspace(0, 249, 100).astype(np.float32)])
    w.close()


def test_probe_times_out_on_hanging_init():
    """The probe itself must return None within the timeout, not hang.
    Runs in a subprocess so this process's backend-initialized state
    (the suite initializes jax) cannot short-circuit the probe."""
    code = (
        "from minnow_tpu.utils import backend_guard\n"
        "r = backend_guard.probe()\n"
        "assert r is None, r\n"
        "assert backend_guard.device_or_host(True) is False\n"
        "assert backend_guard.device_or_host(False) is False\n"
        "print('GUARD_OK')\n")
    p = subprocess.run([sys.executable, "-c", code], env=_hang_env(),
                       cwd=REPO, capture_output=True, text=True,
                       timeout=60)
    assert p.returncode == 0, p.stderr
    assert "GUARD_OK" in p.stdout
    assert "falling back to the host path" in p.stderr


def test_cli_device_completes_on_host_path_when_init_hangs(tmp_path):
    """--device CLI on a dead backend must warn and complete on the
    host path (identical output), never hang in backend init."""
    fname = str(tmp_path / "guard.minh")
    _write_minh(fname)
    p = subprocess.run(
        [sys.executable, "-m", "minnow_tpu.cli.inspect_minh",
         "--device", fname],
        env=_hang_env(), cwd=REPO, capture_output=True, text=True,
        timeout=120)
    assert p.returncode == 0, p.stderr
    assert "falling back to the host path" in p.stderr
    # host-path run (no --device, no hang hooks) must match stdout
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    q = subprocess.run(
        [sys.executable, "-m", "minnow_tpu.cli.inspect_minh", fname],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=120)
    assert q.returncode == 0, q.stderr
    assert p.stdout == q.stdout


def test_block_encoder_raises_instead_of_hanging():
    code = (
        "from minnow_tpu.parallel import BlockEncoder\n"
        "from minnow_tpu.utils import backend_guard\n"
        "try:\n"
        "    BlockEncoder()\n"
        "except backend_guard.BackendUnavailableError:\n"
        "    print('RAISED_OK')\n")
    p = subprocess.run([sys.executable, "-c", code], env=_hang_env(),
                       cwd=REPO, capture_output=True, text=True,
                       timeout=60)
    assert p.returncode == 0, p.stderr
    assert "RAISED_OK" in p.stdout


def test_probe_trusts_local_backend():
    """No tunnel in play -> no subprocess spawn, returns the live
    backend name (cpu under the suite)."""
    from minnow_tpu.utils import backend_guard

    assert backend_guard.probe() == "cpu"
    assert backend_guard.device_or_host(True) is True


@pytest.mark.parametrize("assume", ["tpu", "cpu"])
def test_probe_assume_escape_hatch(monkeypatch, assume):
    from minnow_tpu.utils import backend_guard

    monkeypatch.setenv("MINNOW_TPU_BACKEND_ASSUME", assume)
    assert backend_guard.probe() == assume


def test_compile_cache_threshold_is_zero(tmp_path, monkeypatch):
    """ensure_compile_cache must set min_compile_time to 0: on
    remote-compile (tunneled) backends jax's measured compile time can
    undershoot a ~1 s threshold even when the compile RPC takes tens
    of wall-clock seconds, leaving the persistent cache silently empty
    (observed: every bench run re-paid every compile all round)."""
    import jax

    from minnow_tpu.utils import backend_guard

    monkeypatch.setenv("MINNOW_TPU_COMPILE_CACHE", str(tmp_path / "jc"))
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        backend_guard.ensure_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "jc")
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min)


def test_compile_cache_captures_entries(tmp_path):
    """End-to-end: a jit compile under ensure_compile_cache must land a
    serialized executable on disk.  The config-level test above cannot
    catch a capture regression (round 4's silently-empty cache passed
    every config check -- the threshold gating happened at write time),
    so this one compiles for real in a child process and counts files."""
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ['MINNOW_TPU_COMPILE_CACHE'] = %r\n"
        "from minnow_tpu.utils import backend_guard\n"
        "backend_guard.ensure_compile_cache()\n"
        "import jax, jax.numpy as jnp\n"
        "print(jax.jit(lambda x: (x * 3 + 1).sum())"
        "(jnp.arange(97.0)).item())\n" % str(tmp_path / "jc")
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=180,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    entries = [f for f in os.listdir(tmp_path / "jc")
               if not f.startswith(".")]
    assert entries, "no persistent-cache entry written by a real compile"
