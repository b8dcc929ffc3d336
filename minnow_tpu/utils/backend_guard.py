"""Bounded JAX backend-init probe: library-level outage immunity.

Backend init through a tunneled TPU relay can hang *forever* when the
relay is half-dead (the port accepts but the orchestrator is gone) --
observed repeatedly in this environment: ``jax.devices()`` blocked
>240 s with no exception to catch.  An in-process try/except can never
recover from that, so the probe runs ``import jax`` in a killable
subprocess with a hard timeout, exactly the pattern bench.py uses to
survive outages (VERDICT r3 next #4 asked for the library to get the
same immunity).

Usage (CLI / library device paths)::

    from minnow_tpu.utils import backend_guard
    backend = backend_guard.probe()          # name, or None on outage
    if backend is None:
        ...fall back to the host path with a warning...

The probe is cheap in the common cases:

- backend already initialized in this process -> returns its name
  without spawning anything;
- no remote-tunnel plugin in play (plain CPU/TPU runtime) -> in-process
  init cannot hang, returns without spawning anything;
- only when a tunnel plugin IS registered and the backend is NOT yet
  initialized does it pay for one subprocess probe (result cached for
  the life of the process).

Env hooks:

- ``MINNOW_TPU_BACKEND_ASSUME=<name>``: skip probing entirely and trust
  the given backend name (escape hatch for exotic setups).
- ``MINNOW_TPU_BACKEND_PROBE_TIMEOUT``: seconds before a hanging init
  is declared dead (default 120; healthy tunnel init can take ~60 s).
- ``MINNOW_TPU_FORCE_PROBE=1``: probe even without a tunnel plugin
  (used by tests to exercise the subprocess machinery).
- ``MINNOW_TPU_TEST_HANG_BACKEND=1``: makes the probe *child* sleep
  forever before touching jax -- a faithful simulation of the
  half-dead-relay hang for tests (the parent's timeout must kill it).
"""

from __future__ import annotations

import os
import subprocess
import sys

__all__ = ["probe", "reset_cache", "device_or_host",
           "ensure_compile_cache", "BackendUnavailableError"]


class BackendUnavailableError(RuntimeError):
    """JAX backend init did not complete within the probe timeout."""

_UNSET = object()
_cached = _UNSET

# The hang class only exists when a remote-tunnel PJRT plugin gets
# registered at interpreter startup (here: the axon plugin, latched via
# sitecustomize when PALLAS_AXON_POOL_IPS is set).  Plain CPU or
# locally-attached TPU runtimes fail fast instead of hanging.
_TUNNEL_ENV_VARS = ("PALLAS_AXON_POOL_IPS",)


def _tunnel_in_play() -> bool:
    if os.environ.get("MINNOW_TPU_FORCE_PROBE") == "1":
        return True
    if any(os.environ.get(v) for v in _TUNNEL_ENV_VARS):
        return True
    return "axon" in os.environ.get("JAX_PLATFORMS", "")


def _backend_initialized() -> bool:
    """True iff a jax backend is already live in THIS process (touching
    jax config/bridge state does not trigger initialization)."""
    if "jax" not in sys.modules:
        return False
    try:
        from jax._src import xla_bridge
        return bool(xla_bridge._backends)
    except Exception:  # noqa: BLE001 - private API; degrade to probing
        return False


# Child sleeps on the test hook BEFORE importing jax so the parent's
# timeout machinery is exercised against a genuine never-returns child.
_PROBE_CODE = (
    "import os, time\n"
    "if os.environ.get('MINNOW_TPU_TEST_HANG_BACKEND') == '1':\n"
    "    time.sleep(3600)\n"
    "import jax\n"
    "print('BACKEND=' + jax.default_backend())\n"
)


def _subprocess_probe(timeout_s: float):
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    if p.returncode != 0:
        return None
    for line in p.stdout.splitlines():
        if line.startswith("BACKEND="):
            return line[len("BACKEND="):]
    return None


def probe(timeout_s: float | None = None):
    """Return the default-backend name, or None if backend init is dead.

    Guaranteed to return within ~``timeout_s`` seconds even when the
    runtime would hang forever.  The first real probe's verdict is
    cached; pass through `reset_cache()` to re-test a recovered relay.
    """
    global _cached
    assume = os.environ.get("MINNOW_TPU_BACKEND_ASSUME")
    if assume:
        return assume
    if _backend_initialized():
        import jax
        return jax.default_backend()
    if not _tunnel_in_play():
        # In-process init cannot hang here, but it CAN fail fast
        # (device held by another process, driver error); the contract
        # is "name, or None" either way.
        try:
            import jax
            return jax.default_backend()
        except Exception:  # noqa: BLE001 - init failure == unavailable
            return None
    if _cached is not _UNSET:
        return _cached
    if timeout_s is None:
        timeout_s = float(os.environ.get(
            "MINNOW_TPU_BACKEND_PROBE_TIMEOUT", "120"))
    _cached = _subprocess_probe(timeout_s)
    return _cached


def reset_cache() -> None:
    global _cached
    _cached = _UNSET


def ensure_compile_cache() -> None:
    """Configure jax's persistent compile cache if nothing has yet.

    On remote-compile TPU setups a single jit graph can take 1-3 min to
    compile, and the library's first-use kernel self-check
    (ops/selfcheck.py) compiles several -- without a persistent cache
    every fresh process pays that again.  bench.py and the tools set
    ``jax_compilation_cache_dir`` themselves; library/CLI users get a
    default here (ADVICE r3 selfcheck.py:15).

    Precedence: an already-configured ``jax_compilation_cache_dir``
    (incl. the standard ``JAX_COMPILATION_CACHE_DIR`` env var) wins;
    else ``MINNOW_TPU_COMPILE_CACHE`` (the value ``off`` disables);
    else ``~/.cache/minnow_tpu/jax``.  Idempotent and cheap."""
    import jax
    if jax.config.jax_compilation_cache_dir:
        return
    path = os.environ.get("MINNOW_TPU_COMPILE_CACHE")
    if path is not None and path.lower() in ("", "0", "off"):
        return
    if not path:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "minnow_tpu", "jax")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # 0.0, not a ~1 s threshold: on remote-compile (tunneled)
        # backends jax's *measured* compile time can undershoot the
        # threshold even when the wall-clock compile RPC takes tens of
        # seconds, leaving the cache silently empty.
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


def device_or_host(device: bool) -> bool:
    """Gate a ``--device`` request on a live backend.

    Returns ``device`` unchanged when the backend comes up within the
    probe timeout; otherwise warns on stderr and returns False so the
    caller proceeds on the host path instead of hanging in backend
    init (output bytes are identical either way by construction)."""
    if not device:
        return False
    if probe() is not None:
        return True
    print("warning: TPU/JAX backend init did not complete within the "
          "probe timeout; falling back to the host path "
          "(set MINNOW_TPU_BACKEND_PROBE_TIMEOUT to wait longer)",
          file=sys.stderr)
    return False
