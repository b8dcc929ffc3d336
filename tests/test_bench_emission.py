"""bench.py's one-JSON-line guarantee, tested as a subprocess contract.

The driver records whatever bench.py prints; rounds 2 and 3 were lost
to runs that died without a parseable line (rc=1 traceback; rc=124
driver timeout).  These tests pin the three emission modes -- outage,
mid-run budget expiry (partial results), and mid-run raise -- each
asserting rc == 0 and exactly one parseable JSON record on stdout.
Each launches bench.py as the driver does (fresh interpreter, piped
stdout), on the CPU backend with tiny budgets.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env, timeout=180):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    p = subprocess.run([sys.executable, BENCH], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout)
    assert p.returncode == 0, (p.returncode, p.stdout, p.stderr)
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, "expected exactly one JSON line:\n%s" \
        % p.stdout
    return json.loads(lines[0])


def test_outage_emits_structured_error():
    """Backend init hangs forever -> tpu_unavailable within the probe
    budget, rc 0.  The hang is real (probe child sleeps)."""
    rec = _run({
        "MINNOW_TPU_TEST_HANG_BACKEND": "1",
        "MINNOW_TPU_BENCH_ATTEMPTS": "1",
        "MINNOW_TPU_BENCH_PROBE_TIMEOUT": "5",
        "MINNOW_TPU_BENCH_BUDGET_S": "60",
    })
    assert rec["error"] == "tpu_unavailable"
    assert rec["value"] is None
    assert rec["unit"] == "GB/s"


def test_budget_expiry_emits_partial_results():
    """Budget expires mid-run -> partial record with a stage marker and
    whatever detail accumulated, rc 0 (the round-3 rc=124 class)."""
    # 75 s budget => watchdog at ~55 s: the pre-watchdog work (probe
    # subprocess + in-process jax import + native baseline) takes ~20 s
    # idle but flaked at a 45 s budget under a fully loaded host (the
    # suite ran concurrently with an on-chip tune)
    rec = _run({
        "MINNOW_TPU_BENCH_BUDGET_S": "75",
    }, timeout=150)
    assert rec.get("partial") is True
    assert rec["error"].startswith("bench_timeout_after_")
    assert "stage" in rec
    # the native baseline runs in seconds and must have landed
    assert rec["detail"]["native_single_core_GBps"] > 0


def test_midrun_raise_emits_partial_results():
    """A raise after backend init (the round-2 rc=1 class) -> partial
    record carrying the error, rc 0.  Driven through a -c wrapper that
    monkeypatches validate_backend to raise, then calls bench.main()
    -- same one-line stdout contract."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["MINNOW_TPU_BENCH_BUDGET_S"] = "120"
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from minnow_tpu.ops import validate\n"
        "def boom():\n"
        "    raise RuntimeError('simulated relay death')\n"
        "validate.validate_backend = boom\n"
        "import bench\n"
        "bench.main()\n" % REPO)
    p = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=180)
    assert p.returncode == 0, (p.returncode, p.stdout, p.stderr)
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, p.stdout
    rec = json.loads(lines[0])
    assert rec.get("partial") is True
    assert "simulated relay death" in rec["error"]


def test_hbm_slope_cap_and_min_timed():
    """The slope honesty guards: _cap_to_hbm must replace any slope
    past the HBM traffic-model ceiling with the cap (raw preserved).
    Pure helpers -- no device needed (observed trigger: a 1120 GB/s
    decode "slope" on a v5e whose ceiling at 18 bits is 524 GB/s)."""
    import sys
    sys.path.insert(0, REPO)
    import bench

    assert bench._hbm_bw("TPU v5 lite") == 819.0
    assert bench._hbm_bw("TPU v5p and more text") == 2765.0
    assert bench._hbm_bw("cpu") is None

    a = bench._Timed(0.010, [0.010, 0.014, 0.030])
    assert float(a) == 0.010 and a.med == 0.014 and a.spread == 3.0

    d = {"decode_pallas_group_GBps": 1120.781,
         "decode_pallas_group_GBps_med": 810.9,
         "encode_pallas_group_GBps": 64.6,
         "bench_shape": "(256->4096, 131072)"}

    class _FakeDev:
        device_kind = "TPU v5 lite"

    real_devices = None
    import jax
    real_devices = jax.devices
    try:
        jax.devices = lambda *a, **k: [_FakeDev()]
        cap = bench._cap_to_hbm(d, 18)
    finally:
        jax.devices = real_devices
    assert abs(cap - 819.0 * 4 / 6.25) < 1e-6
    assert d["decode_pallas_group_GBps"] == round(cap, 1)
    assert d["decode_pallas_group_GBps_raw"] == 1120.781
    assert d["decode_pallas_group_GBps_med"] == round(cap, 1)
    assert d["encode_pallas_group_GBps"] == 64.6   # under the cap: kept
    assert "encode_pallas_group_GBps_raw" not in d
    assert set(d["hbm_capped"]) == {"decode_pallas_group_GBps",
                                    "decode_pallas_group_GBps_med"}
