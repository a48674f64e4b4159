"""Driver-gate hardening: dryrun_multichip must never touch a TPU
backend (VERDICT r3 weak-5 — MULTICHIP_r02 died on a libtpu AOT
mismatch because TPU backend init happened before the CPU force).

The regression runs the dryrun in a subprocess whose environment is
POISONED: JAX_PLATFORMS=tpu with no TPU plugin available and the axon
sitecustomize disarmed. If the dryrun (or anything in its import
chain) queries devices before forcing the CPU platform, jax attempts
TPU backend init and the process dies — exactly the r02 failure mode.
With the force correctly ordered, the poison is inert.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _poisoned_env() -> dict:
    env = dict(os.environ)
    # Disarm the axon sitecustomize (its register() import path is
    # gated on PALLAS_AXON_POOL_IPS) and demand a TPU that isn't there.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "tpu"
    env.pop("XLA_FLAGS", None)  # dryrun must provision its own devices
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_multichip_never_inits_tpu_backend():
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(4)"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env=_poisoned_env(),
    )
    assert res.returncode == 0, (
        f"dryrun under poisoned TPU env failed (rc={res.returncode}):\n"
        f"stderr tail: {res.stderr[-1500:]}"
    )
    assert "dryrun_multichip OK" in res.stdout, res.stdout[-500:]


def test_poison_actually_poisons():
    """Sanity: the poisoned env DOES break a process that queries
    devices without forcing CPU — otherwise the test above proves
    nothing."""
    res = subprocess.run(
        [sys.executable, "-c", "import jax; jax.devices()"],
        capture_output=True, text=True, timeout=120, cwd=REPO,
        env=_poisoned_env(),
    )
    assert res.returncode != 0, (
        "expected the poisoned env (JAX_PLATFORMS=tpu, no plugin) to "
        "fail device init, but it succeeded — poison is inert and the "
        "dryrun regression test is vacuous"
    )
