"""Subprocess regression tests for the driver artifacts (VERDICT r2 item 5).

The driver compile-checks `__graft_entry__.entry()` on one chip and runs
`__graft_entry__.dryrun_multichip(N)` with N virtual CPU devices. Round 1
shipped red because of an environment assumption inside the entry file —
these tests run both contracts in clean subprocesses (the dry run needs a
fresh backend: device count is fixed at first jax use) so they can never
silently regress again.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, timeout: int = 300) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # mimic the driver: no pre-set platform pin; the entry file itself
    # must make the run CPU-safe
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


def test_dryrun_multichip_subprocess():
    r = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dryrun_multichip OK" in r.stdout, r.stdout


def test_entry_executes_on_cpu_subprocess():
    r = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__, jax.numpy as jnp\n"
        "fn, args = __graft_entry__.entry()\n"
        "X, cost = jax.jit(fn)(*args)\n"
        "assert bool(jnp.isfinite(X).all()), 'non-finite solution'\n"
        "assert bool(jnp.isfinite(cost)), 'non-finite cost'\n"
        "print('entry OK', X.shape, float(cost))\n"
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "entry OK" in r.stdout, r.stdout
