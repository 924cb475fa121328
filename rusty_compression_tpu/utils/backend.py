"""Backend capability probes.

Some TPU backends reject every complex-dtype op (this repo's axon
tunnel returns UNIMPLEMENTED even for a c64 add). The reference makes
dtype invisible to the caller — every container is macro-instantiated
for c32/c64 over LAPACK's c/z kernels (rusty-compression
``src/qr.rs:408-416``, ``col_interp_decomp.rs:158-161``) — so the
standard entry points here dispatch on a one-shot cached probe: when
the device accepts complex, the normal jnp paths run; when it rejects,
complex work routes through the all-real planar/host paths (planarc,
``highacc.refined_rsvd_planar``) and the containers come back with
HOST numpy factors.

The probe runs in a SUBPROCESS: on the axon tunnel a rejected complex
program poisons the probing process's backend state (later plain real
ops fail UNIMPLEMENTED in the same process — CLAUDE.md round-2
discipline), so it must never run in the caller's process.
"""

from __future__ import annotations

import os
import subprocess
import sys

_accepts_complex: bool | None = None

_PROBE = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.asarray([[1+1j, 2j], [0.5, 1-1j]], jnp.complex64)\n"
    "y = jax.device_get(x @ x + x)\n"
    "print('COMPLEX-OK', complex(y[0, 0]))\n"
)


def backend_accepts_complex() -> bool:
    """True when the default device executes complex-dtype programs.

    Cached per process. CPU always accepts. Override with
    ``RC_COMPLEX_DEVICE=0`` / ``1`` (skips the subprocess probe —
    useful under a running stream where a second device process is
    undesirable, and in tests stubbing the rejecting backend).
    """
    global _accepts_complex
    if _accepts_complex is None:
        env = os.environ.get("RC_COMPLEX_DEVICE")
        if env is not None and env != "":
            _accepts_complex = env not in ("0", "false", "no")
            return _accepts_complex
        import jax

        if jax.default_backend() == "cpu":
            _accepts_complex = True
            return _accepts_complex
        try:
            pr = subprocess.run(
                [sys.executable, "-c", _PROBE], capture_output=True,
                text=True, timeout=240,
                env={**os.environ, "JAX_TRACEBACK_FILTERING": "off"})
            _accepts_complex = (pr.returncode == 0
                                and "COMPLEX-OK" in pr.stdout)
        except (subprocess.TimeoutExpired, OSError):
            # dead tunnel / no subprocess: assume rejecting (the planar
            # route works everywhere; the complex-storage route only on
            # accepting devices)
            _accepts_complex = False
    return _accepts_complex


def use_host_complex(*arrays) -> bool:
    """True when any of ``arrays`` is complex AND the device rejects
    complex dtypes — the condition for routing through the host/planar
    paths (transparent complex dispatch)."""
    import numpy as np

    return (any(np.iscomplexobj(a) for a in arrays)
            and not backend_accepts_complex())


def _reset_probe_cache() -> None:
    """Testing hook."""
    global _accepts_complex
    _accepts_complex = None
