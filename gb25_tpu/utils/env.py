"""Environment preamble for distributed runs.

Reference behavior: ``GordonBell25.preamble()``
(/root/reference/src/timestepping_utils.jl:47-67) unsets proxy variables that
hang XLA's distributed rendezvous and fixes TMPDIR handling; the submission
generator additionally sets collective-timeout XLA flags
(sharding/common_submission_generator.jl:121-146). TPU translation below.
"""

from __future__ import annotations

import os

_PROXY_VARS = (
    "http_proxy", "https_proxy", "HTTP_PROXY", "HTTPS_PROXY",
    "no_proxy", "NO_PROXY", "all_proxy", "ALL_PROXY",
)


def preamble(collective_timeout_minutes: int = 30):
    """Sanitize the environment before jax.distributed.initialize()."""
    for var in _PROXY_VARS:
        os.environ.pop(var, None)

    # honor an explicit JAX_PLATFORMS pin even when a site boot hook has
    # already overridden the platform list via jax.config (config updates
    # beat env vars, so e.g. JAX_PLATFORMS=cpu subprocess tests would
    # otherwise still dial the TPU plugin)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # a usable TMPDIR (some schedulers hand out per-job paths that vanish)
    tmpdir = os.environ.get("TMPDIR", "/tmp")
    if not os.path.isdir(tmpdir):
        os.environ["TMPDIR"] = "/tmp"

    # hang detection: bound collective execution (reference: XLA collective
    # call timeouts used as hang detectors, SURVEY.md section 5). TPU-only
    # flags are fatal to the CPU backend ("Unknown flag in XLA_FLAGS"), so
    # skip them under an explicit non-TPU platform pin.
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms:
        # "axon" (tunneled TPU) is NOT a target: XLA_FLAGS is parsed by the
        # *client-side* XLA, which doesn't link the TPU flag table and
        # aborts ("Unknown flag in XLA_FLAGS") — TPU flags belong on the
        # server end of the tunnel
        tpu_target = any(p.strip() == "tpu" for p in platforms.split(","))
    else:
        # unset platform: JAX silently falls back to CPU on machines with
        # no TPU, where the TPU-only flag below is fatal — only inject it
        # when a local TPU device is actually plausible on this host.
        # (libtpu merely being installed is NOT evidence: tunneled-TPU
        # clients ship the package while the chip — and the flag-aware
        # XLA — live on the far end.)
        tpu_target = (
            os.path.exists("/dev/accel0")
            or os.path.exists("/dev/vfio/0")
            or bool(os.environ.get("TPU_NAME"))
        )
    flags = os.environ.get("XLA_FLAGS", "")
    extra = []
    if tpu_target and "xla_tpu_enable_latency_hiding_scheduler" not in flags:
        extra.append("--xla_tpu_enable_latency_hiding_scheduler=true")
    if extra:
        os.environ["XLA_FLAGS"] = (flags + " " + " ".join(extra)).strip()
    os.environ.setdefault(
        "JAX_DISTRIBUTED_INITIALIZATION_TIMEOUT_SECONDS",
        str(collective_timeout_minutes * 60),
    )
