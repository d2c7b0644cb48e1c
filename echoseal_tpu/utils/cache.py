"""Host-keyed persistent JAX compilation cache location.

XLA:CPU AOT artifacts encode the *compile-time* host's CPU feature set;
loading them on a machine with different features is at best a warning and
at worst silent numeric drift or SIGILL (observed: a cross-machine cache
flipped a rounding-adjacent pipeline verdict -- VERDICT r2 weak #2).  Keying
the cache directory by a hash of the host's CPU flags (plus the JAX
version, which also invalidates AOT artifacts) makes every machine get its
own cache while keeping the big win -- the one-time SCL scan compile --
local to repeated runs on the same box.
"""
from __future__ import annotations

import hashlib
import os


def persistent_cache_dir(base: str = "/tmp/echoseal_jax_cache") -> str:
    """``base`` suffixed with a backend-keyed configuration hash.

    The key is the JAX version plus the RESOLVED backend, and -- for the
    CPU backend only -- the host CPU flags and XLA_FLAGS: XLA:CPU bakes
    configuration-dependent target features into AOT artifacts (observed:
    artifacts compiled under the test harness's
    ``--xla_force_host_platform_device_count=8`` carry
    ``+prefer-no-scatter,+prefer-no-gather`` and loading them from a
    plain single-device process -- or vice versa -- logs a machine-
    feature mismatch and can mis-execute gather/scatter ops, which once
    flipped a batch-verifier verdict mid-suite).  Separate CPU configs
    must not share artifact directories.  Raw env vars (JAX_PLATFORMS)
    are deliberately NOT part of the key: two processes resolving to the
    same accelerator backend must share one cache however the platform
    was selected, or every differently-launched process pays the full
    multi-minute serving-ladder compile again (observed round 4).
    """
    try:
        import jax

        backend = jax.default_backend()
        feat = jax.__version__ + "|" + backend
    except Exception:  # pragma: no cover -- jax always importable here
        backend = "unknown"
        feat = "unknown"
    # Host-CPU features and XLA_FLAGS matter ONLY for XLA:CPU artifacts:
    # that is where AOT code bakes in the compiling host's feature set and
    # config-dependent target features (the hazards in the docstrings).
    # Accelerator-backend executables target the accelerator, and keying
    # them by raw env vars was actively harmful -- a TPU process with
    # JAX_PLATFORMS=axon set could not reuse the cache a process with it
    # unset had spent ~20 min populating, even though both resolved to the
    # identical backend (observed round 4: a fresh session recompiled the
    # whole serving ladder because of exactly that env-var split).
    if backend == "cpu":
        cpu = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        cpu = line
                        break
        except OSError:
            cpu = os.uname().machine
        # ALSO key by the boot id: /proc/cpuinfo flags are the KERNEL's
        # view and can read identically on two VMs whose LLVM-detected
        # feature sets differ (observed round 5: a /tmp cache surviving
        # from a previous host matched the cpuinfo-keyed dir and every
        # AOT load logged a "+prefer-no-scatter ... not supported on the
        # host machine" mismatch -- exactly the silent-drift hazard this
        # key exists to prevent).  Same boot == same machine, so
        # within-boot cross-process reuse (the whole point) is kept.
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                cpu += "|" + f.read().strip()
        except OSError:
            pass
        feat += "|" + cpu + "|" + os.environ.get("XLA_FLAGS", "")
    tag = hashlib.sha1(feat.encode()).hexdigest()[:10]
    return f"{base}_{tag}"


def enable_persistent_cache(min_compile_secs: float = 1.0) -> str:
    """Point JAX's compilation cache at the host-keyed directory.

    Safe on EVERY backend: jax skips persistence for executables the
    PJRT plugin cannot serialize, so enabling this on the tunneled TPU
    backend costs nothing if unsupported and saves the multi-minute
    SCL/v2-stage compiles per process if supported (VERDICT r3 Missing
    #3; measured either way in benchmarks/compile_cache_probe.py).
    """
    import jax

    path = persistent_cache_dir()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    return path
