"""Headline benchmark: batched RX verification real-time factor per chip.

Measures the BASELINE.json north-star metric -- audio-seconds verified per
wall-second per chip on 3 s 48 kHz clips -- on the batched verify pipeline
(echoseal_tpu/models/pipeline.py), plus two driver-visible sub-metrics:
the v2 (robust-profile) serving real-time factor and the SCL-256 list
decoder throughput (the shipped default list size).

Clips are genuine watermarked streams (batched device TX, silence host for
the compat profile / loud tone host for v2); the timing covers the full
pipeline: device dispatch (sync, demod, refine, header, despread,
polar+CRC) plus host AEAD verdicts.

``vs_baseline`` is value / 1000: the fraction of the driver-supplied
1000x-real-time target.  (The reference NumPy implementation needs >560 s
for a single 3 s clip in this environment -- real-time factor < 0.006 --
so a reference-relative ratio would be vacuous.)

Resilience (VERDICT r2 item 1): clip staging is ONE chunked device TX kept
on-device plus an on-device gather -- no per-clip host round-trips over the
thin tunnel -- and every dispatch/download runs under a bounded retry for
transient backend faults.  Sub-metrics fail independently: a dead metric
lands in ``extras.errors`` and the JSON line still prints (rc=0 when at
least one metric survived).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

Outage watchdog: the tunneled TPU backend can go down for hours at a time
(observed twice; when down, the first device op HANGS rather than raising,
so a plain bench would be killed by the driver with no artifact at all --
the round-2 failure mode).  ``main`` therefore probes the backend in a
time-bounded subprocess, runs the real bench in a child process with a
hard timeout, and on a hang/failure reruns the child on XLA:CPU with a
smaller batch so the driver always gets ONE labeled JSON line (rc=0,
``extras.platform`` says which backend produced it).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import traceback

import numpy as np

PROBE_TIMEOUT_S = int(os.environ.get("ECHOSEAL_BENCH_PROBE_S", "600"))
CHILD_TIMEOUT_S = int(os.environ.get("ECHOSEAL_BENCH_CHILD_S", "4200"))
RETRIES = 4
_TRANSIENT = ("FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE", "INTERNAL",
              "RESOURCE_EXHAUSTED", "ABORTED", "connection", "Connection")


def _retry(fn, what: str):
    """Run ``fn`` with bounded retries on transient backend faults."""
    for attempt in range(RETRIES):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 -- classified below
            transient = any(t in str(e) or t in type(e).__name__
                            for t in _TRANSIENT)
            if attempt == RETRIES - 1 or not transient:
                raise
            print(f"# bench: transient fault in {what} "
                  f"(attempt {attempt + 1}/{RETRIES}): {e}",
                  file=sys.stderr)
            time.sleep(2.0 * (attempt + 1))


def _run_bench() -> None:
    if os.environ.get("ECHOSEAL_BENCH_PLATFORM") == "cpu":
        # JAX_PLATFORMS alone does not stick here (sitecustomize registers
        # the accelerator plugin); the config update must land before any
        # backend touch.
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from echoseal_tpu.core.params import FRAME_LEN
    from echoseal_tpu.utils.cache import enable_persistent_cache

    # every backend, not just CPU: persistence is a no-op where the PJRT
    # plugin can't serialize executables, and saves the multi-minute
    # SCL/v2 compiles per process where it can (VERDICT r3 Missing #3)
    enable_persistent_cache()

    key = bytes.fromhex("aa" * 32)
    fs = 48_000
    clip_s = 3.0
    T = int(clip_s * fs)
    # B=1024 measured best on chip (this round's sweep): compat 9204x /
    # v2 3793x vs 7398x / 2311x at B=256 -- the ~0.35 s dispatch+download
    # round-trip amortizes with batch, and the marginal per-clip cost is
    # flat past ~512.  Larger batches buy <5% more and double compile
    # time, so 1024 is the knee.
    B = int(os.environ.get("ECHOSEAL_BENCH_B", "1024"))
    rng = np.random.default_rng(0)

    extras: dict = {"platform": jax.default_backend()}
    errors: dict = {}
    n_frames = -(-T // FRAME_LEN)

    def slice_clips(stream: jnp.ndarray, starts: np.ndarray,
                    scale: float, Tpad: int) -> jnp.ndarray:
        """(B, Tpad) float32 clips gathered on device from one long stream.

        Tpad is NOT rounded to a power of two: the pipeline's sync conv
        runs over every padded sample, so a 2**18 pad of a 3 s clip would
        waste ~45% of the dominant conv (VERDICT r3 perf work).
        """

        @jax.jit
        def stage(stream, starts):
            from echoseal_tpu.ops.demod import slice_windows

            clips = slice_windows(stream, starts, T) * scale
            return jnp.pad(clips, ((0, 0), (0, Tpad - T)))

        return stage(stream, jnp.asarray(starts.astype(np.int32)))

    # ================= metric 1: compat headline RTF =====================
    compat_rtf = compat_accept = None
    try:
        from echoseal_tpu.models.embedder import BatchEmbedder
        from echoseal_tpu.models.pipeline import BatchVerifier

        TOTAL_CTRS, CHUNK = 4096, 1024

        def stage_compat():
            be = BatchEmbedder(key)
            chunks = [
                be.frames_device(np.arange(c0, c0 + CHUNK),
                                 session_nonce=bytes(8))
                for c0 in range(0, TOTAL_CTRS, CHUNK)
            ]
            stream = jnp.concatenate(chunks).reshape(-1)
            start_ctr = rng.integers(0, TOTAL_CTRS - n_frames, size=B)
            scale = 10.0 ** (be.p.floor_rel_dbfs / 20.0)
            return slice_clips(stream, start_ctr * FRAME_LEN, scale,
                               T + 8192)

        clips_dev = _retry(stage_compat, "compat clip staging")
        nv_dev = jnp.full(B, T, dtype=jnp.int32)
        bv = BatchVerifier(key)

        def run():
            out = bv.run_device(clips_dev, nv_dev)
            # host AEAD verdict on the (tiny) device outputs is IN the timing
            return bv.finish_host(out)

        compat_accept = float(np.mean(_retry(run, "compat warmup")))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _retry(run, "compat timed run")
            best = min(best, time.perf_counter() - t0)
        compat_rtf = B * clip_s / best
        extras["compat_accept"] = round(compat_accept, 3)
    except Exception:  # noqa: BLE001 -- report, keep going
        errors["compat"] = traceback.format_exc(limit=2)

    # ================= metric 2: v2 (robust) serving RTF =================
    try:
        from echoseal_tpu.models.pipeline import RobustBatchVerifier
        from echoseal_tpu.models.robust import RobustEmbedder

        def stage_v2():
            remb = RobustEmbedder(key)
            host = (0.15 * np.sin(
                2 * np.pi * 700 * np.arange(int(12 * fs)) / fs)
            ).astype(np.float32)
            stream = remb.process(host)           # host TX (~60 frames)
            starts = rng.integers(0, stream.size - T, size=B)
            return slice_clips(jnp.asarray(stream), starts, 1.0, T + 16384)

        v2_clips = _retry(stage_v2, "v2 clip staging")
        nv = np.full(B, T, dtype=np.int32)
        bv2 = RobustBatchVerifier(key)

        def run_v2():
            # the real serving call: hard pass + SCL fallback + extended ctrs
            return bv2.verify_batch(v2_clips, nv)

        v2_accept = float(np.mean(_retry(run_v2, "v2 warmup")))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _retry(run_v2, "v2 timed run")
            best = min(best, time.perf_counter() - t0)
        extras["v2_rtf_audio_sec_per_sec"] = round(B * clip_s / best, 1)
        extras["v2_accept"] = round(v2_accept, 3)
        extras["v2_batch"] = B
    except Exception:  # noqa: BLE001
        errors["v2"] = traceback.format_exc(limit=2)

    # ================= metric 3: SCL-256 decoder throughput ==============
    try:
        from echoseal_tpu.ops.polar import encode_np, polar_spec
        from echoseal_tpu.ops.scl import scl_decode

        spec = polar_spec()
        n_dec = 128
        bits = np.stack([encode_np(rng.bytes(55), spec)
                         for _ in range(n_dec)])
        y = (2.0 * bits - 1.0) + 0.3 * rng.standard_normal(bits.shape)
        llr = jnp.asarray((2.0 * y / 0.09).astype(np.float32))

        def run_scl():
            # materialize a host value: block_until_ready is not a reliable
            # barrier on this backend (tunneled); the download is ~32 KB
            return np.asarray(scl_decode(llr, spec, 256)["crc_ok"])

        _retry(run_scl, "scl warmup")
        t_scl = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _retry(run_scl, "scl timed run")
            t_scl = min(t_scl, time.perf_counter() - t0)
        extras["scl256_decodes_per_sec"] = round(n_dec / t_scl, 1)
        extras["scl256_batch"] = n_dec
    except Exception:  # noqa: BLE001
        errors["scl256"] = traceback.format_exc(limit=2)

    # ================= assemble the one-line report ======================
    if errors:
        extras["errors"] = {k: v.strip().splitlines()[-1]
                            for k, v in errors.items()}
        print(json.dumps({"bench_errors": errors}), file=sys.stderr)

    if compat_rtf is not None:
        metric = (f"RX verify real-time factor (3s 48kHz clips, batch {B}, "
                  f"accept_rate {compat_accept:.2f})")
        value = round(compat_rtf, 1)
    elif "v2_rtf_audio_sec_per_sec" in extras:
        metric = (f"v2 RX verify real-time factor (3s 48kHz clips, batch "
                  f"{B}; compat headline failed -- see extras.errors)")
        value = extras["v2_rtf_audio_sec_per_sec"]
    elif "scl256_decodes_per_sec" in extras:
        metric = ("SCL-256 decodes/sec (headline pipelines failed -- see "
                  "extras.errors)")
        value = extras["scl256_decodes_per_sec"]
    else:
        print(json.dumps({"metric": "bench failed", "value": None,
                          "unit": "audio-sec/sec/chip", "vs_baseline": None,
                          "extras": extras}))
        sys.exit(1)

    print(json.dumps({"metric": metric, "value": value,
                      "unit": "audio-sec/sec/chip",
                      "vs_baseline": round(value / 1000.0, 3),
                      "extras": extras}))


_PROBE_SRC = """
import numpy as np
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print("PROBE_OK", float(np.asarray((x @ x).ravel()[0])))
"""


def _extract_json(stdout: str) -> str | None:
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return line
    return None


def main() -> None:
    if os.environ.get("ECHOSEAL_BENCH_CHILD") == "1":
        _run_bench()
        return

    here = os.path.abspath(__file__)
    repo = os.path.dirname(here)

    def child(platform: str, timeout: int):
        env = dict(os.environ, ECHOSEAL_BENCH_CHILD="1")
        if platform == "cpu":
            env["ECHOSEAL_BENCH_PLATFORM"] = "cpu"
            env.setdefault("ECHOSEAL_BENCH_B", "16")
        return subprocess.run([sys.executable, here], env=env, cwd=repo,
                              capture_output=True, text=True,
                              timeout=timeout)

    # ---- bounded liveness probe (a down backend HANGS, never raises) ----
    probe_ok, reason = False, ""
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                           capture_output=True, text=True, cwd=repo,
                           timeout=PROBE_TIMEOUT_S)
        probe_ok = p.returncode == 0 and "PROBE_OK" in p.stdout
        if not probe_ok:
            reason = (f"probe rc={p.returncode}: "
                      + (p.stderr or p.stdout).strip()[-300:])
    except subprocess.TimeoutExpired:
        reason = f"backend init hung > {PROBE_TIMEOUT_S}s (outage)"
    if reason:
        print(f"# bench: accelerator probe failed -- {reason}",
              file=sys.stderr)

    # ---- real bench on the accelerator ----------------------------------
    if probe_ok:
        try:
            r = child("default", CHILD_TIMEOUT_S)
            print(r.stderr[-4000:], file=sys.stderr)
            line = _extract_json(r.stdout)
            if r.returncode == 0 and line:
                print(line)
                return
            reason = f"accelerator bench rc={r.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"accelerator bench exceeded {CHILD_TIMEOUT_S}s"
        print(f"# bench: {reason}; falling back to CPU", file=sys.stderr)

    # ---- labeled CPU fallback: some metric always beats no metric -------
    try:
        r = child("cpu", 2400)
        print(r.stderr[-4000:], file=sys.stderr)
        line = _extract_json(r.stdout)
        if r.returncode == 0 and line:
            rec = json.loads(line)
            rec.setdefault("extras", {})["tpu_unavailable"] = reason
            print(json.dumps(rec))
            return
        reason += f"; cpu fallback rc={r.returncode}"
    except subprocess.TimeoutExpired:
        reason += "; cpu fallback timed out"
    print(json.dumps({"metric": "bench failed", "value": None,
                      "unit": "audio-sec/sec/chip", "vs_baseline": None,
                      "extras": {"errors": reason}}))
    sys.exit(1)


if __name__ == "__main__":
    main()
