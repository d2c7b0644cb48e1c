"""Streaming monitor: continuous verification over an arriving stream."""
import numpy as np
import pytest

from echoseal_tpu.models.embedder import WatermarkEmbedder
from echoseal_tpu.models.monitor import StreamMonitor

FS = 48_000


def _stream(key, seconds):
    tx = WatermarkEmbedder(key)
    host = np.zeros(seconds * FS, dtype=np.float32)
    return np.concatenate([tx.process(host[i : i + 1024])
                           for i in range(0, host.size, 1024)])


def test_monitor_emits_authentic_windows(key32):
    wm = _stream(key32, 10)
    mon = StreamMonitor(key32, window_s=4.0, hop_s=2.0, list_size=8)
    events = []
    for i in range(0, wm.size, 4096):            # arbitrary block cadence
        events += mon.feed(wm[i : i + 4096])
    events += mon.flush()
    assert len(events) >= 3
    assert all(ev.result.authentic for ev in events)
    # stream-time bookkeeping: windows advance by the hop
    starts = [ev.t_start for ev in events[:-1]]
    assert starts == pytest.approx(
        [2.0 * k for k in range(len(starts))], abs=1e-6)
    # frame counters advance with stream time across windows
    ctrs = [ev.result.frame_ctr for ev in events if ev.result.frame_ctr
            is not None]
    assert ctrs == sorted(ctrs) and ctrs[-1] > ctrs[0]


def test_monitor_rejects_foreign_session_mid_stream(key32):
    """The anti-replay latch persists across windows: frames from a second
    TX session are rejected once the first session latched."""
    wm1 = _stream(key32, 6)
    wm2 = _stream(key32, 6)                       # new session nonce
    mon = StreamMonitor(key32, window_s=4.0, hop_s=4.0, list_size=8)
    ev1 = mon.feed(wm1[: 4 * FS])
    assert ev1 and ev1[0].result.authentic
    mon._buf = np.zeros(0, np.float32)            # jump streams cleanly
    ev2 = mon.feed(wm2[: 4 * FS])
    assert ev2 and not ev2[0].result.authentic


def test_monitor_plain_noise_quiet(key32, rng):
    noise = (0.05 * rng.standard_normal(8 * FS)).astype(np.float32)
    mon = StreamMonitor(key32, window_s=4.0, hop_s=2.0, list_size=8)
    events = mon.feed(noise)
    assert events and not any(ev.result.authentic for ev in events)
