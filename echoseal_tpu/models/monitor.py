"""Streaming RX: continuous watermark monitoring over a live stream.

The reference only verifies finite clips (rx_app.py reads one file); a
deployment watching a feed needs verdicts as audio ARRIVES.  The monitor
keeps a sliding window over the incoming sample stream and re-verifies it
every ``hop_s`` seconds of new audio, emitting one ``MonitorEvent`` per
completed window:

    mon = StreamMonitor(key, profile="v2")
    for block in capture():              # any block size, any cadence
        for ev in mon.feed(block):
            if ev.result.authentic:
                alarm_ok(ev.t_start, ev.result.frame_ctr)

Design notes:

* The underlying verifier is the ordinary single-clip engine
  (`WatermarkDetector` / `RobustVerifier`), so every window gets the full
  fallback ladder and the padded-bucket jit caching means ONE compile
  serves every window of a given size.
* The session anti-replay latch is carried ACROSS windows (the detector
  instance persists), so a stream that switches to frames sealed in a
  different TX session flips to rejections -- exactly the single-clip
  semantics extended in time.
* Window/hop default to 4 s / 2 s: every frame appears in >=2 windows, so
  a verdict lags the audio by at most ~hop + verify latency.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from echoseal_tpu.models.detector import VerifyResult, WatermarkDetector


@dataclass
class MonitorEvent:
    """Verdict for one analysis window."""

    t_start: float            # window start, seconds of stream time
    t_end: float
    result: VerifyResult


class StreamMonitor:
    """Sliding-window continuous verifier over a sample stream."""

    def __init__(self, key32: bytes, *, fs: int = 48_000,
                 profile: str = "compat", window_s: float = 4.0,
                 hop_s: float = 2.0, list_size: int = 32,
                 verifier=None) -> None:
        if hop_s <= 0 or window_s < hop_s:
            raise ValueError("need 0 < hop_s <= window_s")
        self.fs = fs
        self.window = int(window_s * fs)
        self.hop = int(hop_s * fs)
        if verifier is not None:
            self._det = verifier
        elif profile == "v2":
            from echoseal_tpu.models.robust import RobustVerifier

            self._det = RobustVerifier(key32, fs_target=fs,
                                       list_size=list_size)
        else:
            self._det = WatermarkDetector(key32, fs_target=fs,
                                          list_size=list_size)
        self._buf = np.zeros(0, dtype=np.float32)
        self._pos = 0             # stream index of _buf[0]

    # ------------------------------------------------------------------ API
    def feed(self, samples: np.ndarray) -> list[MonitorEvent]:
        """Append samples; verify every window that completed."""
        x = np.asarray(samples, dtype=np.float32).ravel()
        self._buf = np.concatenate([self._buf, x])
        events: list[MonitorEvent] = []
        while self._buf.size >= self.window:
            events.append(self._verify_window(self._buf[: self.window]))
            self._buf = self._buf[self.hop :]
            self._pos += self.hop
        return events

    def flush(self) -> list[MonitorEvent]:
        """Verify whatever trailing audio remains (if long enough)."""
        from echoseal_tpu.models.detector import MIN_CLIP_SECONDS

        if self._buf.size < int(MIN_CLIP_SECONDS * self.fs):
            return []
        ev = self._verify_window(self._buf)
        self._pos += self._buf.size
        self._buf = np.zeros(0, dtype=np.float32)
        return [ev]

    @property
    def session_nonce(self) -> bytes | None:
        return self._det.session_nonce

    # ------------------------------------------------------------ internals
    def _verify_window(self, win: np.ndarray) -> MonitorEvent:
        res = self._det.verify_detailed(win, self.fs)
        return MonitorEvent(
            t_start=self._pos / self.fs,
            t_end=(self._pos + win.size) / self.fs,
            result=res,
        )
