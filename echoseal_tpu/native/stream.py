"""Native streaming TX: Python frame synthesis feeding the C ring mixer.

The real-time constraint in the TX path is the audio callback (~21 ms
budget per 1024-sample block, reference audioio.py:52-63).  Here the
callback does NO Python numeric work: it calls ``NativeMixer.process``,
whose C side reads chips from the lock-free SPSC ring and applies the
RMS/floor/headroom mix law allocation-free.  A daemon feeder thread keeps
the ring topped up with frames rendered by the ordinary Python synthesis
path (crypto + polar + PN + IIR), which has a whole frame period
(~25.3 ms x ring depth) of slack instead of a callback deadline.

Used by ``echoseal-tx --native`` (cli/tx_app.py); falls back to the pure
Python mixer when no C compiler is present (native.available()).
"""
from __future__ import annotations

import threading
import time

import numpy as np

from echoseal_tpu.core.params import FRAME_LEN, MIX_HEADROOM, TxParams
from echoseal_tpu.models.embedder import WatermarkEmbedder
from echoseal_tpu.native import NativeMixer


class NativeStreamEmbedder:
    """Drop-in ``process(block)`` surface backed by the C ring mixer.

    Keeps the same TX session state as ``WatermarkEmbedder`` (frame
    counter, session nonce, key schedule) -- frames pushed to the ring are
    byte-identical to the Python mixer's chip stream, and the C mix law is
    parity-pinned by tests/test_native.py.
    """

    #: keep at least this many chips buffered (~4 frames ~ 100 ms)
    LOW_WATER = 4 * FRAME_LEN

    def __init__(self, key32: bytes, params: TxParams | None = None) -> None:
        self._tx = WatermarkEmbedder(key32, params)
        p = self._tx.p
        self._mixer = NativeMixer(target_rel_db=p.target_rel_db,
                                  floor_rel_dbfs=p.floor_rel_dbfs,
                                  headroom=MIX_HEADROOM)
        self._stop = threading.Event()
        # serialises the SPSC ring's PRODUCER side between the feeder
        # thread and the synchronous top-up in process()
        self._produce = threading.Lock()
        self._feeder = threading.Thread(target=self._feed, daemon=True,
                                        name="echoseal-tx-feeder")
        self._feeder.start()

    # ------------------------------------------------------------------ API
    @property
    def p(self) -> TxParams:
        """TX parameters (WatermarkEmbedder surface parity -- the CLI and
        AudioLoop read ``embedder.p.fs``)."""
        return self._tx.p

    @property
    def frame_ctr(self) -> int:
        return self._tx.frame_ctr

    @property
    def session_nonce(self) -> bytes:
        return self._tx._session_nonce

    def process(self, samples: np.ndarray) -> np.ndarray:
        """Mix one block: one C call when the ring is stocked.

        If the ring cannot cover the block (consumer faster than the
        feeder -- e.g. the offline NullAudioLoop drains at memory speed),
        frames are rendered SYNCHRONOUSLY here before mixing, so the
        output is always fully watermarked.  The live audio callback
        virtually never takes this branch (the feeder keeps LOW_WATER
        ~4 frames ahead of the ~21 ms block cadence).
        """
        x = np.asarray(samples, dtype=np.float32).ravel()
        if self._mixer.available_chips < x.size:
            with self._produce:
                while (self._mixer.available_chips < x.size
                       and self._mixer.space >= FRAME_LEN):
                    self._push_frame()
        out, _used = self._mixer.process(x)
        return out

    def close(self) -> None:
        self._stop.set()
        self._feeder.join(timeout=1.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------- feeder
    def _push_frame(self) -> None:
        """Render + enqueue one frame (callers hold ``_produce``)."""
        chips = self._tx._make_frame_chips()
        self._tx.frame_ctr = (self._tx.frame_ctr + 1) % (2**32)
        self._mixer.push_chips(chips)

    def _feed(self) -> None:
        while not self._stop.is_set():
            if (self._mixer.available_chips < self.LOW_WATER
                    and self._mixer.space >= FRAME_LEN):
                with self._produce:
                    if (self._mixer.available_chips < self.LOW_WATER
                            and self._mixer.space >= FRAME_LEN):
                        self._push_frame()
            else:
                # ring full enough: sleep well under one frame period
                time.sleep(0.002)
