"""Native C mixer: parity with the Python streaming mix law."""
import numpy as np
import pytest

from echoseal_tpu import native
from echoseal_tpu.models.embedder import WatermarkEmbedder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C compiler in environment")


def test_native_mixer_matches_python(key32, rng):
    tx = WatermarkEmbedder(key32)
    # pre-generate the exact chip stream Python would use
    chips = np.concatenate([tx._make_frame_chips() for _ in range(4)])

    nm = native.NativeMixer()
    assert nm.push_chips(chips) == chips.size

    # python reference mixer on the same chips
    tx2 = WatermarkEmbedder(key32)
    tx2._chip_buf = chips.copy()
    tx2.frame_ctr = 10**6  # keep process() from generating more frames

    host = (0.1 * rng.standard_normal(3 * 1024)).astype(np.float32)
    for i in range(0, host.size, 1024):
        blk = host[i : i + 1024]
        out_c, used = nm.process(blk)
        out_py = tx2.process(blk)
        assert used == blk.size
        np.testing.assert_allclose(out_c, out_py, rtol=1e-5, atol=1e-7)


def test_native_mixer_starvation_passthrough(rng):
    nm = native.NativeMixer()
    blk = (0.1 * rng.standard_normal(256)).astype(np.float32)
    out, used = nm.process(blk)          # ring empty -> passthrough
    assert used == 0
    np.testing.assert_array_equal(out, blk)


def test_native_ring_wraparound(rng):
    nm = native.NativeMixer(capacity_pow2=10)   # 1024-chip ring
    chips = rng.standard_normal(4096).astype(np.float32)
    pushed = nm.push_chips(chips)
    assert pushed == 1024                       # bounded by capacity
    out, used = nm.process(np.zeros(600, np.float32))
    assert used == 600
    assert nm.push_chips(chips[pushed : pushed + 500]) == 500  # wrapped


def test_native_stream_embedder_roundtrip(key32):
    """Feeder thread + C ring mixer produce a verifiable stream.

    The callback-side `process` is the C mixer; frames are rendered by the
    ordinary Python synthesis on the feeder thread (cli `--native` path).
    """
    import time

    from echoseal_tpu.models.detector import WatermarkDetector
    from echoseal_tpu.native.stream import NativeStreamEmbedder

    FS = 48_000
    host = np.zeros(4 * FS, np.float32)
    with NativeStreamEmbedder(key32) as tx:
        deadline = time.time() + 10.0
        while (tx._mixer.available_chips < NativeStreamEmbedder.LOW_WATER
               and time.time() < deadline):
            time.sleep(0.01)
        out = []
        for i in range(0, host.size, 1024):
            blk = tx.process(host[i : i + 1024])
            out.append(blk)
            # real-time pacing is ~21 ms/block; give the feeder a breath
            if tx._mixer.available_chips < 2048:
                time.sleep(0.005)
        stream = np.concatenate(out)
        assert tx.frame_ctr > 100          # feeder actually rendered frames

    det = WatermarkDetector(key32, list_size=32)
    assert det.verify(stream, FS) is True


def test_structured_logging_events_fire(key32, caplog):
    """Stage-boundary events reach the `echoseal` logger (SURVEY 5.1)."""
    import logging

    from echoseal_tpu.models.detector import WatermarkDetector

    tx = WatermarkEmbedder(key32)
    wm = np.concatenate([tx.process(np.zeros(1024, np.float32))
                         for _ in range(160)])
    with caplog.at_level(logging.DEBUG, logger="echoseal"):
        assert WatermarkDetector(key32, list_size=8).verify(wm, 48_000)
    kinds = {r.message.split(" ", 1)[0] for r in caplog.records}
    assert {"scan", "llr", "verdict"} <= kinds
