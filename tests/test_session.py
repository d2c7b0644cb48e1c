"""Session checkpoint/resume + structured logging utilities."""
import numpy as np

from echoseal_tpu.core import session
from echoseal_tpu.models.detector import WatermarkDetector
from echoseal_tpu.models.embedder import WatermarkEmbedder


def test_tx_checkpoint_resume(tmp_path, key32):
    tx = WatermarkEmbedder(key32)
    out1 = tx.process(np.zeros(2000, dtype=np.float32))
    p = tmp_path / "tx.json"
    session.save_tx(tx, p)

    tx2 = WatermarkEmbedder(key32)
    session.load_tx(tx2, p)
    assert tx2.frame_ctr == tx.frame_ctr          # no counter replay
    assert tx2._session_nonce == tx._session_nonce
    np.testing.assert_array_equal(tx2._chip_buf, tx._chip_buf)
    # buffered chips drain identically; fresh frames may differ (random
    # AEAD nonce + padding) but counters stay in lockstep
    tx.process(np.zeros(400, dtype=np.float32))
    tx2.process(np.zeros(400, dtype=np.float32))
    assert tx2.frame_ctr == tx.frame_ctr


def test_rx_checkpoint_resume(tmp_path, key32):
    det = WatermarkDetector(key32, list_size=8)
    det.session_nonce = b"12345678"
    p = tmp_path / "rx.json"
    session.save_rx(det, p)
    det2 = WatermarkDetector(key32, list_size=8)
    session.load_rx(det2, p)
    assert det2.session_nonce == b"12345678"      # anti-replay latch survives


def test_structured_logger_rate_limit():
    from echoseal_tpu.utils.logging import Timer, get_logger

    log = get_logger("test", min_interval_s=60.0)
    log.event("x", a=1)
    log.event("x", a=2)   # rate-limited away, must not raise
    with Timer("unit") as t:
        pass
    assert t.elapsed >= 0.0
    assert "unit" in Timer.report()
