"""Developer diagnostics (the reference's L9 script tier, rebuilt clean).

Each module is ``python -m echoseal_tpu.diagnostics.<name>`` runnable:

* ``frame_check``       -- synthesize a frame, demodulate it, report chip
  BER / alignment / header decode per band (replaces watermark_check,
  frame_aligment_check, tx_rx_signal_comparison_debugger).
* ``polar_roundtrip``   -- AWGN BER/BLER sweep of the polar codec for both
  info-set conventions (replaces polar_code_roundtrip,
  polar_readibility_check, frozen_bit_check).
* ``pn_check``          -- PN keystream determinism + hop-schedule audit
  (replaces rountrip_check's PN sections, comparison_debugger).
* ``frozen_check``      -- frozen-set / info-set audit for both profiles:
  convention membership + encode->decode round trip (parity with the
  reference's frozen_bit_check.py, which printed but never checked).
* ``capability_report`` -- accept-rate matrix across hosts & impairments:
  the honest measured envelope of the compat wire format.
"""
