"""Tk GUIs: live transmitter (VU meter) and file verifier.

Mirrors the reference gui/ tier (tx_gui.py, rx_gui.py).  Tkinter and the
audio stack are imported lazily so headless/serving images can import the
package without them.
"""
