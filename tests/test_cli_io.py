"""CLI apps + WAV I/O: offline TX file -> RX file roundtrip."""
import numpy as np
import pytest

from echoseal_tpu.cli import rx_app, tx_app
from echoseal_tpu.io import wavio

FS = 48_000


def test_wav_roundtrip_float32(tmp_path, rng):
    x = (0.1 * rng.standard_normal(FS)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wavio.write(p, x, FS)
    y, fs = wavio.read(p)
    assert fs == FS
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_wav_roundtrip_pcm16(tmp_path, rng):
    x = (0.1 * rng.standard_normal(FS)).astype(np.float32)
    p = str(tmp_path / "t16.wav")
    wavio.write(p, x, FS, subtype="pcm16")
    y, fs = wavio.read(p)
    assert fs == FS
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_load_key_hex_and_file(tmp_path, key32):
    assert tx_app.load_key("aa" * 32) == key32
    kf = tmp_path / "key.bin"
    kf.write_bytes(key32)
    assert tx_app.load_key(str(kf)) == key32


def test_cli_offline_tx_then_rx(tmp_path, key32, capsys):
    host = np.zeros(int(3.5 * FS), dtype=np.float32)
    infile = str(tmp_path / "host.wav")
    outfile = str(tmp_path / "wm.wav")
    wavio.write(infile, host, FS)

    rc = tx_app.main(["--key", "aa" * 32, "--infile", infile,
                      "--outfile", outfile])
    assert rc == 0

    rc = rx_app.main(["--key", "aa" * 32, "--audio", outfile,
                      "--list-size", "32"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "authentic" in out

    rc = rx_app.main(["--key", "bb" * 32, "--audio", outfile,
                      "--list-size", "8"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "tampered" in out


def test_cli_rejects_bad_key():
    with pytest.raises(SystemExit):
        tx_app.main(["--key", "aa" * 24])   # valid hex, wrong length


def test_cli_payload_k_knob(tmp_path, key32, monkeypatch):
    """--payload-k plumbs the v2 rate profile through both CLIs.

    Full K=360 TX->RX roundtrips are pinned at the library level
    (test_pipeline.py::test_payload_k_floor_roundtrip); here the CLI
    wiring is pinned: the flag must reach the profile the verifier is
    built with, and the compat / monitor combinations must refuse it.
    """
    import numpy as np

    from echoseal_tpu.io import wavio

    with pytest.raises(SystemExit):        # compat TX is fixed-rate
        tx_app.main(["--key", key32.hex(), "--payload-k", "360",
                     "--infile", "x.wav", "--outfile", "y.wav"])
    with pytest.raises(SystemExit):        # compat RX is fixed-rate
        rx_app.main(["--key", key32.hex(), "--payload-k", "360",
                     "--audio", "x.wav"])
    with pytest.raises(SystemExit):        # monitor runs at default rate
        rx_app.main(["--key", key32.hex(), "--profile", "v2", "--monitor",
                     "--payload-k", "360", "--audio", "x.wav"])

    seen = {}

    class _SpyVerifier:
        def __init__(self, key, *, list_size, profile):
            seen["k"] = profile.payload_k
            seen["name"] = profile.name

        def verify(self, data, fs):
            return False

    import echoseal_tpu.models.robust as robust_mod

    monkeypatch.setattr(robust_mod, "RobustVerifier", _SpyVerifier)
    wav = tmp_path / "a.wav"
    wavio.write(str(wav), np.zeros(48_000, np.float32), FS)
    rc = rx_app.main(["--key", key32.hex(), "--profile", "v2",
                      "--payload-k", "360", "--audio", str(wav)])
    assert rc == 1
    assert seen == {"k": 360, "name": "robust-k360"}


def test_cli_v2_profile_roundtrip(tmp_path, key32):
    """echoseal-tx --profile v2 -> echoseal-rx --profile v2 (offline WAVs)."""
    import numpy as np

    from echoseal_tpu.cli import rx_app, tx_app
    from echoseal_tpu.io import wavio

    host = tmp_path / "host.wav"
    wm = tmp_path / "wm.wav"
    wavio.write(str(host), np.zeros(4 * 48_000, np.float32), 48_000)
    rc = tx_app.main(["--key", key32.hex(), "--profile", "v2",
                      "--infile", str(host), "--outfile", str(wm)])
    assert rc == 0
    rc = rx_app.main(["--key", key32.hex(), "--profile", "v2",
                      "--audio", str(wm)])
    assert rc == 0
    # compat RX must NOT accept a v2 stream (wire-incompatible by design)
    rc = rx_app.main(["--key", key32.hex(), "--audio", str(wm),
                      "--list-size", "8"])
    assert rc == 1
