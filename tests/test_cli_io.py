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
