"""CLI surface: encode/decode/inspect through __main__.main(), including
the decode output-width rule (VERDICT r4: an unconditional uint8 cast
silently truncated alphabet > 256 containers)."""

import json

import numpy as np

from range_coder_rust_tpu import api
from range_coder_rust_tpu.__main__ import main


def test_cli_roundtrip_bytes(tmp_path):
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=20000).astype(np.uint8).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    blob = tmp_path / "out.rc"
    out = tmp_path / "rt.bin"
    assert main(["encode", str(src), "-o", str(blob),
                 "--block-len", "64"]) == 0
    assert main(["decode", str(blob), "-o", str(out)]) == 0
    assert out.read_bytes() == data


def test_cli_decode_wide_alphabet_writes_u16(tmp_path, capsys):
    """alphabet > 256 must write little-endian u16 symbols, not a
    truncated byte per symbol."""
    rng = np.random.default_rng(4)
    sym = rng.integers(0, 700, size=5000).astype(np.int32)
    # wide alphabets route to the planar profile via the api fallback
    blob_bytes = api.encode(sym, alphabet=700,
                            config=api.CodecConfig(k=16, block_len=128))
    blob = tmp_path / "wide.rc"
    blob.write_bytes(blob_bytes)
    out = tmp_path / "wide.bin"
    assert main(["decode", str(blob), "-o", str(out)]) == 0
    got = np.frombuffer(out.read_bytes(), dtype="<u2")
    np.testing.assert_array_equal(got, sym.astype(np.uint16))


def test_cli_inspect(tmp_path, capsys):
    data = bytes(range(256)) * 40
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    blob = tmp_path / "out.rc"
    assert main(["encode", str(src), "-o", str(blob),
                 "--block-len", "64"]) == 0
    capsys.readouterr()
    assert main(["inspect", str(blob)]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["n_symbols"] == len(data) and meta["alphabet"] == 256
