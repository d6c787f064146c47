"""Per-block adaptive table tests: round trips, heterogeneous-corpus wins,
block independence, container interop, CLI smoke."""

import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from range_coder_rust_tpu import format as fmt
from range_coder_rust_tpu.adaptive import (
    block_tables,
    decode_adaptive,
    encode_adaptive,
)
from range_coder_rust_tpu.api import CodecConfig, encode
from range_coder_rust_tpu.errors import ConfigError

RNG = np.random.default_rng(77)


def test_block_tables_shapes_and_sums():
    syms = jnp.asarray(RNG.integers(0, 16, size=(6, 128)).astype(np.int32))
    c, cum = block_tables(syms, alphabet=16, k=10)
    c, cum = np.asarray(c), np.asarray(cum)
    assert c.shape == (6, 16) and cum.shape == (6, 17)
    assert np.all(c.sum(axis=1) == 1 << 10)
    assert np.all(cum[:, -1] == 1 << 10)
    assert np.all(cum[:, 0] == 0)


def test_adaptive_roundtrip():
    data = RNG.integers(0, 256, size=5000).astype(np.uint8).tobytes()
    blob = encode_adaptive(data, alphabet=256, k=12, block_len=256)
    out = decode_adaptive(blob)
    assert bytes(out.astype(np.uint8).tobytes()) == data


def test_adaptive_roundtrip_partial_block_and_empty():
    for n in [0, 1, 255, 256, 257]:
        data = RNG.integers(0, 50, size=n)
        blob = encode_adaptive(data, k=10, block_len=256)
        assert np.array_equal(decode_adaptive(blob), data), f"n={n}"


def test_adaptive_beats_shared_on_heterogeneous_data():
    """Mixed corpus: each region uses a different sub-alphabet — per-block
    tables should compress meaningfully better than one shared table."""
    L = 512
    parts = []
    for i in range(8):
        lo = (i * 32) % 224
        parts.append(RNG.integers(lo, lo + 16, size=L))
    data = np.concatenate(parts)
    blob_adapt = encode_adaptive(data, alphabet=256, k=12, block_len=L)
    blob_shared = encode(
        data, alphabet=256, config=CodecConfig(k=12, block_len=L)
    )
    assert np.array_equal(decode_adaptive(blob_adapt), data)
    # ignore the table headers; compare payload bits
    pa = int(fmt.unpack(blob_adapt).lengths.sum())
    ps = int(fmt.unpack(blob_shared).lengths.sum())
    assert pa < ps * 0.75, (pa, ps)


def test_adaptive_alphabet_guard():
    with pytest.raises(ConfigError):
        encode_adaptive(np.arange(300) % 300, alphabet=300, k=8)


def test_adaptive_container_flags():
    blob = encode_adaptive(b"abcabcabc" * 50, k=8, block_len=64)
    cont = fmt.unpack(blob)
    assert cont.per_block_tables
    assert cont.n_blocks == len(cont.payloads)
    assert cont.tables_c.shape == (cont.n_blocks, cont.alphabet)


def test_cli_roundtrip(tmp_path):
    src = tmp_path / "in.bin"
    comp = tmp_path / "out.rc"
    back = tmp_path / "back.bin"
    payload = bytes(RNG.integers(0, 200, size=3000, dtype=np.uint8))
    src.write_bytes(payload)
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    r = subprocess.run(
        [sys.executable, "-m", "range_coder_rust_tpu", "encode", str(src),
         "-o", str(comp), "--k", "12", "--block-len", "256"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    r = subprocess.run(
        [sys.executable, "-m", "range_coder_rust_tpu", "inspect", str(comp)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0 and '"n_symbols": 3000' in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "range_coder_rust_tpu", "decode", str(comp),
         "-o", str(back)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert back.read_bytes() == payload


def test_cli_selftest():
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    r = subprocess.run(
        [sys.executable, "-m", "range_coder_rust_tpu", "selftest"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0 and "selftest passed" in r.stdout


def test_scalar_adaptive_model_roundtrip():
    """Adaptive PModel through the scalar streaming coder: no table is
    transmitted; encoder and decoder models evolve in lock-step (the
    model-agnosticism contract, reference README.md:4-6)."""
    from range_coder_rust_tpu.models.adaptive_freq import (
        decode_adaptive_scalar,
        encode_adaptive_scalar,
    )

    data = RNG.integers(0, 40, size=1200).tolist()
    code = encode_adaptive_scalar(data, 40)
    out = decode_adaptive_scalar(code, len(data), 40)
    assert out == data
    # adaptivity pays: skewed tail compresses below uniform-model cost
    skewed = ([3] * 800) + RNG.integers(0, 40, size=100).tolist()
    code2 = encode_adaptive_scalar(skewed, 40)
    assert len(code2) < len(skewed) * 0.45


def test_scalar_adaptive_rescale_path():
    from range_coder_rust_tpu.models.adaptive_freq import AdaptiveFreqTable

    m = AdaptiveFreqTable(4)
    m.RESCALE_AT = 64
    for _ in range(100):
        m.update(1)
    assert m.total_freq() == int(sum(m.c_freq(i) for i in range(4)))
    assert all(m.c_freq(i) >= 1 for i in range(4))
    assert m.cum_freq(0) == 0
