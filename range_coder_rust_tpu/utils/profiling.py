"""Tracing / profiling / observability (SURVEY.md §5: absent in the
reference — its only introspection is state getters and example prints).

* :func:`annotate` — named trace regions that show up in `jax.profiler`
  timelines (and as xplane annotations when a trace server is attached);
* :func:`trace_to` — capture a profiler trace of a callable to a directory;
* :class:`CodecMetrics` — compression observability: achieved bits/symbol
  against the order-0 Shannon bound built from ``ideal_code_length``
  semantics (reference src/pmodel.rs:14-40), flush/container overheads,
  throughput.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region for profiler timelines; no-op cost when not tracing."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture a `jax.profiler` trace (viewable in TensorBoard/XProf)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput_gbps(n_bytes: int, seconds: float) -> float:
    return n_bytes / 1e9 / max(seconds, 1e-12)


@dataclasses.dataclass
class CodecMetrics:
    """Per-run compression/throughput report."""

    n_symbols: int
    payload_bytes: int
    container_bytes: int
    encode_seconds: float
    decode_seconds: float
    entropy_bits: Optional[float] = None  # order-0 Shannon bound

    @classmethod
    def measure(cls, data: np.ndarray, blob: bytes, enc_s: float, dec_s: float,
                payload_bytes: Optional[int] = None) -> "CodecMetrics":
        data = np.asarray(data).reshape(-1)
        counts = np.bincount(data.astype(np.int64))
        p = counts[counts > 0] / data.size
        entropy = float(-(p * np.log2(p)).sum()) if data.size else 0.0
        return cls(
            n_symbols=int(data.size),
            payload_bytes=int(payload_bytes if payload_bytes is not None else len(blob)),
            container_bytes=len(blob),
            encode_seconds=enc_s,
            decode_seconds=dec_s,
            entropy_bits=entropy,
        )

    @property
    def bits_per_symbol(self) -> float:
        return 8 * self.payload_bytes / max(self.n_symbols, 1)

    @property
    def efficiency(self) -> float:
        """Shannon-bound efficiency: ideal bits / achieved bits (<= ~1)."""
        if not self.entropy_bits:
            return float("nan")
        return self.entropy_bits / self.bits_per_symbol

    def as_dict(self) -> dict:
        return {
            "n_symbols": self.n_symbols,
            "payload_bytes": self.payload_bytes,
            "container_bytes": self.container_bytes,
            "bits_per_symbol": round(self.bits_per_symbol, 4),
            "entropy_bits_per_symbol": round(self.entropy_bits or 0.0, 4),
            "efficiency_vs_shannon": round(self.efficiency, 4),
            "encode_gbps": round(throughput_gbps(self.n_symbols, self.encode_seconds), 4),
            "decode_gbps": round(throughput_gbps(self.n_symbols, self.decode_seconds), 4),
        }
