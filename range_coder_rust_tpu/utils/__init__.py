"""Utilities: profiling/tracing instrumentation and throughput metrics."""

from .profiling import CodecMetrics, annotate, throughput_gbps

__all__ = ["annotate", "throughput_gbps", "CodecMetrics"]
