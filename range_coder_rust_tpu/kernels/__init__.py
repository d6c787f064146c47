"""Pallas TPU kernels and their stream profile.

The planar profile (blocks.py) stores one byte stream per block — ideal for
XLA, but a fast in-kernel decoder needs per-lane reads at data-dependent
offsets, which TPU vector units can only do within one (8, 128) vreg
(Mosaic's 2-D dynamic gathers).  The **interleaved profile** solves this:
1024 lanes share one group stream laid out in *decode consumption order*,
so every decode step reads one contiguous, uniformly-advancing window that
fits the vreg-gather reach.  See kernels/interleave.py for the layout and
kernels/decode_pallas.py for the kernel.
"""

from .interleave import (
    GROUP_LANES,
    interleave_emissions,
    deinterleave_to_planar,
    interleaved_stream_numpy,
)

__all__ = [
    "GROUP_LANES",
    "interleave_emissions",
    "deinterleave_to_planar",
    "interleaved_stream_numpy",
]
