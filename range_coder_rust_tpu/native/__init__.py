"""Native (C++) runtime components: scalar golden coder for conformance and
CPU throughput anchoring."""

from . import golden

__all__ = ["golden"]
