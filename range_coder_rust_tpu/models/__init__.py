"""Probability models: scalar PModel implementations and array-native tables."""

from .freq_table import FreqTable

__all__ = ["FreqTable"]
