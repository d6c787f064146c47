"""Test-dir conftest: make the package importable from a source checkout.

Backend selection (CPU, 8 virtual devices) happens in the repo-root
conftest.py, which re-execs pytest with a corrected environment before
pytest's output capture starts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
