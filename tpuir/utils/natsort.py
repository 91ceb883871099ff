"""Natural ("human") sorting, replacing the `natsort` dependency.

The reference sorts dataset file lists with ``natsort.natsorted``
(/root/reference/src/data_loaders.py:7,40-43). This is a dependency-free
equivalent: digit runs compare numerically, everything else lexically.
"""

from __future__ import annotations

import re
from typing import Iterable, List

_DIGIT_RE = re.compile(r"(\d+)")


def natural_key(s: str):
    """Sort key that orders embedded integers numerically (file2 < file10)."""
    parts = _DIGIT_RE.split(str(s))
    key = []
    for i, p in enumerate(parts):
        if i % 2:  # digit run
            key.append((1, int(p), ""))
        elif p:
            key.append((0, 0, p.lower()))
    return key


def natsorted(items: Iterable[str]) -> List[str]:
    return sorted(items, key=natural_key)
