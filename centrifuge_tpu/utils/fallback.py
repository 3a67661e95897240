"""Loud (log-once) native-path fallback reporting.

Every native extension in the tree (assign.cpp, pack.cpp, fmwalk.cpp,
sais.cpp) has a pure-Python/numpy fallback so the framework *works*
without a toolchain -- but a silent fallback hides real regressions (a
broken .so quietly costs 2-10x throughput). Each loader calls
``warn_fallback(component, exc)`` when it gives up on the native path:
one warning per component per process on stderr, and the event is
recorded so bench.py can flag it in its JSON line.
"""

from __future__ import annotations

import sys
import traceback
from typing import Dict

_WARNED: Dict[str, str] = {}


def warn_fallback(component: str, exc: BaseException) -> None:
    """Log (once per component) that a native path fell back to Python."""
    if component in _WARNED:
        return
    reason = f"{type(exc).__name__}: {exc}"
    _WARNED[component] = reason
    print(f"centrifuge-tpu WARNING: native {component} unavailable "
          f"({reason}); falling back to the slower Python path",
          file=sys.stderr, flush=True)


def fallbacks() -> Dict[str, str]:
    """Component -> reason for every native fallback seen so far."""
    return dict(_WARNED)
