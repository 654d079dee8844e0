"""Kernel-selection telemetry (VERDICT r5 #2).

The auto-gated operators (Arrow einsum vs JVM Column/HOF kernels in
similarity and MinHash signatures) pick their kernel from plan-estimated
input sizes — which made bench regressions unattributable: a slow number
could be the kernel, the gate flipping, or host noise, and the official
record couldn't tell. Each decision site now records its choice here;
``bench.py`` drains the buffer per query and prints one stderr line
naming the kernels that actually ran.

Deliberately tiny and stdlib-only: a module-level dict, no locks (Spark
driver-side plan construction is single-threaded per query in every
caller), no behavior coupling — draining is observational.
"""

from __future__ import annotations

_CHOICES: dict[str, str] = {}


def record_kernel(op: str, kernel: str) -> None:
    """Record that ``op`` selected ``kernel`` (e.g. 'arrow', 'hof',
    'column') at plan-construction time."""
    _CHOICES[op] = kernel


def drain_kernels() -> dict[str, str]:
    """Return and clear all recorded choices since the last drain."""
    out = dict(_CHOICES)
    _CHOICES.clear()
    return out
