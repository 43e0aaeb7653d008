"""Superseded splat renderer generations, kept as documented history.

These are NOT part of the live capability surface (PARITY.md §2.1):

  * ``splat_pallas`` — the first windowed one-hot Pallas kernel; VMEM-bound
    at 1024² and superseded by the CSR-routed kernel (ops/splat_routed.py).
  * ``splat_delta`` — the displacement-decomposed kernel whose measured
    cost profile motivated the banded design (ops/splat_banded.py).

The production frame-loop renderer is ops/splat_posed.py (pose-invariant
records + depth-cluster routing); the exact XLA baseline is ops/splat.py.
A third generation, the sort-based ``splat_sorted``, was deleted outright
in round 5 — its semantics are pinned by the scatter path it duplicated.
``EffectConfig.splat_method`` still accepts 'pallas' and 'delta' so the
history stays runnable, importing from here on demand.
"""
