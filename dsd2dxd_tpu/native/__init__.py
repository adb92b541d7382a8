"""Native C++ host components (ctypes-loaded shared library).

Holds the byte-hot host paths that the reference implements natively in
Rust (SURVEY.md §2.3): PCM packing, the FLAC encoder, noise-shaped dither
(NJAD), and the delta-sigma modulator fast path. Built on demand from
``native/src`` with g++; pure-numpy fallbacks exist for every function, so
``lib`` may be None.
"""

from __future__ import annotations

lib = None  # populated by dsd2dxd_tpu.native.loader when the extension is built

try:
    from dsd2dxd_tpu.native.loader import load as _load

    lib = _load()
except Exception:  # pragma: no cover - fallback to numpy paths
    lib = None
