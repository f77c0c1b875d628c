"""Process-global observability counters for silent-path events.

The device entropy packer falls back to the (exact, slow) host coder
near capacity (encode.pack_budget), and the device entropy decoder
falls back for quirk streams whose gamma codes exceed the 31-bit device
window (decode's sync scan). Both fallbacks are bit-exact, so no test
can catch a budget regression that silently routes most tiles onto the
host path — exactly that once regressed the benchmark three times
before a manual count found 77/80 tiles falling back (see
encode.pack_budget). These counters make the rates visible: bench.py
snapshots them into its JSON line (`fallbacks`), AKO_TPU_DEV=1 logs
each fallback, and tests assert zero fallbacks on the north-star
workload (tests/test_metrics.py).

Counters are process-global and thread-safe (collect/scan work rides
worker pools); `reset()` + `counters()` bracket a measured region.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_counters: dict[str, int] = {}

#: device packer tiles framed from device-compressed bytes
ENC_DEVICE = "enc_pack_device_tiles"
#: near-capacity tiles deferred to the host coder (encode.py)
ENC_HOST_FALLBACK = "enc_pack_host_fallback_tiles"
#: tiles entropy-decoded by the device program (Kagari or Manbavaran)
DEC_DEVICE = "dec_device_tiles"
#: quirk streams (gamma codes > 31 bits) decoded on host (decode.py)
DEC_HOST_FALLBACK = "dec_sync_host_fallback_tiles"


def bump(name: str, n: int = 1) -> None:
    if n <= 0:
        return
    with _lock:
        _counters[name] = _counters.get(name, 0) + n


def counters() -> dict[str, int]:
    """Snapshot of all counters (missing keys mean zero)."""
    with _lock:
        return dict(_counters)


def reset() -> None:
    with _lock:
        _counters.clear()


def fallback_summary() -> dict[str, int]:
    """The four pipeline-placement counters, zeros included — the
    shape bench.py embeds as `fallbacks` in its JSON line."""
    c = counters()
    return {
        k: c.get(k, 0)
        for k in (ENC_DEVICE, ENC_HOST_FALLBACK, DEC_DEVICE, DEC_HOST_FALLBACK)
    }
