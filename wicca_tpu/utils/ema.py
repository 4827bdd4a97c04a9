"""Shared EMA rate tracker for the measured-bandwidth cost models.

Four subsystems measure a throughput and smooth it with the same EMA shape
(host IDWT rate, host forward-cascade rate, host icon rate, D2H link
bandwidth — codec/host_decode.py, codec/host_encode.py, core/icon_host.py,
codec/transfer.py). This is the one implementation; each keeps its
module-level accessor names so callers and tests are unaffected.
"""

from __future__ import annotations


class RateEMA:
    """Exponential moving average of a measured rate (units per second).

    ``rate()`` returns ``prior`` until the first sample (or ``None`` when no
    prior is given — the link tracker's "unmeasured" state). Samples below
    ``min_units`` are ignored: tiny work items time the dispatch overhead,
    not the path (same guard every tracker used)."""

    def __init__(self, prior: float | None, alpha: float = 0.4, min_units: float = 0.0):
        self.prior = prior
        self.alpha = alpha
        self.min_units = min_units
        self._value: float | None = None

    def rate(self) -> float | None:
        return self._value if self._value is not None else self.prior

    def record(self, units: float, seconds: float) -> None:
        if seconds <= 0 or units < self.min_units:
            return
        r = units / seconds
        self._value = r if self._value is None else (
            self.alpha * r + (1.0 - self.alpha) * self._value
        )

    def reset(self) -> None:
        self._value = None
