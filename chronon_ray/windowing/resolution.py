"""Sawtooth hop resolution policy.

Parity with the reference (reference: aggregator/windowing/Resolution.scala:
25-47 FiveMinuteResolution; api/thrift/api.thrift:196-201): the window tail
"hops" at a resolution that depends on window size, trading tail staleness for
bounded per-key work:

    window >= 12 days  -> 1-day hops
    window >= 12 hours -> 1-hour hops
    else               -> 5-minute hops

and window membership for a query at time ``q`` over window ``W`` is

    round(q - W, hop) <= event.ts < q          (strict head, hopped tail)

(reference: aggregator/test/NaiveAggregator.scala:39-41; TsUtils.scala:39-40
``round = (ts / hop) * hop``). Unbounded windows have no tail.
"""

from __future__ import annotations

from ..api import UNBOUNDED, Window

MILLIS_FIVE_MIN = 5 * 60 * 1000
MILLIS_HOUR = 3_600_000
MILLIS_DAY = 86_400_000

#: descending, each a multiple of the next (Resolution.scala:46-47)
HOP_SIZES = (MILLIS_DAY, MILLIS_HOUR, MILLIS_FIVE_MIN)


def tail_hop_millis(window: Window, daily: bool = False) -> int:
    if window.unbounded:
        return 0  # no tail
    if daily:
        return DailyResolution.tail_hop_millis(window)
    w = window.millis
    if w >= 12 * MILLIS_DAY:
        return MILLIS_DAY
    if w >= 12 * MILLIS_HOUR:
        return MILLIS_HOUR
    return MILLIS_FIVE_MIN


def round_ts(ts, hop):
    """Floor to hop multiple (TsUtils.round). Works scalar or numpy."""
    return (ts // hop) * hop


def window_tail(query_ts, window: Window, daily: bool = False):
    """Hop-rounded inclusive window start for a query time (vectorized)."""
    if window.unbounded:
        return None
    return round_ts(query_ts - window.millis, tail_hop_millis(window, daily))


class DailyResolution:
    """Snapshot accuracy: 1-day hops only (Resolution.scala:55-66)."""

    @staticmethod
    def tail_hop_millis(window: Window) -> int:
        if window.unbounded:
            return 0
        if window.millis % MILLIS_DAY != 0:
            raise ValueError(
                f"window {window.str} invalid for daily accuracy: must be whole days"
            )
        return MILLIS_DAY
