"""Hypothesis property tests for the pure planning arithmetic: partition
ranges / steps / collapse / unfilled planning (state/partitions.py) and the
sawtooth hop policy (windowing/resolution.py). No Ray involved — these are
the exact invariants the backfill drivers and window engines rely on
(reference: TableUtils.scala:824-841 unfilledRanges; TsUtils.round;
Resolution.scala:25-66)."""

from datetime import date, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from chronon_ray.api import UNBOUNDED, window
from chronon_ray.state.partitions import (
    PartitionRange,
    collapse_to_ranges,
    shift_ds,
    unfilled_ranges,
)
from chronon_ray.windowing.resolution import (
    MILLIS_DAY,
    MILLIS_FIVE_MIN,
    MILLIS_HOUR,
    round_ts,
    tail_hop_millis,
    window_tail,
)

_D0 = date(2023, 6, 1)


def _ds(i: int) -> str:
    return (_D0 + timedelta(days=i)).isoformat()


days_idx = st.integers(min_value=0, max_value=120)


@given(a=days_idx, n=st.integers(0, 60), step=st.integers(1, 45))
@settings(max_examples=200, deadline=None)
def test_steps_partition_exactly(a, n, step):
    """steps(k) tiles the range: disjoint, ordered, covering, each ≤ k days."""
    r = PartitionRange(_ds(a), _ds(a + n))
    chunks = r.steps(step)
    seen = []
    for c in chunks:
        parts = c.partitions()
        assert 1 <= len(parts) <= step
        seen.extend(parts)
    assert seen == r.partitions()


@given(idxs=st.sets(days_idx, max_size=40))
@settings(max_examples=200, deadline=None)
def test_collapse_roundtrip(idxs):
    """collapse_to_ranges is the inverse of flattening: contiguous, maximal,
    sorted, and reproduces the input set exactly."""
    parts = sorted(_ds(i) for i in idxs)
    ranges = collapse_to_ranges(parts)
    flat = [p for r in ranges for p in r.partitions()]
    assert flat == parts
    # maximality: consecutive ranges are separated by a real hole
    for r1, r2 in zip(ranges, ranges[1:]):
        assert shift_ds(r1.end, 1) < r2.start


@given(a=days_idx, n=st.integers(0, 40),
       have=st.sets(days_idx, max_size=40),
       inputs=st.one_of(st.none(), st.sets(days_idx, max_size=60)),
       skip=st.booleans())
@settings(max_examples=300, deadline=None)
def test_unfilled_is_set_difference(a, n, have, inputs, skip):
    req = PartitionRange(_ds(a), _ds(a + n))
    have_ds = sorted(_ds(i) for i in have)
    input_ds = sorted(_ds(i) for i in inputs) if inputs is not None else None
    got = unfilled_ranges(req, have_ds, input_partitions=input_ds,
                          skip_first_hole=skip)
    flat = sorted(p for r in got for p in r.partitions())
    want = set(req.partitions()) - set(have_ds)
    if input_ds is not None:
        want &= set(input_ds)
    if skip and have_ds:
        newest = max(set(have_ds) & set(req.partitions()), default=None)
        if newest is not None:
            want = {p for p in want if p > newest}
    assert flat == sorted(want)
    # planning a computed range again yields nothing
    again = unfilled_ranges(req, have_ds + flat, input_partitions=input_ds,
                            skip_first_hole=skip)
    assert [p for r in again for p in r.partitions()] == []


@given(i=days_idx, k=st.integers(-50, 50))
@settings(max_examples=200, deadline=None)
def test_shift_ds_group_law(i, k):
    assert shift_ds(shift_ds(_ds(i), k), -k) == _ds(i)


# ------------------------------------------------------------- resolution


@given(n=st.integers(1, 10_000),
       unit=st.sampled_from(["m", "h", "d"]))
@settings(max_examples=300, deadline=None)
def test_hop_policy_matches_reference_brackets(n, unit):
    w = window(n, unit)
    hop = tail_hop_millis(w)
    if w.millis >= 12 * MILLIS_DAY:
        assert hop == MILLIS_DAY
    elif w.millis >= 12 * MILLIS_HOUR:
        assert hop == MILLIS_HOUR
    else:
        assert hop == MILLIS_FIVE_MIN
    # hop always divides the next-larger hop and bounds tail staleness
    assert MILLIS_DAY % hop == 0
    assert hop <= max(w.millis, MILLIS_FIVE_MIN)


@given(q=st.integers(0, 2**45), n=st.integers(1, 5_000),
       unit=st.sampled_from(["m", "h", "d"]))
@settings(max_examples=300, deadline=None)
def test_window_tail_invariants(q, n, unit):
    """tail = round(q - W, hop): hop-aligned, within one hop of exact, and
    monotone in q (sawtooth never moves backwards)."""
    w = window(n, unit)
    hop = tail_hop_millis(w)
    t = window_tail(q, w)
    assert t % hop == 0
    assert t <= q - w.millis < t + hop
    t2 = window_tail(q + 1, w)
    assert t2 >= t
    assert window_tail(q, UNBOUNDED) is None
    assert round_ts(t, hop) == t
