"""Property tests for the KV key codec: any representable key tuple must
round-trip (export → import restores the declared column), and key_bytes
must be injective per distinct logical key and dtype-invariant (the same
logical key exports identical bytes from any block dtype)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from chronon_ray.serving import _canon_key

_scalars = st.one_of(
    st.none(),
    st.integers(min_value=-2**62, max_value=2**62),
    st.text(max_size=20),
    st.booleans(),
    st.binary(max_size=16),
)


@given(st.lists(st.tuples(_scalars, _scalars), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_canon_key_injective_and_stable(tuples):
    import pickle

    enc = [pickle.dumps(tuple(_canon_key(v) for v in t), protocol=4)
           for t in tuples]
    # injective: distinct logical tuples -> distinct bytes. Identity is
    # type-tagged: True and 1 are equal in a python set but are DIFFERENT
    # keys (a key column has one Arrow type; bool and int never mix)
    logical = [tuple((type(v).__name__, v) for v in t) for t in tuples]
    assert (len(set(enc)) == len(set(logical)))
    # dtype-invariance: numpy-wrapped scalars encode identically
    for t, e in zip(tuples, enc):
        wrapped = tuple(
            np.int64(v) if isinstance(v, int) and not isinstance(v, bool)
            else (np.bool_(v) if isinstance(v, bool) else v)
            for v in t)
        import pickle as _p
        assert _p.dumps(tuple(_canon_key(v) for v in wrapped),
                        protocol=4) == e


@given(st.lists(st.integers(min_value=-2**31 + 1, max_value=2**31 - 1),
                min_size=1, max_size=20, unique=True))
@settings(max_examples=25, deadline=None)
def test_kv_round_trip_int_keys(ray_session, ints):
    import ray.data as rd

    from chronon_ray.serving import kv_export, kv_import

    t = pa.table({"k": pa.array(ints, type=pa.int64()),
                  "payload": pa.array([f"v{i}" for i in ints])})
    back = kv_import(kv_export(rd.from_arrow(t), ["k"]),
                     [pa.field("k", pa.int64())]).to_pandas()
    back = back.sort_values("k").reset_index(drop=True)
    assert back["k"].tolist() == sorted(ints)
    assert (back["payload"] == [f"v{i}" for i in sorted(ints)]).all()
