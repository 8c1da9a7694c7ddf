"""Pure-manifest property tests for the versioned-delta window algebra
(no Spark): _delta_boundary / _delta_vers are pure functions of
history(), and every read's correctness rests on four invariants of
that algebra — pinned here under hypothesis over random manifests,
including purge-collapsed prefixes (the shape that carried the one
real bug this feature's bring-up found: a collapse losing delta
versions still inside retained windows)."""

from hypothesis import given, settings, strategies as st

from firebolt_cdc_lambda_spark.operators.merge import KeyedTable


class _Stub:
    """The minimal surface _delta_boundary/_delta_vers touch — the
    REAL methods are borrowed onto it, so this tests the production
    algebra, not a copy."""

    _delta_boundary = KeyedTable._delta_boundary
    _delta_vers = KeyedTable._delta_vers

    def __init__(self, entries):
        self._entries = entries

    def history(self):
        return sorted(self._entries, key=lambda e: int(e["e"]))


# an op sequence: each element becomes manifest entry e=i+1 on top of
# the init full at e=0
_OPS = st.lists(st.sampled_from(["delta", "fold", "rewrite", "merge"]),
                min_size=0, max_size=24)


def _build(ops):
    entries = [{"e": 0, "op": "init", "full": True,
                "buckets": [0], "emptied": [], "num_buckets": 1}]
    for i, op in enumerate(ops, start=1):
        e = {"e": i, "op": op, "buckets": [], "emptied": [],
             "num_buckets": 1}
        if op == "rewrite":
            e["full"] = True
        if op == "merge":
            e["buckets"] = [0]
        if op == "delta":
            e["delta_buckets"] = [0]
        entries.append(e)
    return entries


def _collapse(entries, keep_last):
    """purge_versions' manifest collapse, replicated structurally: the
    base entry records delta_boundary(cutoff-1) and the prefix's delta
    versions above it (merging any earlier base's record)."""
    ordered = sorted(entries, key=lambda e: int(e["e"]))
    if len(ordered) <= keep_last:
        return entries
    cutoff = int(ordered[-keep_last]["e"])
    stub = _Stub(entries)
    bnd_rec = stub._delta_boundary(cutoff - 1)
    carried = set()
    for en in ordered:
        if int(en["e"]) >= cutoff:
            continue
        if "base" in en:
            carried.update(int(v) for v in en.get("delta_vers", ()))
        elif en.get("op") == "delta":
            carried.add(int(en["e"]))
    base = {"e": cutoff - 1, "op": "base", "base": {},
            "num_buckets": 1, "delta_boundary": bnd_rec,
            "delta_vers": sorted(v for v in carried if v > bnd_rec)}
    return [base] + [en for en in ordered if int(en["e"]) >= cutoff]


@settings(max_examples=300, deadline=None)
@given(_OPS)
def test_window_invariants(ops):
    entries = _build(ops)
    stub = _Stub(entries)
    latest = len(ops)
    deltas = {i for i, op in enumerate(ops, start=1) if op == "delta"}
    prev_b = 0
    for v in range(latest + 1):
        b = stub._delta_boundary(v)
        w = stub._delta_vers(v)
        assert 0 <= b <= v                      # boundary inside range
        assert b >= prev_b                      # monotone in version
        prev_b = b
        # the window is EXACTLY the delta versions in (boundary, v]
        assert w == sorted(x for x in deltas if b < x <= v)
    # as_of=None == latest
    assert stub._delta_boundary(None) == prev_b
    assert stub._delta_vers(None) == \
        stub._delta_vers(latest)


@settings(max_examples=300, deadline=None)
@given(_OPS, st.integers(min_value=1, max_value=8),
       st.integers(min_value=1, max_value=8))
def test_collapse_preserves_retained_windows(ops, keep1, keep2):
    """The purge-collapse must not change ANY retained version's
    boundary or window — including after a SECOND collapse (the base
    entry's record must merge forward)."""
    entries = _build(ops)
    stub0 = _Stub(entries)
    latest = len(ops)
    want = {v: (stub0._delta_boundary(v), stub0._delta_vers(v))
            for v in range(latest + 1)}
    for keep in (keep1, keep2):
        entries = _collapse(entries, keep)
        ordered = sorted(entries, key=lambda e: int(e["e"]))
        stub = _Stub(entries)
        retained = [int(e["e"]) for e in ordered if "base" not in e]
        for v in retained:
            assert (stub._delta_boundary(v),
                    stub._delta_vers(v)) == want[v], v
