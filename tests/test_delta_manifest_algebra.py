"""Pure-manifest property tests for the versioned manifest algebra
(no Spark): _delta_boundary / _delta_vers / _resolve_epochs are pure
functions of history(), and every read's correctness rests on the
invariants of that algebra — pinned here under hypothesis over random
manifests, including purge-collapsed prefixes (the shape that carried
the one real bug the round-10 bring-up found: a collapse losing delta
versions still inside retained windows) and, from round 11, RESTORE
entries (metadata-only rollback: a base-shaped entry that RESETS the
walk state — the replacement-walk semantics; naive accumulation would
overlay restored-away windows, the bug the banked design warned
against).

The collapse/prune replicas below mirror purge_versions' round-11
rules: epoch dirs survive iff SOME retained version resolves to them
(union rule — a retained restore may reference epochs far below the
cutoff assignment, so the old assign(cutoff)-only rule is unsound),
and delta-log dirs survive iff they sit in SOME retained version's
window (the old `ver <= boundary(cutoff)` delete rule relied on
boundary monotonicity, which restore breaks by design)."""

from hypothesis import given, settings, strategies as st

from firebolt_cdc_lambda_spark.operators.merge import KeyedTable

NB = 2  # model bucket count


class _Stub:
    """The minimal surface the manifest algebra touches — the REAL
    methods are borrowed onto it, so this tests the production
    algebra, not a copy."""

    _delta_boundary = KeyedTable._delta_boundary
    _delta_vers = KeyedTable._delta_vers
    _resolve_epochs = KeyedTable._resolve_epochs
    _schema_text_as_of = KeyedTable._schema_text_as_of

    num_buckets = NB

    def __init__(self, entries):
        self._entries = entries

    def history(self):
        return sorted(self._entries, key=lambda e: int(e["e"]))


# an op sequence: each element becomes manifest entry e=i+1 on top of
# the init full at e=0.  "restore" carries a raw draw reduced mod the
# number of existing versions at build time (any version is a legal
# target pre-purge).  "fold0" models a fold that EMPTIES bucket 0
# (its logged keys all deleted) — exercises the dropped-bucket walk
# under restore resurrection.
_OP = st.one_of(
    st.sampled_from(["delta", "fold", "fold0", "rewrite", "evolve",
                     "merge0", "merge1"]),
    st.tuples(st.just("restore"),
              st.integers(min_value=0, max_value=10_000),
              st.booleans()))                 # restore_schema flip
_OPS = st.lists(_OP, min_size=0, max_size=24)


def _build(ops):
    """Entries + an independent MODEL of the expected algebra: for each
    version, (boundary, window, bucket->epoch assignment, live files,
    schema id).  Restore entries carry the records the production
    restore() writes — computed from the MODEL, so the test checks both
    the record's construction contract and the production walk that
    consumes it.  Schema records (round 12): init/rewrite/evolve stamp
    the schema they write ("evolve" is a rewrite that CHANGES it — the
    evolution path); a restore stamps the schema it leaves in force
    (the target's under restore_schema=True, the pre-restore one
    otherwise); merges/folds/deltas carry none."""
    entries = [{"e": 0, "op": "init", "full": True,
                "buckets": list(range(NB)), "emptied": [],
                "num_buckets": NB, "schema": 0}]
    lo = {0: 0}
    win = {0: ()}
    assign = {0: {b: 0 for b in range(NB)}}
    sch = {0: 0}                          # model: schema ids, 0 = initial
    next_sch = 1
    files = {(b, 0) for b in range(NB)}   # (bucket, epoch) leaf dirs
    log_dirs = set()                      # _delta_ver partition dirs
    for i, op in enumerate(ops, start=1):
        if isinstance(op, tuple):
            t = op[1] % i                 # any existing version
            flip = op[2]
            sch[i] = sch[t] if flip else sch[i - 1]
            e = {"e": i, "op": "restore", "restored_from": t,
                 "base": {str(b): ep for b, ep in assign[t].items()},
                 "num_buckets": NB, "buckets": [], "emptied": [],
                 "delta_boundary": lo[t], "delta_vers": list(win[t]),
                 "schema": sch[i]}
            lo[i], win[i] = lo[t], win[t]
            assign[i] = dict(assign[t])   # pure metadata: no files
        elif op in ("rewrite", "evolve"):
            if op == "evolve":
                sch[i] = next_sch
                next_sch += 1
            else:
                sch[i] = sch[i - 1]       # rewrite stamps, unchanged
            e = {"e": i, "op": "rewrite", "full": True,
                 "buckets": list(range(NB)), "emptied": [],
                 "num_buckets": NB, "schema": sch[i]}
            lo[i], win[i] = i, ()
            assign[i] = {b: i for b in range(NB)}
            files |= {(b, i) for b in range(NB)}
        elif op in ("fold", "fold0"):
            sch[i] = sch[i - 1]
            kept = [1] if op == "fold0" else list(range(NB))
            emptied = [0] if op == "fold0" else []
            e = {"e": i, "op": "fold", "buckets": kept,
                 "emptied": emptied, "num_buckets": NB}
            lo[i], win[i] = i, ()
            assign[i] = dict(assign[i - 1])
            for b in kept:
                assign[i][b] = i
                files.add((b, i))
            for b in emptied:
                assign[i].pop(b, None)
        elif op in ("merge0", "merge1"):
            sch[i] = sch[i - 1]
            b = int(op[-1])
            e = {"e": i, "op": "merge", "buckets": [b], "emptied": [],
                 "num_buckets": NB}
            lo[i], win[i] = lo[i - 1], win[i - 1]
            assign[i] = dict(assign[i - 1])
            assign[i][b] = i
            files.add((b, i))
        else:                             # delta append
            sch[i] = sch[i - 1]
            e = {"e": i, "op": "delta", "buckets": [], "emptied": [],
                 "num_buckets": NB, "delta_buckets": [0]}
            lo[i] = lo[i - 1]
            win[i] = tuple(win[i - 1]) + (i,)
            assign[i] = dict(assign[i - 1])
            log_dirs.add(i)
        entries.append(e)
    return entries, lo, win, assign, files, log_dirs, sch


def _collapse(entries, keep_last, files, log_dirs):
    """purge_versions' round-11 manifest collapse + prune rules,
    replicated structurally: epoch dirs and log dirs survive iff some
    RETAINED version references them (union over retained resolutions /
    windows — sound under restore, which breaks the boundary
    monotonicity the old rules leaned on), and the base entry records
    the WALK STATE at cutoff-1 with its delta record filtered to the
    union (manifest and disk agree)."""
    ordered = sorted(entries, key=lambda e: int(e["e"]))
    if len(ordered) <= keep_last:
        return entries, files, log_dirs
    cutoff = int(ordered[-keep_last]["e"])
    stub = _Stub(entries)
    retained = [en for en in ordered if int(en["e"]) >= cutoff]
    needed_files = set()
    needed_vers = set()
    for en in retained:
        v = int(en["e"])
        a, _ = stub._resolve_epochs(v)
        needed_files |= set(a.items())
        needed_vers |= set(stub._delta_vers(v))
    files = {f for f in files if f in needed_files or f[1] >= cutoff}
    log_dirs = log_dirs & needed_vers
    a_cut, _ = stub._resolve_epochs(cutoff)
    base = {"e": cutoff - 1, "op": "base",
            "base": {str(b): e for b, e in a_cut.items() if e < cutoff},
            "num_buckets": NB,
            "delta_boundary": stub._delta_boundary(cutoff - 1),
            "delta_vers": [v for v in stub._delta_vers(cutoff - 1)
                           if v in needed_vers]}
    # schema record (round 12): the walk state at the cutoff — purged
    # entries may have carried the record retained versions resolve to
    s_cut = stub._schema_text_as_of(cutoff - 1)
    if s_cut is not None:
        base["schema"] = s_cut
    return [base] + retained, files, log_dirs


@settings(max_examples=300, deadline=None)
@given(_OPS)
def test_window_invariants(ops):
    """_delta_boundary/_delta_vers match the independent replacement-
    walk model at every version: a restore's window IS its target's
    window (entries of restored-away versions never leak through), and
    absent restores the boundary is monotone (the pre-round-11
    invariant, preserved where it held)."""
    entries, lo, win, *_ = _build(ops)
    stub = _Stub(entries)
    latest = len(ops)
    prev_b = 0
    any_restore = any(isinstance(op, tuple) for op in ops)
    for v in range(latest + 1):
        b = stub._delta_boundary(v)
        w = stub._delta_vers(v)
        assert 0 <= b <= v                  # boundary inside range
        assert b == lo[v]
        assert w == sorted(win[v])
        if not any_restore:
            assert b >= prev_b              # monotone absent restores
        prev_b = b
    assert stub._delta_boundary(None) == lo[latest]
    assert stub._delta_vers(None) == stub._delta_vers(latest)


@settings(max_examples=300, deadline=None)
@given(_OPS)
def test_assignment_matches_model(ops):
    """_resolve_epochs matches the independent model at every version:
    a restore entry resolves to its TARGET's assignment verbatim
    (including buckets a later fold had emptied), and every referenced
    (bucket, epoch) leaf exists."""
    entries, _, _, assign, files, _, _ = _build(ops)
    stub = _Stub(entries)
    for v in range(len(ops) + 1):
        a, nb = stub._resolve_epochs(v)
        assert nb == NB
        assert a == assign[v], v
        assert set(a.items()) <= files


@settings(max_examples=300, deadline=None)
@given(_OPS, st.integers(min_value=1, max_value=8),
       st.integers(min_value=1, max_value=8))
def test_collapse_preserves_retained_resolution(ops, keep1, keep2):
    """The purge collapse + union prune must not change ANY retained
    version's boundary, window, or assignment — including after a
    SECOND collapse — and everything a retained version references
    (epoch leaves, log dirs) must survive the prune.  This is the
    unsound-prune case the banked design called out: a retained
    restore may reference epochs/log versions BELOW the cutoff
    assignment's, which the old assign(cutoff)/boundary(cutoff) rules
    would have deleted."""
    entries, lo, win, assign, files, log_dirs, sch = _build(ops)
    latest = len(ops)
    for keep in (keep1, keep2):
        entries, files, log_dirs = _collapse(entries, keep, files,
                                             log_dirs)
        ordered = sorted(entries, key=lambda e: int(e["e"]))
        stub = _Stub(entries)
        retained = [int(e["e"]) for e in ordered
                    if e.get("op") != "base"]
        for v in retained:
            assert stub._delta_boundary(v) == lo[v], v
            assert stub._delta_vers(v) == sorted(win[v]), v
            a, _ = stub._resolve_epochs(v)
            assert a == assign[v], v
            assert set(a.items()) <= files, v
            assert set(stub._delta_vers(v)) <= log_dirs, v
            # schema resolution survives the collapse: the record a
            # retained version resolved to may have lived on a PURGED
            # entry — the base entry must carry the walk state
            assert stub._schema_text_as_of(v) == sch[v], v
        # manifest-and-disk agreement: the base record names only
        # surviving log dirs (advice finding, round 10)
        base = ordered[0]
        if base.get("op") == "base":
            assert set(base.get("delta_vers", ())) <= log_dirs


@settings(max_examples=300, deadline=None)
@given(_OPS)
def test_schema_walk_matches_model(ops):
    """_schema_text_as_of matches the independent model at every
    version (round 12): the newest visible record wins; a rewrite
    re-stamps without changing it; an "evolve" rewrite changes it; a
    restore leaves the PRE-restore schema in force unless it flipped
    (restore_schema=True), in which case the TARGET's schema returns —
    and restored-away evolutions never leak through."""
    entries, *_, sch = _build(ops)
    stub = _Stub(entries)
    for v in range(len(ops) + 1):
        assert stub._schema_text_as_of(v) == sch[v], v
    assert stub._schema_text_as_of(None) == sch[len(ops)]


@settings(max_examples=100, deadline=None)
@given(_OPS)
def test_schema_walk_none_on_recordless_manifest(ops):
    """A manifest written entirely by pre-round-12 code carries no
    schema records; the walk answers None at EVERY version (callers
    fall back to / raise toward the current-sidecar pin — the old
    contract), never a half-resolved schema."""
    entries, *_ = _build(ops)
    stripped = [{k: val for k, val in e.items() if k != "schema"}
                for e in entries]
    stub = _Stub(stripped)
    for v in range(len(ops) + 1):
        assert stub._schema_text_as_of(v) is None, v
