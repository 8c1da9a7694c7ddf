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
        needed_files |= {(b, e) for b, (e, r) in a.items() if r is None}
        needed_vers |= set(stub._delta_vers(v))
    files = {f for f in files if f in needed_files or f[1] >= cutoff}
    log_dirs = log_dirs & needed_vers
    a_cut, _ = stub._resolve_epochs(cutoff)
    base = {"e": cutoff - 1, "op": "base",
            "base": {str(b): KeyedTable._ser_ref((e, r))
                     for b, (e, r) in a_cut.items()
                     if r is not None or e < cutoff},
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
        # values are (epoch, root) pairs since round 12 (shallow
        # clone); a single-table manifest resolves every ref LOCAL
        assert all(r is None for _, r in a.values()), v
        assert {b: e for b, (e, _) in a.items()} == assign[v], v
        assert {(b, e) for b, (e, _) in a.items()} <= files


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
            assert {b: e for b, (e, _) in a.items()} == assign[v], v
            assert {(b, e) for b, (e, _) in a.items()} <= files, v
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


# -- shallow clone (round 12): root-tagged refs in a fresh manifest ----

SRC = "/src/table"   # model source root


def _clone_build(src_ops, post_ops):
    """A source manifest from ``src_ops``, cloned at its LATEST version
    into a fresh manifest whose clone entry is base-SHAPED at e =
    V_src (the restore replacement-walk, so clone-local versions
    continue above every copied log version — no _delta_ver dir
    collision), with the base map's refs tagged [epoch, SRC]; then
    ``post_ops`` continue CLONE-LOCAL.  Returns the clone manifest +
    the model (assignment with roots, window, schema) per clone-side
    version."""
    entries, lo, win, assign, files, log_dirs, sch = _build(src_ops)
    V = len(src_ops)
    clone_e = {"e": V, "op": "clone", "cloned_from": V,
               "base": {str(b): [e, SRC] for b, e in assign[V].items()},
               "num_buckets": NB, "buckets": [], "emptied": [],
               "delta_boundary": lo[V], "delta_vers": list(win[V]),
               "schema": sch[V]}
    c_entries = [clone_e]
    c_assign = {V: {b: (e, SRC) for b, e in assign[V].items()}}
    c_lo, c_win, c_sch = {V: lo[V]}, {V: tuple(win[V])}, {V: sch[V]}
    c_files = set()                     # clone-LOCAL (bucket, epoch) dirs
    next_sch = 1000                     # clone-side evolutions, distinct
    for j, op in enumerate(post_ops, start=V + 1):
        if isinstance(op, tuple):         # clone-local restore
            t = V + op[1] % (j - V)       # any clone-side version
            flip = op[2]
            c_sch[j] = c_sch[t] if flip else c_sch[j - 1]
            e = {"e": j, "op": "restore", "restored_from": t,
                 "base": {str(b): (er[0] if er[1] is None
                                   else [er[0], er[1]])
                          for b, er in c_assign[t].items()},
                 "num_buckets": NB, "buckets": [], "emptied": [],
                 "delta_boundary": c_lo[t],
                 "delta_vers": sorted(c_win[t]), "schema": c_sch[j]}
            c_lo[j], c_win[j] = c_lo[t], tuple(c_win[t])
            c_assign[j] = dict(c_assign[t])
        elif op in ("rewrite", "evolve"):
            c_sch[j] = next_sch if op == "evolve" else c_sch[j - 1]
            next_sch += op == "evolve"
            e = {"e": j, "op": "rewrite", "full": True,
                 "buckets": list(range(NB)), "emptied": [],
                 "num_buckets": NB, "schema": c_sch[j]}
            c_lo[j], c_win[j] = j, ()
            c_assign[j] = {b: (j, None) for b in range(NB)}
            c_files |= {(b, j) for b in range(NB)}
        elif op in ("merge0", "merge1"):
            c_sch[j] = c_sch[j - 1]
            b = int(op[-1])
            e = {"e": j, "op": "merge", "buckets": [b], "emptied": [],
                 "num_buckets": NB}
            c_lo[j], c_win[j] = c_lo[j - 1], c_win[j - 1]
            c_assign[j] = dict(c_assign[j - 1])
            c_assign[j][b] = (j, None)
            c_files.add((b, j))
        elif op == "fold":
            c_sch[j] = c_sch[j - 1]
            e = {"e": j, "op": "fold", "buckets": list(range(NB)),
                 "emptied": [], "num_buckets": NB}
            c_lo[j], c_win[j] = j, ()
            c_assign[j] = {b: (j, None) for b in range(NB)}
            c_files |= {(b, j) for b in range(NB)}
        else:                           # delta append, clone-local
            c_sch[j] = c_sch[j - 1]
            e = {"e": j, "op": "delta", "buckets": [], "emptied": [],
                 "num_buckets": NB, "delta_buckets": [0]}
            c_lo[j] = c_lo[j - 1]
            c_win[j] = tuple(c_win[j - 1]) + (j,)
            c_assign[j] = dict(c_assign[j - 1])
        c_entries.append(e)
    return c_entries, c_lo, c_win, c_assign, c_files, c_sch, V


_POST = st.lists(st.one_of(
    st.sampled_from(["delta", "fold", "rewrite", "evolve",
                     "merge0", "merge1"]),
    st.tuples(st.just("restore"),
              st.integers(min_value=0, max_value=10_000),
              st.booleans())),
    min_size=0, max_size=12)


@settings(max_examples=200, deadline=None)
@given(_OPS, _POST)
def test_clone_manifest_resolution(src_ops, post_ops):
    """The clone entry resolves to the SOURCE assignment verbatim with
    every ref root-tagged; clone-local writes shadow foreign refs
    bucket by bucket (a merge makes ONE bucket local, the rest stay
    foreign); a full clone-local entry extinguishes every foreign ref;
    the window re-opens the source's (copied log dirs keep their
    numbers BELOW every clone-local version — the no-collision
    invariant); schema records carry across and evolve locally."""
    c_entries, c_lo, c_win, c_assign, _, c_sch, V = _clone_build(
        src_ops, post_ops)
    stub = _Stub(c_entries)
    for v in range(V, V + len(post_ops) + 1):
        a, nb = stub._resolve_epochs(v)
        assert nb == NB
        assert a == c_assign[v], v
        assert stub._delta_boundary(v) == c_lo[v], v
        assert stub._delta_vers(v) == sorted(c_win[v]), v
        assert stub._schema_text_as_of(v) == c_sch[v], v
        # no-collision invariant: every copied (source) window version
        # sits at or below the clone entry; every local one above
        assert all(w <= V for w in c_win[V])
        assert all(w > V for w in c_win[v] if w not in c_win[V]), v


@settings(max_examples=150, deadline=None)
@given(_OPS, _POST, st.integers(min_value=1, max_value=6))
def test_clone_collapse_never_deletes_foreign(src_ops, post_ops, keep):
    """purge_versions on a CLONE: foreign refs are never deletion
    candidates, survive into the collapsed base unconditionally (their
    epochs live in another table's numbering — the local cutoff
    comparison is meaningless), and every retained version's resolution
    and window are preserved across the collapse."""
    c_entries, c_lo, c_win, c_assign, c_files, c_sch, V = _clone_build(
        src_ops, post_ops)
    log_dirs = {int(e["e"]) for e in c_entries if e.get("op") == "delta"}
    log_dirs |= set(c_win[V])           # copied window dirs
    entries2, files2, log2 = _collapse(c_entries, keep, set(c_files),
                                       log_dirs)
    stub = _Stub(entries2)
    retained = [int(e["e"]) for e in
                sorted(entries2, key=lambda e: int(e["e"]))
                if e.get("op") != "base"]
    for v in retained:
        a, _ = stub._resolve_epochs(v)
        assert a == c_assign[v], v
        # local refs must survive the prune; foreign refs are not
        # local files at all (never deleted by construction)
        assert {(b, e) for b, (e, r) in a.items()
                if r is None} <= files2, v
        assert stub._delta_boundary(v) == c_lo[v], v
        assert stub._delta_vers(v) == sorted(c_win[v]), v
        assert stub._schema_text_as_of(v) == c_sch[v], v
