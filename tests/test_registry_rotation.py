"""Self-rotating registry order (suite.py _latest_green_round /
_reorder_registry): the driver's correctness run caps at ~50 registry
entries per round, so the suite fronts the queries most in need of a
fresh row — derived from the committed CORRECTNESS_r*.json artifacts,
never from a hand-maintained list (the round-3/4/5 verdicts each had
to ask for a manual re-rotation; this retires that failure mode)."""

import json
import os

from postgresql_topn_spark.suite import (
    QUERIES,
    _effective_round,
    _latest_green_round,
)

GREEN = {
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "err": None,
}


def _write(tmp, rnd, rows):
    with open(os.path.join(tmp, f"CORRECTNESS_r{rnd:02d}.json"), "w") as fh:
        json.dump(rows, fh)


def test_green_rows_ranked_by_recency(tmp_path):
    tmp = str(tmp_path)
    _write(tmp, 3, {"a": GREEN, "b": GREEN})
    _write(tmp, 4, {"b": GREEN, "c": GREEN})
    latest = _latest_green_round(tmp)
    assert latest == {"a": 3, "b": 4, "c": 4}


def test_failed_rows_do_not_count_as_seen(tmp_path):
    tmp = str(tmp_path)
    bad_hash = dict(GREEN, hash_match=False)
    errored = dict(GREEN, err="boom")
    _write(tmp, 4, {"ok": GREEN, "bad": bad_hash, "err": errored})
    latest = _latest_green_round(tmp)
    # a failed run must NOT push the query to the back of the rotation:
    # the fix needs a fresh driver row next round
    assert latest == {"ok": 4}


def test_malformed_artifacts_ignored(tmp_path):
    tmp = str(tmp_path)
    with open(os.path.join(tmp, "CORRECTNESS_r09.json"), "w") as fh:
        fh.write("not json {")
    with open(os.path.join(tmp, "CORRECTNESS_r10.json"), "w") as fh:
        json.dump(["a", "list"], fh)
    assert _latest_green_round(tmp) == {}
    assert _latest_green_round(str(tmp_path / "missing_dir")) == {}


def test_semantics_changed_gates_front_like_never_green():
    """A gate whose semantics changed since its last green row proves
    only the OLD behavior with that row — _effective_round resets it
    to -1 until a green row from the change round (or later) lands,
    after which the entry self-expires."""
    from postgresql_topn_spark.suite import _SEMANTICS_CHANGED

    try:
        _SEMANTICS_CHANGED["__x"] = 7
        assert _effective_round("__x", {"__x": 6}) == -1  # stale row
        assert _effective_round("__x", {}) == -1  # never green
        assert _effective_round("__x", {"__x": 7}) == 7  # expired
        assert _effective_round("__x", {"__x": 9}) == 9
        assert _effective_round("__y", {"__y": 5}) == 5  # unlisted
    finally:
        _SEMANTICS_CHANGED.pop("__x", None)


def test_live_registry_fronts_stale_queries():
    """On the real repo artifacts: every query whose latest green row is
    older (semantics-changed gates count as never-green until re-rowed)
    sorts before every query with a newer one, and never-green queries
    come first of all — so the driver's 50-row window always covers the
    most-owed rows."""
    latest = _latest_green_round()
    names = list(QUERIES)
    ranks = [_effective_round(n, latest) for n in names]
    assert ranks == sorted(ranks)
    # the driver cap is ~50: with the 100-query registry nothing in the
    # front window may be fresher than anything behind it (guaranteed
    # by the global sort above) and the front 50 must contain every
    # query lacking a row from the newest round
    if latest:
        newest = max(latest.values())
        owed = [n for n in names if _effective_round(n, latest) < newest]
        front = set(names[: max(50, len(owed))])
        assert all(n in front for n in owed[:50])


def test_registry_stays_under_the_2round_saturation_cap():
    """The driver verifies ~50 entries per round, so a registry of
    more than 98 means some entry must go >2 rounds without a fresh
    row (exactly-100 broke the freshness bar in r6). Registering a new
    gate requires retiring or merging one first — see the round-7
    lane-preserving merges for the pattern."""
    assert len(QUERIES) <= 98, (
        f"registry has {len(QUERIES)} entries; retire/merge before "
        "registering (2-round freshness needs <= 2x the driver's "
        "50-row cap, with slack)"
    )


def test_additions_never_push_a_gate_two_rounds_stale():
    """VERDICT r7 item 1: the per-round new-gate budget, enforced.

    Every gate whose latest green row is older than the newest round
    — including never-rowed NEW gates, which front the rotation — is
    OWED a row in the next driver window. If the owed set exceeds the
    driver's 50-row cap, some gate is guaranteed to go two rounds
    without a fresh row (that is exactly how r5's three gates went
    stale through r6+r7: 13 net-new gates fronted the window).
    Registering a gate is only legal while the owed set still fits —
    fund additions with lane-preserving merges (see the round-8
    topn_composite_key / pipeline_pack_contexts merges)."""
    latest = _latest_green_round()
    if not latest:
        return
    newest = max(latest.values())
    names = list(QUERIES)
    owed = [n for n in names if _effective_round(n, latest) < newest]
    assert len(owed) <= 50, (
        f"{len(owed)} gates owe a fresh driver row but the window is "
        "50 — this round's additions exceeded the freshness budget; "
        "merge or retire gates until the owed set fits"
    )
    # and the self-rotation actually fronts all of them
    assert set(owed) <= set(names[:50])
