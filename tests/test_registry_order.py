"""Driver-gate window allocation: the registry must order least-verified
queries first so the driver's 50-query correctness window always covers
them (no Spark needed — pure ordering logic)."""

from poc_juma_etl_spark import (
    DRIVER_WINDOW_PRIORITY,
    _latest_green_rounds,
    _latest_sample_rounds,
    _verified_counts,
    all_queries,
    effective_evidence,
    rotation_key,
)

WINDOW = 50


def test_verified_counts_read_driver_files():
    counts = _verified_counts()
    # round 1 verified q1 fully; the scalar suite failed its hash (not green);
    # the sketches query passed its rows-only check
    assert counts.get("q1_pricing_summary", 0) >= 1
    assert counts.get("q_scalar_function_suite", 0) == 0 or counts.get(
        "q_scalar_function_suite"
    ) >= 1  # becomes green once a later round passes it
    # rows-only (no_oracle) samples count as weak evidence: strictly
    # positive but below one full hash-green pass, so a query that gained
    # an oracle after a rows-only sample re-enters the window
    assert 0 < counts.get("q_approx_sketches", 0)
    sketches = counts["q_approx_sketches"]
    assert sketches < counts.get("q1_pricing_summary", 0) or sketches >= 1


def test_least_verified_lead_the_window():
    # Asserts on the EFFECTIVE sort key (rotation_key), so the test is
    # invariant to whatever evidence distribution the driver drops next —
    # the r06 and r08 failures were both stale-window assertions that baked
    # in one round's raw-evidence histogram. Invariant: no name outside the
    # 50-slot window may have a strictly smaller rotation key than any name
    # inside it (the window must be exactly the 50 smallest-key names,
    # modulo tiebreaks among equal keys).
    counts = _verified_counts()
    latest = _latest_sample_rounds()
    green = _latest_green_rounds()
    names = list(all_queries())
    window, rest = names[:WINDOW], names[WINDOW:]
    max_in_window = max(rotation_key(n, counts, latest, green) for n in window)
    min_outside = min(
        (rotation_key(n, counts, latest, green) for n in rest),
        default=max_in_window,
    )
    assert min_outside >= max_in_window, (
        f"window mis-allocated: a name outside the window has rotation key "
        f"{min_outside} < max-in-window {max_in_window}"
    )
    # every never-verified query sits inside the window (as long as they fit)
    never = [n for n in names if counts.get(n, 0) == 0]
    if len(never) <= WINDOW:
        assert set(never) <= set(window)


def test_rotation_key_regimes():
    # Never-hash-green names lead unconditionally, however recent their
    # sample (a red row must re-enter the window immediately); among
    # hash-green names the primary saturates at 1.0 so staleness rotates
    # oldest-sample-first, evidence count only a within-round tiebreak.
    v = {"red": 0.0, "rowsonly": 0.25, "once": 1.0, "twice": 2.0}
    latest = {"red": 8, "rowsonly": 3, "once": 5, "twice": 4}
    assert rotation_key("red", v, latest) < rotation_key("rowsonly", v, latest)
    assert rotation_key("rowsonly", v, latest) < rotation_key("once", v, latest)
    assert rotation_key("rowsonly", v, latest) < rotation_key("twice", v, latest)
    # staleness beats evidence among hash-green: twice@r4 before once@r5
    assert rotation_key("twice", v, latest) < rotation_key("once", v, latest)
    # within the same round, lower evidence first
    v2 = {"a": 1.0, "b": 2.0}
    same = {"a": 4, "b": 4}
    assert rotation_key("a", v2, same) < rotation_key("b", v2, same)


def test_effective_evidence_boost_only_while_unverified():
    # The LATE_ADDITIONS half-step queues a newcomer behind the
    # never-verified backlog (0 < 0.5) but must vanish the moment real
    # driver evidence exists — raw evidence alone orders verified queries.
    from poc_juma_etl_spark import LATE_ADDITIONS

    la = LATE_ADDITIONS[0]
    assert effective_evidence(la, {}) == 0.5
    assert effective_evidence(la, {la: 1.0}) == 1.0
    assert effective_evidence(la, {la: 0.25}) == 0.25
    assert effective_evidence("not_a_late_addition", {}) == 0


def test_priority_list_names_are_registered():
    names = set(all_queries())
    missing = [n for n in DRIVER_WINDOW_PRIORITY if n not in names]
    assert not missing, f"priority list references unknown queries: {missing}"


def test_late_additions_queue_behind_backlog():
    # new queries must never displace the never-driver-verified backlog from
    # the window, but must still outrank every already-verified query
    from poc_juma_etl_spark import LATE_ADDITIONS

    counts = _verified_counts()
    names = list(all_queries())
    pos = {n: i for i, n in enumerate(names)}
    backlog = [
        n for n in names if counts.get(n, 0) == 0 and n not in LATE_ADDITIONS
    ]
    verified = [n for n in names if counts.get(n, 0) >= 1]
    for la in LATE_ADDITIONS:
        if la not in pos or counts.get(la, 0) > 0:
            continue  # verified in a later round — rotates normally
        assert all(pos[la] > pos[b] for b in backlog), la
        assert all(pos[la] < pos[v] for v in verified), la


def test_rotation_key_regressed_regime():
    # A historically-green query whose LATEST driver sample was red is a
    # live regression: it must seat after the never-verified backlog but
    # before every healthy hash-green query — not rotate to the back on
    # its stale accumulated evidence.
    v = {"regressed": 2.0, "healthy": 1.0, "fresh": 0.0}
    latest = {"regressed": 9, "healthy": 4, "fresh": 0}
    green = {"regressed": 4, "healthy": 4}
    k_reg = rotation_key("regressed", v, latest, green)
    k_healthy = rotation_key("healthy", v, latest, green)
    k_fresh = rotation_key("fresh", v, latest, green)
    assert k_fresh < k_reg < k_healthy
    # once re-verified green, it rejoins the staleness rotation normally
    green2 = {"regressed": 9, "healthy": 4}
    assert rotation_key("regressed", v, latest, green2) > k_healthy


def test_rotation_key_rows_only_saturation_regime():
    # four rows-only (0.25) samples sum to eff = 1.0 with NO green round:
    # the name must stay in the leading bucket (after live regressions,
    # before every healthy hash-green query) — not read as "regressed" and
    # not rotate like a green one (round-9 review finding)
    v = {"rowsonly4": 1.0, "healthy": 1.0, "regressed": 2.0}
    latest = {"rowsonly4": 8, "healthy": 8, "regressed": 8}
    green = {"healthy": 8, "regressed": 6}  # rowsonly4 never green
    k_rows = rotation_key("rowsonly4", v, latest, green)
    k_heal = rotation_key("healthy", v, latest, green)
    k_regr = rotation_key("regressed", v, latest, green)
    assert k_regr < k_rows < k_heal
