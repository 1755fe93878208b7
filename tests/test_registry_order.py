"""Driver-gate window allocation: the registry must order least-verified
queries first so the driver's 50-query correctness window always covers
them (no Spark needed — pure ordering logic)."""

from poc_juma_etl_spark import DRIVER_WINDOW_PRIORITY, _verified_counts, all_queries

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
    counts = _verified_counts()
    names = list(all_queries())
    min_count = min(counts.get(n, 0) for n in names)
    window, rest = names[:WINDOW], names[WINDOW:]
    # no query outside the window may be less-verified than one inside it
    max_in_window = max(counts.get(n, 0) for n in window)
    min_outside = min((counts.get(n, 0) for n in rest), default=max_in_window)
    assert min_outside >= max_in_window or all(
        counts.get(n, 0) > min_count for n in rest
    )
    # every never-verified query sits inside the window (as long as they fit)
    never = [n for n in names if counts.get(n, 0) == 0]
    if len(never) <= WINDOW:
        assert set(never) <= set(window)


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
