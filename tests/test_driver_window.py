"""Guard the driver-window contract (VERDICT r03 ask #6; auto-rotation
round 11, VERDICT r10 ask #3).

The driver's correctness gate records verdicts for the FIRST 50 entries
of ``queries()`` in iteration order (r01-r10 evidence: each CORRECTNESS
artifact is exactly the first 50 names in registration order). Since
round 11 the window is COMPUTED — ``CHANGED_COMPONENTS`` first, then an
oldest-first fill by each name's last green driver verdict
(``window_history.LAST_GREEN``, regenerated each round start from the
CORRECTNESS artifacts). These tests pin the invariants of that rule so
the freshness policy cannot be violated by hand again:

- the window is exactly the first 50 registry entries, 50 unique names;
- every changed component is in the window;
- NO registered name's staleness exceeds 3 rounds once this window goes
  green (names in the window count as green this round);
- every window entry takes the STRONG hash verdict (has a value oracle);
- rotated-out names stay registered (locally oracle-checked).
"""

from __future__ import annotations

from clinical_trials_data_pipeline_analyis_spark.suite import (
    CHANGED_COMPONENTS,
    DRIVER_WINDOW,
    WINDOW_SIZE,
    registry,
)
from clinical_trials_data_pipeline_analyis_spark.suite.window_history import (
    CURRENT_ROUND,
    LAST_GREEN,
)

#: The repo's freshness policy: no registered query's last driver
#: verdict may be more than this many rounds old.
MAX_STALENESS = 3


def test_window_is_exactly_the_first_50_registered():
    names = list(registry())
    assert tuple(names[:WINDOW_SIZE]) == DRIVER_WINDOW


def test_window_has_no_duplicates_and_size_50():
    assert len(DRIVER_WINDOW) == WINDOW_SIZE == 50
    assert len(set(DRIVER_WINDOW)) == WINDOW_SIZE


def test_changed_components_inside_window():
    missing = set(CHANGED_COMPONENTS) - set(DRIVER_WINDOW)
    assert not missing, f"changed components lost from window: {missing}"


def test_no_staleness_beyond_policy():
    """Assuming the current window goes green this round, every
    registered name's last verdict is at most MAX_STALENESS rounds old.
    This is the invariant the hand-picked rotations kept violating
    (r10 judged a 16-name cohort at 6-7 rounds stale); with the
    oldest-first build rule it holds by construction unless
    CHANGED_COMPONENTS crowds out more than (120 - 50*MAX_STALENESS)
    stale names — in which case this test fails loudly and the round
    must widen the window or split the changes."""
    window = set(DRIVER_WINDOW)
    violations = {
        n: CURRENT_ROUND - LAST_GREEN.get(n, 0)
        for n in registry()
        if n not in window
        and CURRENT_ROUND - LAST_GREEN.get(n, 0) > MAX_STALENESS
    }
    assert not violations, (
        f"names outside the driver window staler than {MAX_STALENESS} "
        f"rounds: {violations}"
    )


def test_never_checked_names_sort_first():
    """A registered name with NO driver-green history (a new component)
    must be in the window — the 'every new component takes a verdict
    the round it lands' rule, now enforced by the round-0 sort key."""
    never = [n for n in registry() if n not in LAST_GREEN]
    outside = [n for n in never if n not in set(DRIVER_WINDOW)]
    assert not outside, f"never-driver-checked names outside window: {outside}"


def test_history_covers_registry():
    """Every registered name has a last-green entry (or is new —
    allowed), and relic names in LAST_GREEN (renames, e.g. x21->a21)
    never appear in the window."""
    reg = set(registry())
    relics = set(LAST_GREEN) - reg
    assert not (relics & set(DRIVER_WINDOW))


def test_every_window_query_has_value_oracle():
    """Window entries must get the STRONG (hash) verdict, not rows-only."""
    reg = registry()
    weak = [n for n in DRIVER_WINDOW if reg[n].oracle is None]
    assert not weak, f"window queries without a value oracle: {weak}"


def test_rotated_out_queries_remain_registered():
    """Rotated-out queries must stay registered (locally oracle-checked
    by test_oracle_parity)."""
    names = set(registry())
    expected = (
        {f"q{i:02d}" for i in range(1, 31)}
        | {f"x{i:02d}" for i in range(1, 21)}
        | {f"a{i}" for i in range(21, 91)}
    )
    got_prefixes = {n.split("_", 1)[0] for n in names}
    assert expected <= got_prefixes
