"""The sf1 sweep's shared-subplan oracle rewrite
(scripts/sf1_gates.py::build_shared_oracles) must be value-equivalent
to the canonical oracle text for EVERY gate it touches — the sweep's
"precompute the shared pair-CTE once" optimization may never change a
verdict. Pinned here at sf0.01 so the full sweep doesn't have to prove
its own rewrite."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_harness import canon, oracle_connection  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_rewritten_oracles_value_equal_canonical():
    from sf1_gates import build_shared_oracles

    from parsedmarc_go_spark.plans import ORACLES

    con = oracle_connection(SF)
    rewritten = build_shared_oracles(con, dict(ORACLES), verbose=False)
    touched = {n for n in ORACLES if rewritten[n] != ORACLES[n]}
    # the two families the sweep factors: jaccard (4 gates) +
    # containment (3 gates) — a template drift that silently stops the
    # rewrite would show up here as a shrunken set
    assert len(touched) >= 7, touched
    fresh = oracle_connection(SF)  # canonical runs see no temp tables
    for name in sorted(touched):
        a = canon(con.execute(rewritten[name]).fetchdf())
        b = canon(fresh.execute(ORACLES[name]).fetchdf())
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=True)
        except AssertionError as exc:  # attach WHICH gate diverged
            raise AssertionError(f"rewritten oracle {name} diverged: {exc}")


def test_rows_only_verdict_never_overwrites_reference_on_mismatch():
    """Round-14 review: a hash mismatch must keep the PREVIOUS hash as
    the recorded reference — if the new hash were written, the very
    next sweep would compare against it and silently self-accept the
    regression (and a flapping gate would alternate PASS/FAIL instead
    of failing consistently until deliberately cleared)."""
    from sf1_gates import rows_only_verdict

    first = rows_only_verdict("h1", None)
    assert first == {"value_hash": "h1", "first_recording": True, "pass": True}

    same = rows_only_verdict("h1", "h1")
    assert same["pass"] and not same["hash_changed"]
    assert same["value_hash"] == "h1"

    changed = rows_only_verdict("h2", "h1")
    assert not changed["pass"] and changed["hash_changed"]
    assert changed["value_hash"] == "h1"  # the reference stands
    assert changed["new_value_hash"] == "h2"
    # the next sweep (same regressed output) must STILL fail
    again = rows_only_verdict("h2", changed["value_hash"])
    assert not again["pass"] and again["value_hash"] == "h1"
    # deliberate acceptance: the entry is cleared -> first_recording
    accepted = rows_only_verdict("h2", None)
    assert accepted["pass"] and accepted["value_hash"] == "h2"
