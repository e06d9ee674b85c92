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


def test_rows_only_verdict_accum_order_exemption():
    """ADVICE r14: gates whose outputs are declared accumulation-order
    sensitive (IVF/k-means index builds) pass on a hash flip with BOTH
    hashes stamped and the reference UPDATED — a flip there can be a
    legitimate re-build, and without the exemption each flap fails the
    sweep until someone hand-deletes the reference. Non-exempt gates
    keep the strict fail-and-hold-reference behavior (test above)."""
    from sf1_gates import ACCUM_ORDER_SENSITIVE, rows_only_verdict

    flip = rows_only_verdict("h2", "h1", exempt_reason="float accumulation")
    assert flip["pass"] and flip["hash_changed"]
    assert flip["value_hash"] == "h2"  # reference moves with the re-build
    assert flip["prev_value_hash"] == "h1"  # ...but the flip is auditable
    assert flip["accum_order_exempt"] == "float accumulation"
    # agreement and first-recording are unaffected by the exemption
    assert rows_only_verdict("h1", "h1", exempt_reason="x")["pass"]
    assert rows_only_verdict("h1", None, exempt_reason="x")["first_recording"]
    # the exemption list covers only gates with a declared float-
    # accumulation dependence, all rows-only, each with a reason
    from parsedmarc_go_spark.plans import ORACLES, QUERIES

    for name, reason in ACCUM_ORDER_SENSITIVE.items():
        assert name in QUERIES and name not in ORACLES
        assert reason


def test_rows_only_hash_canonicalizes_nested_floats(spark):
    """ADVICE r14: doubles nested in arrays/structs were serialized by
    to_json at full precision, so a last-bit drift in a nested value
    flipped the hash even though top-level doubles were canonicalized.
    Two frames differing only in the 16th significant digit — at any
    nesting depth — must hash identically; a real value change must
    not."""
    from sf1_gates import rows_only_hash

    schema = (
        "id bigint, score double, vec array<double>, "
        "st struct<d: double, s: string>, m map<string, double>"
    )
    base = [(1, 0.1 + 0.2, [1.0 / 3.0, 2.0], (9.99 / 3.0, "x"), {"k": 0.7 / 9.0})]
    drift = [
        (
            1,
            0.1 + 0.2 + 5e-17,
            [1.0 / 3.0 + 1e-17, 2.0],
            (9.99 / 3.0 + 1e-16, "x"),
            {"k": 0.7 / 9.0 + 1e-18},
        )
    ]
    real = [(1, 0.1 + 0.2, [1.0 / 3.0, 2.5], (9.99 / 3.0, "x"), {"k": 0.7 / 9.0})]
    null_nested = [(1, None, None, None, None)]

    h_base = rows_only_hash(spark.createDataFrame(base, schema))
    h_drift = rows_only_hash(spark.createDataFrame(drift, schema))
    h_real = rows_only_hash(spark.createDataFrame(real, schema))
    assert h_base == h_drift  # sub-7-sig-digit drift is invisible
    assert h_base != h_real  # value changes are not
    # null structs/arrays/maps survive canonicalization (a struct-of-
    # nulls rendering would differ from null in JSON)
    n1 = rows_only_hash(spark.createDataFrame(null_nested, schema))
    n2 = rows_only_hash(spark.createDataFrame(null_nested, schema))
    assert n1 == n2 and n1[0] == 1
