"""Self-check harness mirroring the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and order-insensitive
values (exact equality, floats included — the engine's determinism contract
is bit-identical arithmetic, so no tolerance is needed or used).

Usage:
    python tools/selfcheck.py [--sf-dir /root/testdata/sf0.01] [--only q01,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Queries eligible for --oracle-sample, with (source table, key column).
#: Eligibility contract: the query is PER-ROW over that table — output row
#: for key k is a function of input row k alone — so running both engines
#: on the same deterministic keyed subset of the table verifies exactly the
#: rows sampled, bit-for-bit (no aggregate crosses sampled/unsampled rows).
#: This is what readmits oracle-cost exclusions at sf10: the Spark side is
#: cheap at 100x, the DuckDB side (e.g. 275M md5 list-lambda calls for
#: q_minhash_signatures) is not, and a 1% keyed slice keeps the check exact
#: where a tolerance-based or count-only check would not.
SAMPLE_ELIGIBLE = {
    "q_minhash_signatures": ("documents", "doc_id"),
    "q_simhash": ("documents", "doc_id"),
    "q_fingerprint": ("documents", "doc_id"),
    "q_embedding_norms": ("embeddings", "vec_id"),
}

#: deterministic keyed sample predicates — the SAME 60-bit md5-of-decimal-
#: string hash both engines already use elsewhere, reduced mod 1000
_SAMPLE_MOD = 1000


def _duck_sample_pred(key: str, frac: float) -> str:
    thresh = int(round(frac * _SAMPLE_MOD))
    return (
        f"(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 15))::BIGINT)"
        f" % {_SAMPLE_MOD} < {thresh}"
    )


def _py_sampled(key_val, frac: float) -> bool:
    import hashlib

    h = int(hashlib.md5(str(key_val).encode()).hexdigest()[:15], 16)
    return h % _SAMPLE_MOD < int(round(frac * _SAMPLE_MOD))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns — the driver's
    order-insensitive compare."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, dict)) else v)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            af, bf = pd.api.types.is_float_dtype(av), pd.api.types.is_float_dtype(bv)
            if af != bf:
                # The external driver hashes raw values, so bigint 123 vs
                # float 123.0 is a hard mismatch there — mirror that here
                # instead of silently coercing (DuckDB SUM(BIGINT)→HUGEINT
                # lands as float64 in pandas; fix the oracle with a CAST).
                problems.append(
                    f"col {c}: dtype mismatch spark={av.dtype} duck={bv.dtype} "
                    "(int-vs-float breaks the driver hash; CAST the oracle)"
                )
                continue
            if af and bf:
                av = av.astype("float64")
                bv = bv.astype("float64")
                eq = (av == bv) | (av.isna() & bv.isna())
            else:
                eq = (av == bv) | (av.isna() & bv.isna())
        except Exception as e:  # noqa: BLE001
            problems.append(f"col {c}: compare error {e}")
            continue
        n_bad = int((~eq).sum())
        if n_bad:
            i = (~eq).idxmax()
            problems.append(
                f"col {c}: {n_bad} mismatches; first at row {i}: "
                f"spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--exclude", default=None, help="comma-separated query names to skip"
    )
    ap.add_argument(
        "--exclude-tags",
        default=None,
        help="comma-separated registry tags to skip (e.g. demo_quadratic "
        "for math-oracle queries that are intentionally quadratic); the "
        "resolved query names are recorded in the artifact's excluded list",
    )
    ap.add_argument(
        "--json",
        default=None,
        help="also write per-query results to this JSON file "
        "(committed as CORRECTNESS_full_r{N}.json)",
    )
    ap.add_argument(
        "--note",
        default=None,
        help="free-text note recorded in the JSON (use it to say WHY "
        "queries were excluded — a partial sweep must never read as full)",
    )
    ap.add_argument(
        "--oracle-sample",
        type=float,
        default=None,
        metavar="FRAC",
        help="for SAMPLE_ELIGIBLE queries, verify a deterministic keyed "
        "subset (md5(key) mod 1000 < FRAC*1000) bit-exactly instead of the "
        "full output: the DuckDB oracle runs on a sampled view of the "
        "query's source table, the Spark result is filtered to the same "
        "keys. Sound only for per-row queries (see SAMPLE_ELIGIBLE); "
        "ineligible queries are unaffected. Rows are recorded with "
        "'sampled': FRAC so the artifact can't read as a full check",
    )
    ap.add_argument(
        "--calibrate",
        action="store_true",
        help="pass calibrate=True to every query whose function accepts "
        "it (the cap pre-flight, r13): the query proceeds only on an "
        "EXACT plan — so the oracle compare stays meaningful on corpora "
        "where the default cap binds — or raises CapBoundError, which is "
        "recorded as status 'refused' with the named boundary (an "
        "explicit refusal record, not a fail and not a silent subset)",
    )
    ap.add_argument(
        "--resume",
        action="store_true",
        help="skip queries already recorded in --json (restartable sweeps: "
        "the JSON is flushed after every query, so a killed run loses at "
        "most the in-flight query)",
    )
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from video_data_pipeline_spark.queries.registry import load_all
    from video_data_pipeline_spark.session import get_spark

    registry = load_all()
    only = set(args.only.split(",")) if args.only else None
    exclude = set(args.exclude.split(",")) if args.exclude else set()
    if args.exclude_tags:
        tags = {t.strip() for t in args.exclude_tags.split(",") if t.strip()}
        exclude |= {n for n, q in registry.items() if tags & set(q.tags)}
    if only:
        unknown = only - set(registry)
        if unknown:
            print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
            print(f"registry has: {sorted(registry)[:10]} ...", file=sys.stderr)
            return 2

    # result-heavy queries (fact-table-sized outputs) exceed the default
    # 1g driver.maxResultSize when collected for comparison at sf10 —
    # a harness collect() limit, not a plan property; give it headroom
    spark = get_spark(
        "selfcheck", extra_conf={"spark.driver.maxResultSize": "8g"}
    )
    con = duckdb.connect()
    view_paths: dict[str, str] = {}
    for t in TABLES:
        path = f"{args.sf_dir}/{t}.parquet"
        # Spark-written datasets are DIRECTORIES of part files (e.g. the
        # tools/scale_up.py output); the shipped testdata is single files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        view_paths[t] = path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    n_pass = n_fail = n_nooracle = 0
    results: dict[str, dict] = {}
    prior_note: str | None = None
    prior_excluded: list[str] = []
    if args.resume and args.json and os.path.exists(args.json):
        import json

        with open(args.json) as f:
            prior_payload = json.load(f)
        prior = prior_payload.get("queries", {})
        # provenance carries across resumes: a resumed invocation that
        # omits --note/--exclude must not silently strip the prior run's
        # record of WHY queries were excluded (a partial sweep must never
        # read as full)
        prior_note = prior_payload.get("note")
        prior_excluded = prior_payload.get("excluded", [])
        for name, rec in prior.items():
            results[name] = rec
            if rec.get("status") == "pass":
                n_pass += 1
            elif rec.get("status") == "fail":
                n_fail += 1
            else:
                n_nooracle += 1
        print(f"resuming: {len(prior)} queries already recorded")

    def flush_json() -> None:
        if not args.json:
            return
        import json

        summary = {"pass": n_pass, "fail": n_fail, "rows_only": n_nooracle}
        n_refused = sum(
            1 for r in results.values() if r.get("status") == "refused"
        )
        if n_refused:
            summary["refused"] = n_refused
        payload = {
            "sf_dir": args.sf_dir,
            "summary": summary,
            "queries": results,
        }
        all_excluded = sorted(set(prior_excluded) | exclude)
        if all_excluded:
            payload["excluded"] = all_excluded
        note = args.note or prior_note
        if note:
            payload["note"] = note
        # an --only sweep is partial by construction: record both the
        # requested subset and everything it leaves unrun, so the artifact
        # can never be mistaken for a full-registry result. Exception: an
        # --only + --resume invocation that tops up a previously-full
        # artifact leaves nothing unrun — that IS a full-registry result,
        # so the partial-sweep markers would only mislead.
        if only:
            not_run = sorted(set(registry) - set(results) - exclude - only)
            if not_run or not args.resume:
                payload["only"] = sorted(only)
                payload["not_run"] = not_run
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
    for name, q in sorted(registry.items()):
        if (only and name not in only) or name in exclude:
            continue
        if args.resume and name in results:
            continue
        t0 = time.time()
        calibrated = False
        if args.calibrate:
            import inspect

            calibrated = "calibrate" in inspect.signature(q.spark_fn).parameters
        try:
            kw = {"calibrate": True} if calibrated else {}
            sdf = q.spark_fn(spark, args.sf_dir, **kw).toPandas()
            spark_secs = time.time() - t0
        except Exception as e:
            from video_data_pipeline_spark.calibrate import CapBoundError

            if isinstance(e, CapBoundError):
                # the engine REFUSED with the named boundary — the honest
                # outcome on a corpus where no exact plan fits the budget
                print(f"REFUSED {name}: {e}")
                results[name] = {
                    "status": "refused",
                    "calibrated": True,
                    "boundary": str(e)[:800],
                }
                flush_json()
                continue
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "err": traceback.format_exc()[-800:]}
            n_fail += 1
            flush_json()
            continue
        if q.oracle is None and q.semi_oracle is not None:
            # bound check (r16, VERDICT r15 #6): values are engine-specific
            # (sketch estimates) but still verifiable against the exact
            # answer — a pass/fail cell, not a rows-only shrug
            t_oracle = time.time()
            try:
                odf = con.execute(q.semi_oracle).fetchdf()
                problems = q.semi_check(sdf, odf)
            except Exception:
                print(f"FAIL {name}: semi-oracle raised\n{traceback.format_exc()}")
                results[name] = {
                    "status": "fail", "err": traceback.format_exc()[-800:]
                }
                n_fail += 1
                flush_json()
                continue
            if problems:
                print(f"FAIL {name} (semi-oracle) [{time.time()-t0:.1f}s]")
                for p in problems:
                    print(f"     {p}")
                results[name] = {
                    "status": "fail", "semi_oracle": True, "problems": problems
                }
                n_fail += 1
            else:
                print(
                    f"PASS {name}: {len(sdf)} rows (semi-oracle bound check) "
                    f"[{time.time()-t0:.1f}s]"
                )
                results[name] = {
                    "status": "pass",
                    "semi_oracle": True,
                    "rows": len(sdf),
                    "secs": round(time.time() - t0, 2),
                    "spark_secs": round(spark_secs, 2),
                    "oracle_secs": round(time.time() - t_oracle, 2),
                }
                n_pass += 1
            flush_json()
            continue
        if q.oracle is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            results[name] = {"status": "rows_only", "rows": len(sdf)}
            n_nooracle += 1
            flush_json()
            continue
        sampled = (
            SAMPLE_ELIGIBLE.get(name) if args.oracle_sample is not None else None
        )
        rows_full = len(sdf)
        if sampled:
            s_table, s_key = sampled
            keep = sdf[s_key].map(lambda v: _py_sampled(v, args.oracle_sample))
            sdf = sdf[keep].reset_index(drop=True)
            if not len(sdf):
                print(f"FAIL {name}: --oracle-sample {args.oracle_sample} "
                      f"selected 0 of {rows_full} rows — raise the fraction")
                results[name] = {"status": "fail", "err": "empty sample"}
                n_fail += 1
                flush_json()
                continue
            con.execute(
                f"CREATE OR REPLACE VIEW {s_table} AS "
                f"SELECT * FROM read_parquet('{view_paths[s_table]}') "
                f"WHERE {_duck_sample_pred(s_key, args.oracle_sample)}"
            )
        t_oracle = time.time()
        try:
            ddf = con.execute(q.oracle).fetchdf()
            oracle_secs = time.time() - t_oracle
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "err": traceback.format_exc()[-800:]}
            n_fail += 1
            flush_json()
            continue
        finally:
            if sampled:
                con.execute(
                    f"CREATE OR REPLACE VIEW {s_table} AS "
                    f"SELECT * FROM read_parquet('{view_paths[s_table]}')"
                )
        problems = compare(sdf, ddf)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
            results[name] = {"status": "fail", "problems": problems}
            n_fail += 1
            flush_json()
        else:
            rec = {
                "status": "pass",
                "rows": len(sdf),
                "secs": round(time.time() - t0, 2),
                # split attribution (VERDICT r13 #4): the sfp1 iterative-
                # graph cells read 5-16 min with both engines lumped; a
                # real regression in the Spark checkpointed-loop cadence
                # is only visible with the DuckDB unrolled-CTE time
                # separated out
                "spark_secs": round(spark_secs, 2),
                "oracle_secs": round(oracle_secs, 2),
            }
            if calibrated:
                rec["calibrated"] = True
            if sampled:
                rec["sampled"] = args.oracle_sample
                rec["sample_key"] = sampled[1]
                rec["rows_full"] = rows_full
                print(
                    f"PASS {name}: {len(sdf)}/{rows_full} rows "
                    f"(sampled f={args.oracle_sample}) [{time.time()-t0:.1f}s]"
                )
            else:
                print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            results[name] = rec
            n_pass += 1
            flush_json()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nooracle} rows-only")
    if args.json:
        flush_json()
        print(f"wrote {args.json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
