"""Scale-up generator: replicate an sf directory K× with consistent key
offsets, for scale validation beyond the shipped testdata (ROADMAP #2).

Foreign keys stay valid because every copy applies the SAME offset to both
sides of each relationship (orderkey on orders AND lineitem, etc.).
Dimension tables (region, nation) are kept single-copy. By default
document text is left byte-identical across copies — exact duplicates at
scale are one realistic shape for the dedup family; ``--perturb`` below
is the other (near-dups without exact cliques).

Usage: python tools/scale_up.py --src /root/testdata/sf0.1 --dst /tmp/sf1 --factor 10

``--perturb`` makes replication produce realistic NEAR-dup structure
instead of byte-identical clones (r6 VERDICT #4), so the near-dup family
can run at scale with oracles and the rep-collapse banding is exercised
on a corpus where reps ≈ all docs:
- documents, copy c>0: if (doc_id + c) % 10 == 0 the copy appends one
  marker token (` v{c}`) — a true near-dup of the original and of the
  other marked copies (~factor/10 + 1 members per near-group, so the TRUE
  pair count stays LINEAR in factor, unlike clone cliques); if
  (doc_id + c) % 10 == 5 the copy is ``initcap(text)`` — a CASE-VARIANT
  exact dup by fingerprint (different bytes, same md5(lower(trim)));
  if (doc_id + c) % 10 == 3 the copy is ``initcap(text) || ' v{c}'`` — a
  near-dup whose casing differs from the original (the r8-VERDICT repro
  shape: rep-collapse must still find its edge); if (doc_id + c) % 10 == 7
  the copy is a SHORT QUOTE INCLUSION (r16, VERDICT r15 #2): the first
  20–40% of the original's words (fraction varies by copy so same-doc
  quotes nest instead of cloning) — its shingle set is a subset of the
  original's, so containment C(quote→original) = 1.0 ≥ 0.8 while Jaccard
  ≈ the fraction < 0.6. Before r16 every corpus class satisfied C ≥ 0.8
  ⟺ J ≥ 0.6, so q_containment_pairs and q_prefix_filter_join returned
  IDENTICAL pair sets at every gate scale and the containment family's
  asymmetric logic (min-denominator, smaller-side prefix bound) was
  pinned only by unit tests; the quote class makes the two pair sets
  provably differ. Every other copy interleaves a (doc,copy)-unique
  token after every 2nd word, which puts that token inside EVERY
  3-shingle — zero shingle overlap with anything else, i.e. unrelated
  text. n_chars is recomputed.
- embeddings, copy c>0: marked copies keep the vector (near-group around
  the original); others cyclically shift components by 1 + (c % 63) —
  near-zero cosine against every other shift of a random vector.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: per-table key columns that must be offset per copy (FK-consistent)
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: single-copy dimensions
PASSTHROUGH = ["region", "nation"]


def key_span(df, cols) -> int:
    """Offset stride: one power of 10 above the max key (keeps keys readable
    and guarantees disjoint ranges)."""
    maxes = [F.max(c) for c in cols]
    expr = maxes[0] if len(maxes) == 1 else F.greatest(*maxes)
    mx = df.select(expr.alias("m")).first()["m"] or 0
    span = 1
    while span <= mx:
        span *= 10
    return span


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--perturb",
        action="store_true",
        help="near-dup (non-clique) replication for documents/embeddings "
        "instead of byte-identical copies; see module docstring",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 32 concurrent parquet writer tasks buffer row groups in the one
        # local-mode JVM; the 1g default heap OOMs at --factor 100
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .appName("scale_up")
        .getOrCreate()
    )
    os.makedirs(args.dst, exist_ok=True)
    for name in PASSTHROUGH:
        df = spark.read.parquet(f"{args.src}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{args.dst}/{name}.parquet")
        print(f"{name}: {df.count()} rows (single copy)")
    for name, cols in KEY_COLS.items():
        src = f"{args.src}/{name}.parquet"
        if not os.path.exists(src):
            print(f"{name}: missing, skipped")
            continue
        df = spark.read.parquet(src)
        missing = [c for c in cols if c not in df.columns]
        if missing:
            # testdata schemas have drifted across driver regenerations
            # (e.g. embeddings doc_id -> vec_id); fail per-table, loudly,
            # instead of crashing the whole run
            print(f"{name}: KEY_COLS {missing} not in {df.columns} — SKIPPED; "
                  "update KEY_COLS for the regenerated schema")
            continue
        span = key_span(df, cols)
        copies = []
        for c in range(args.factor):
            cp = df
            if args.perturb and c > 0 and name == "documents":
                near = (F.col("doc_id") + c) % 10 == 0
                casevar = (F.col("doc_id") + c) % 10 == 5
                casenear = (F.col("doc_id") + c) % 10 == 3
                subset = (F.col("doc_id") + c) % 10 == 7
                marked = F.concat(F.col("text"), F.lit(f" v{c}"))
                salt = F.concat(
                    F.lit("$1 p"), F.col("doc_id").cast("string"), F.lit(f"c{c} ")
                )
                scrambled = F.regexp_replace(
                    "text", F.lit(r"(\S+ \S+) "), salt
                )
                # quote inclusion (r16): first 20–40% of the words — a
                # shingle-SUBSET of the original (C = 1.0, J < 0.6); the
                # fraction varies by copy so same-doc quotes nest (still
                # containment pairs) instead of forming exact-dup cliques
                frac_pct = 20 + 5 * (c % 5)
                words = F.split(F.col("text"), " ")
                k = F.greatest(
                    F.lit(5), (F.size(words) * frac_pct / 100).cast("int")
                )
                quoted = F.array_join(F.slice(words, F.lit(1), k), " ")
                cp = cp.withColumn(
                    "text",
                    F.when(near, marked)
                    .when(casevar, F.initcap("text"))
                    .when(casenear, F.concat(F.initcap("text"), F.lit(f" v{c}")))
                    .when(subset, quoted)
                    .otherwise(scrambled),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if args.perturb and c > 0 and name == "embeddings":
                near = (F.col("vec_id") + c) % 10 == 0
                s = 1 + (c % 63)
                shifted = F.expr(
                    f"transform(sequence(0, size(embedding) - 1), "
                    f"i -> embedding[int((i + {s}) % size(embedding))])"
                ).cast("array<float>")
                cp = cp.withColumn(
                    "embedding", F.when(near, F.col("embedding")).otherwise(shifted)
                )
            for col in cols:
                cp = cp.withColumn(col, F.col(col) + F.lit(c * span))
            copies.append(cp)
        out = copies[0]
        for cp in copies[1:]:
            out = out.unionByName(cp)
        out.write.mode("overwrite").parquet(f"{args.dst}/{name}.parquet")
        print(f"{name}: x{args.factor} span={span}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
