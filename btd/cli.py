"""spark-submit entry point: one subcommand per analysis/stage.

On a cluster:
    spark-submit --py-files btd.zip -m btd.cli ...  # or python -m btd.cli

Subcommands:
    analyze <name> --input PATH [--output DIR]   reference analysis on n-quad text
    kg-run --transcripts PARQUET --out DIR       full KG pipeline (resumable)
    kg-run --events-dir SFDIR --out DIR          same, transcripts derived from events
    curate --documents PARQUET --out DIR         training-data curation chain
        [--near-dup-threshold J] [--mix src=rate,...]
"""

from __future__ import annotations

import argparse
import sys

from btd import analytics as A
from btd.parse import read_nquads
from btd.session import get_spark

ANALYSES = {
    "distinct": lambda t: A.distinct_subject_count(t),
    "outdegree": A.outdegree_histogram,
    "indegree": A.indegree_histogram,
    "topk-outdegree": lambda t: A.top_k_outdegree(t, 10),
    "percentages": lambda t: A.percentages(t),
    "contexts": A.distinct_contexts_per_triple,
    "top-contexts": lambda t: A.top_k_contexts(t, 10),
    "dedup": A.remove_duplicate_triples,
}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="btd")
    sub = p.add_subparsers(dest="cmd", required=True)

    pa = sub.add_parser("analyze", help="reference analysis over n-quad text files")
    pa.add_argument("name", choices=sorted(ANALYSES))
    pa.add_argument("--input", required=True)
    pa.add_argument("--output", default=None, help="parquet out dir; default: show")
    pa.add_argument(
        "--text-output",
        default=None,
        help="gzip text out dir: the reference's exact byte format — "
        "'s p o  .' lines for dedup, 'degree<TAB>count' ascending "
        "for outdegree/indegree (S3/S4 sink)",
    )
    pa.add_argument(
        "--min-partitions",
        type=int,
        default=None,
        help="decompress-then-repartition floor for unsplittable .gz "
        "inputs (one gz file = one task otherwise — the reference's "
        "parallelism ceiling); no-op on well-split inputs",
    )
    pa.add_argument("--cores", type=int, default=None)

    pk = sub.add_parser("kg-run", help="north-rule KG construction pipeline")
    src = pk.add_mutually_exclusive_group(required=True)
    src.add_argument("--transcripts", help="parquet path with TRANSCRIPTS schema")
    src.add_argument("--events-dir", help="testdata sf dir to derive transcripts from")
    pk.add_argument("--out", required=True)
    pk.add_argument("--cores", type=int, default=None)

    pc = sub.add_parser(
        "curate",
        help="training-data curation over a documents parquet: quality "
        "filter + exact dedup, then optional near-dup group removal "
        "and weighted source mixing",
    )
    pc.add_argument("--documents", required=True)
    pc.add_argument("--out", required=True)
    pc.add_argument(
        "--near-dup-threshold",
        type=float,
        default=None,
        help="also drop near-duplicate group members at this shingle "
        "Jaccard (keeper = min doc_id per connected component)",
    )
    pc.add_argument(
        "--mix",
        default=None,
        help="source=rate[,source=rate...] manifest; unlisted sources "
        "are dropped (deterministic md5-bucket sampling)",
    )
    pc.add_argument("--cores", type=int, default=None)

    args = p.parse_args(argv)
    spark = get_spark("btd-cli", cores=args.cores)

    if args.cmd == "analyze":
        triples = read_nquads(
            spark, args.input, min_partitions=args.min_partitions
        )
        out = ANALYSES[args.name](triples)
        if args.text_output:
            if args.name == "dedup":
                from btd.parse import to_nquad_lines

                # reference part-file order: descending (s,p,o) from
                # the inverted compareTo — byte-diffable vs published
                # output (coalesce(1): one part file like one reducer)
                lines = to_nquad_lines(out, order="reference").coalesce(1)
            elif args.name in ("outdegree", "indegree"):
                from btd.analytics.degrees import histogram_text_lines

                lines = histogram_text_lines(out).coalesce(1)
            else:
                raise SystemExit(
                    "--text-output supports dedup/outdegree/indegree"
                )
            lines.write.mode("overwrite").option(
                "compression", "gzip"
            ).text(args.text_output)
            print(f"wrote {args.text_output}")
        elif args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"wrote {args.output}")
        else:
            out.show(50, truncate=False)
    elif args.cmd == "kg-run":
        from btd import pipeline
        from btd.extract.derive import transcripts_from_events

        tx = (
            spark.read.parquet(args.transcripts)
            if args.transcripts
            else transcripts_from_events(spark, args.events_dir)
        )
        res = pipeline.run(spark, tx, args.out)
        for name, df in res.items():
            print(f"{name}: {df.count()} rows")
    elif args.cmd == "curate":
        from pyspark.sql import functions as F

        from btd.dataops.curation import curate, mix_sources

        docs = spark.read.parquet(args.documents)
        n_in = docs.count()
        # quality filter + exact content dedup (min doc_id per
        # fingerprint), rejoined for the full row
        survivors = docs.join(curate(docs).select("doc_id"), "doc_id")
        n_q = survivors.count()
        if args.near_dup_threshold is not None:
            from btd.dataops.dedup import near_dup_groups

            groups = near_dup_groups(
                survivors.select("doc_id", "text"), args.near_dup_threshold
            )
            keepers = groups.where(
                F.col("doc_id") == F.col("keep_doc_id")
            ).select("doc_id")
            survivors = survivors.join(keepers, "doc_id")
        n_nd = survivors.count()
        if args.mix:
            weights = dict(
                (s, float(r))
                for s, r in (kv.split("=") for kv in args.mix.split(","))
            )
            survivors = mix_sources(survivors, weights)
        n_out = survivors.count()
        survivors.write.mode("overwrite").parquet(args.out)
        print(
            f"in={n_in} after_quality_dedup={n_q} "
            f"after_near_dup={n_nd} out={n_out} -> {args.out}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
