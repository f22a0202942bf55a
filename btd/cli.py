"""spark-submit entry point: one subcommand per analysis/stage.

On a cluster:
    spark-submit --py-files btd.zip -m btd.cli ...  # or python -m btd.cli

Subcommands:
    analyze <name> --input PATH [--output DIR]   reference analysis on n-quad text
    kg-run --transcripts PARQUET --out DIR       full KG pipeline (resumable)
    kg-run --events-dir SFDIR --out DIR          same, transcripts derived from events
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
    pa.add_argument("--cores", type=int, default=None)

    pk = sub.add_parser("kg-run", help="north-rule KG construction pipeline")
    src = pk.add_mutually_exclusive_group(required=True)
    src.add_argument("--transcripts", help="parquet path with TRANSCRIPTS schema")
    src.add_argument("--events-dir", help="testdata sf dir to derive transcripts from")
    pk.add_argument("--out", required=True)
    pk.add_argument("--cores", type=int, default=None)

    args = p.parse_args(argv)
    spark = get_spark("btd-cli", cores=args.cores)

    if args.cmd == "analyze":
        triples = read_nquads(spark, args.input)
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
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
