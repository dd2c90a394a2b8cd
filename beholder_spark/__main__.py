"""spark-submit entry point (BASELINE.json:14 deployment contract).

Cluster:

    spark-submit --py-files beholder_spark.zip -m ... \
        beholder_spark/__main__.py \
        --pages s3://…/pages --lookup s3://…/host_lookup --out s3://…/run1

Local smoke:

    python -m beholder_spark --pages /tmp/fx/pages.parquet \
        --lookup /tmp/fx/host_lookup.parquet --out /tmp/out

With ``--config <file>`` the stages come from Beholder config text
(:mod:`beholder_spark.config`) instead of the built-in pages spec. The job
is resumable: rerunning with the same --out skips partitions already in
the checkpoint manifest (``--no-checkpoint`` disables lineage/resume).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="beholder_spark")
    p.add_argument("--pages", required=True, help="input pages table path")
    p.add_argument("--lookup", help="host lookup table path (required without --config)")
    p.add_argument("--out", required=True, help="output root (sinks + _manifest/_lineage)")
    p.add_argument("--config", help="Beholder config text file (optional)")
    p.add_argument("--no-checkpoint", action="store_true", help="disable lineage/resume")
    p.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    args = p.parse_args(argv)

    from beholder_spark.session import get_spark, ship_package

    spark = get_spark("beholder-spark-job", master=args.master)
    ship_package(spark)

    if args.config:
        from beholder_spark.config import run_config_pipeline

        with open(args.config) as f:
            text = f.read()
        pages = spark.read.parquet(args.pages)
        results = run_config_pipeline(spark, pages, text, args.out)
        for name, df in results.items():
            print(f"{name}: {df.count()} rows")
    else:
        if not args.lookup:
            p.error("--lookup is required without --config")
        from beholder_spark.pipeline import run_pages_pipeline

        results = run_pages_pipeline(
            spark, args.pages, args.lookup, args.out, checkpoint=not args.no_checkpoint
        )
        from beholder_spark.plans import lineage as ln

        lin = ln.read_lineage(spark, args.out)
        if lin is not None:
            lin.orderBy("run_id").show(truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
