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
    p.add_argument("--pages", help="input pages table path (required except --daemon with `from udp`)")
    p.add_argument("--lookup", help="host lookup table path (required without --config)")
    p.add_argument("--out", required=True, help="output root (sinks + _manifest/_lineage)")
    p.add_argument("--config", help="Beholder config text file (optional)")
    p.add_argument("--no-checkpoint", action="store_true", help="disable lineage/resume")
    p.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    p.add_argument(
        "--daemon",
        action="store_true",
        help="run the config as a LONG-RUNNING stream (`beholder -c conf` parity): "
        "`from udp` configs get the datagram bridge; otherwise --pages is "
        "tailed as a file stream. SIGHUP or editing the config hot-reloads.",
    )
    p.add_argument("--checkpoint", help="streaming checkpoint dir (daemon mode; default <out>/_checkpoint)")
    p.add_argument(
        "--daemon-seconds",
        type=float,
        default=None,
        help="stop the daemon after N seconds (default: run until Ctrl-C/stop)",
    )
    args = p.parse_args(argv)

    from beholder_spark.session import get_spark, ship_package

    spark = get_spark("beholder-spark-job", master=args.master)
    ship_package(spark)

    if args.daemon:
        if not args.config:
            p.error("--daemon requires --config")
        return _run_daemon(spark, p, args)

    if not args.pages:
        p.error("--pages is required")
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


def _run_daemon(spark, p, args) -> int:
    """Daemon execution (`beholder -c config` parity): `from udp` configs
    get the datagram→spool bridge, `from tcp … as syslog-frame` configs
    the RFC6587 frame bridge; others tail --pages as a file stream.
    All run under the hot-reload supervisor (SIGHUP / config-mtime swap
    of the pipeline STAGES — the listeners stay bound across reloads;
    changing ports/spools needs a restart, the spool directory being the
    stable handoff point)."""
    import os
    import time

    from beholder_spark import config as C

    ckpt = args.checkpoint or os.path.join(args.out, "_checkpoint")
    with open(args.config) as f:
        text = f.read()
    cmds = C.parse_config(text)
    first_from = next((c for c in cmds if c.name == "from"), None)
    deadline = time.monotonic() + args.daemon_seconds if args.daemon_seconds else None

    bridges = []
    probe = C.compile_config(text)
    if first_from is not None and first_from.args and first_from.args[0].value in ("udp", "tcp"):
        probe(None, spark=spark)  # records the ingest declarations
    if probe.udp_ingest or probe.tcp_frame_ingest:
        # start the listeners once, from the declared specs; the
        # supervisor's self-sourcing recompiles re-tail the same spools
        from beholder_spark.sources import TcpSyslogFrameBridge, UdpSpoolBridge

        for spec in probe.udp_ingest:
            b = UdpSpoolBridge(spec["spool"], port=spec["port"], flush_secs=0.2)
            b.start()
            bridges.append(b)
        for spec in probe.tcp_frame_ingest:
            b = TcpSyslogFrameBridge(
                spec["spool"], host=spec["host"], port=spec["port"], flush_secs=0.2
            )
            b.start()
            bridges.append(b)
        stream_factory = lambda: None  # noqa: E731 — self-sourcing config
        kind = "udp" if probe.udp_ingest else "tcp syslog-frame"
        banner = f"daemon: listening {kind} port {bridges[0].port} → {args.out}"
    else:
        if not args.pages:
            p.error(
                "--daemon without a `from udp`/`from tcp … as syslog-frame` "
                "config requires --pages (streaming source dir)"
            )
        schema = spark.read.parquet(args.pages).schema
        stream_factory = lambda: spark.readStream.schema(schema).parquet(args.pages)  # noqa: E731
        banner = f"daemon: streaming {args.pages} → {args.out}"

    sup = C.ConfigStreamSupervisor(spark, args.config, stream_factory, args.out, ckpt)
    try:
        sup.start()
        sup.install_sighup()
        sup.watch()
        print(f"{banner} (SIGHUP/config-edit reloads)", flush=True)
        while deadline is None or time.monotonic() < deadline:
            for b in bridges:
                b.raise_if_failed()  # dead listener → exit non-zero, not idle
            q = sup.query
            gen = sup.generation
            q.awaitTermination(2)
            if not q.isActive:
                # a reload may be mid-swap (old query stopped, new one
                # not yet assigned): give it a grace period and only
                # exit if no new generation appeared
                time.sleep(2)
                if sup.generation == gen and not sup.query.isActive:
                    break
    finally:
        sup.stop()
        for b in bridges:
            b.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
