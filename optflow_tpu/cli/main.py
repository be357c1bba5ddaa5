"""CLI entry point: ``python -m optflow_tpu.cli.main <job.json[.gz]>``.

Reference-compatible with ``optflow <file.json[.gz]>`` (src/optflow.cpp:29-72):
loads the (possibly gzipped) JSON job file and dispatches on ``style``
(1 = batch pair solve; 2 = the average-flow temporal aligner the reference
kept dormant, src/optflow.cpp:180-226 — implemented in align/average_flow).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="optflow",
        description="TPU-native dense optical flow over image-pair job files",
    )
    parser.add_argument("filename", help="json job file (optionally .gz)")
    parser.add_argument(
        "--no-features",
        action="store_true",
        help="disable feature pre-alignment regardless of job config",
    )
    ns = parser.parse_args(argv)

    from optflow_tpu.core.config import load_job

    args = load_job(ns.filename)
    if ns.no_features:
        args["features"] = False

    style = int(args.get("style", 1))
    if style == 1:
        from optflow_tpu.engine.features_glue import default_aligner

        if int(args.get("pair_batch", 1)) > 1:
            from optflow_tpu.engine.batch_runner import run_job_batched

            stats = run_job_batched(args, aligner=default_aligner)
        else:
            from optflow_tpu.engine.runner import run_job

            stats = run_job(args, aligner=default_aligner)
        print(f"done: {stats}")
        return 0
    if style == 2:
        from optflow_tpu.align.average_flow import average_flow_job

        average_flow_job(args)
        return 0
    print(f"unknown style {style}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
