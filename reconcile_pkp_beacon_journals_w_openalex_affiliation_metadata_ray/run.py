"""CLI entry point — the engine's user-extension surface (SURVEY.md
§2.10: the reference's surface is per-script argparse CLIs; here one
CLI selects a pipeline the way `--source-type` selected parser variants
in `parse_record_data_from_files.py:396-410`).

Usage:
    python -m reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.run \
        reconcile --sf-dir /root/testdata/sf0.001 --out /tmp/out [--workdir /tmp/ckpt]
    ... extract | mentions | stats | evaluate  (see --help)

Owns its Ray session (guarded init) — the only module besides bench.py
and tests allowed to.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_arguments(argv=None):
    p = argparse.ArgumentParser(description="Ray-Data record-linkage engine")
    p.add_argument("pipeline",
                   choices=["reconcile", "extract", "mentions", "stats", "evaluate",
                            "parse-records"])
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="testdata tier dir controlling fixture scale")
    p.add_argument("--out", default=None, help="output parquet dir (default: print summary only)")
    p.add_argument("--workdir", default=None,
                   help="checkpoint root; enables lineage manifests + resume")
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    # parse-records options (M7 `--source-type` dispatch parity,
    # `parse_record_data_from_files.py:38-56,396-410`)
    p.add_argument("--input-dir", default=None,
                   help="parse-records: base dir of *.jsonl.gz files "
                        "(default: the tier fixture's records_<source-type>/ tree)")
    p.add_argument("--source-type", choices=["crossref", "openalex"],
                   default="openalex", help="parse-records: source variant")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_arguments(argv)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_ray.context import tune_data_context
    tune_data_context()

    from .pipelines import reconcile

    summary = {"pipeline": args.pipeline, "sf_dir": args.sf_dir}
    if args.pipeline == "reconcile":
        if args.workdir:
            out, resumed = reconcile.run_reconcile_checkpointed(args.sf_dir, args.workdir)
            summary["resumed"] = resumed
        else:
            out = reconcile.run_reconcile(args.sf_dir)
        result = out["clusters"]
        summary["clusters"] = result.count()
    elif args.pipeline == "extract":
        import os as _os

        from .sources.fixtures import ensure_fixtures
        from .stages.extract import read_extract_pages

        fdir = ensure_fixtures(args.sf_dir)
        result = read_extract_pages(_os.path.join(fdir, "pages.parquet"))
        summary["pages"] = result.count()
    elif args.pipeline == "mentions":
        import os as _os

        from .sources.fixtures import ensure_fixtures
        from .stages.extract import mentions_from_extracted, read_extract_pages

        fdir = ensure_fixtures(args.sf_dir)
        result = mentions_from_extracted(
            read_extract_pages(_os.path.join(fdir, "pages.parquet")))
        summary["mentions"] = result.count()
    elif args.pipeline == "stats":
        from .stages import stats

        _, scored = reconcile.run_mention_scoring(args.sf_dir)
        summary["overall"] = {k: v for k, v in stats.overall_stats(scored).items()
                              if not isinstance(v, float) or v == v}
        result = None
    elif args.pipeline == "parse-records":
        from .sources.fixtures import ensure_fixtures
        from .stages import parse_records

        input_dir = args.input_dir or os.path.join(
            ensure_fixtures(args.sf_dir), f"records_{args.source_type}")
        if args.workdir:
            result, n_parsed, n_skipped = parse_records.parse_record_files_checkpointed(
                input_dir, args.source_type, args.workdir)
            summary["files_parsed"] = n_parsed
            summary["files_skipped"] = n_skipped
        else:
            result = parse_records.parse_record_files(input_dir, args.source_type)
        summary["input_dir"] = input_dir
        summary["source_type"] = args.source_type
        summary["rows"] = result.count()
    elif args.pipeline == "evaluate":
        out = reconcile.run_reconcile(args.sf_dir)
        res = reconcile.pairwise_f1(
            out["clusters"].materialize(),
            os.path.join(out["fixture_dir"], "labeled_pairs.parquet"))
        summary["f1"] = res
        summary["report"] = reconcile.pipeline_report(out)
        result = None

    if args.out and result is not None:
        result.write_parquet(args.out)
        summary["out"] = args.out
    print(json.dumps(summary, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
