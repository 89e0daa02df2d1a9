"""kgray command-line interface (the reference's ``kg`` CLI surface).

Subcommands mirror the reference's click CLI (run.py:56-273):

  merge      — reference-conformant KGX merge from a YAML config or a
               data directory (naming-convention discovery, S8)
  construct  — the web-scale pages→KG construction pipeline
  download   — validate a YAML plan; --fetch downloads over HTTP(S)
  query      — convert saved SPARQL JSON to TSV, or --endpoint to run
               the query over the SPARQL 1.1 protocol
  holdouts   — connectivity-preserving ML edge holdouts (the reference
               declares this command but raises NotImplementedError;
               here it runs: spanning forest + sampled negatives)

This entry point OWNS the Ray session (guarded init); library code
never initializes Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus=None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def _load_any(paths):
    """Load by extension: .tsv (KGX all-string), .jsonl/.json, .parquet —
    multi-file inputs union by name."""
    first = paths[0].lower()
    if first.endswith(".tsv"):
        from kgray.sources.kgx_tsv import load_kgx_files

        return load_kgx_files(paths)
    if first.endswith((".jsonl", ".json")):
        from kgray.sources.jsonl import load_jsonl_files

        return load_jsonl_files(paths)
    import ray.data

    return ray.data.read_parquet(paths)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kgray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pm = sub.add_parser("merge", help="KGX merge (reference-conformant)")
    g = pm.add_mutually_exclusive_group(required=True)
    g.add_argument("--config", help="MergeKG-style YAML config")
    g.add_argument("--data-dir", help="raw-data dir (naming-convention discovery)")
    pm.add_argument("--output", default="data/merged")
    pm.add_argument("--merge-label", default="merged-kg")
    pm.add_argument("--subset-transforms", nargs="*", default=None)
    pm.add_argument("--edge-provenance", action="store_true")

    pc = sub.add_parser("construct", help="pages → KG construction")
    pc.add_argument("--pages", required=True)
    pc.add_argument("--aliases", required=True)
    pc.add_argument("--out", required=True)
    pc.add_argument("--no-resume", action="store_true")

    pd = sub.add_parser("download", help="validate a download YAML plan; --fetch to download")
    pd.add_argument("--config", required=True)
    pd.add_argument("--fetch", action="store_true")
    pd.add_argument("--output-dir", default="data/raw")
    pd.add_argument("--snippet-only", action="store_true")

    pq = sub.add_parser("query", help="SPARQL: saved JSON → TSV, or --endpoint to execute")
    pq.add_argument("--input-json")
    pq.add_argument("--query")
    pq.add_argument("--endpoint")
    pq.add_argument("--output-tsv", required=True)

    ph = sub.add_parser("holdouts", help="connectivity-preserving ML edge holdouts")
    ph.add_argument("-n", "--nodes", help="nodes KGX TSV (unused; parity with the reference signature)")
    ph.add_argument("-e", "--edges", required=True, help="edges KGX TSV")
    ph.add_argument("-o", "--output-dir", required=True)
    ph.add_argument("-t", "--train-fraction", type=float, default=0.8)
    ph.add_argument("-v", "--validation", action="store_true")
    ph.add_argument("--seed", type=int, default=13)

    pv = sub.add_parser("convert", help="convert between tsv / jsonl / parquet")
    pv.add_argument("--input", required=True, nargs="+")
    pv.add_argument("--output", required=True)
    pv.add_argument("--to", required=True, choices=["tsv", "jsonl", "parquet"])

    # ---- kg-chat CLI surface (reference run.py:276-381) ------------------
    # The reference registers import/test-query/show-schema/app/chat/qna
    # only when the external kg-chat package imports. The three DATA
    # commands are pure data-processing (load KGX TSVs into a queryable
    # DuckDB store, sample it, show its schema) — implemented natively
    # here. The three LLM commands wrap an external chat package and
    # gate exactly like the reference does (clear error when absent).
    def _chat_db_args(sp):
        sp.add_argument("--database", default="duckdb",
                        choices=["duckdb", "neo4j"])
        sp.add_argument("--data-dir", required=True,
                        help="directory with the merged KGX *nodes*.tsv / *edges*.tsv")

    _chat_db_args(sub.add_parser(
        "import", help="load the KGX TSVs into a queryable store"))
    _chat_db_args(sub.add_parser(
        "test-query", help="sample query over the imported store"))
    _chat_db_args(sub.add_parser(
        "show-schema", help="print the imported store's table schemas"))
    for name, hlp in (("app", "chat web app (requires an external chat package)"),
                      ("chat", "interactive chat (requires an external chat package)"),
                      ("qna", "one-shot question (requires an external chat package)")):
        sp = sub.add_parser(name, help=hlp)
        _chat_db_args(sp)
        if name == "qna":
            sp.add_argument("query", type=str)
        if name == "app":
            sp.add_argument("--debug", action="store_true")

    args = p.parse_args(argv)

    if args.cmd == "merge":
        _ensure_ray(args.num_cpus)
        from kgray.pipelines.config import MergeConfig, SourceConfig, load_config, merge_from_config

        if args.config:
            config = load_config(args.config)
        else:
            from kgray.sources.discovery import collect_kg_paths

            node_paths, edge_paths, onto_nodes = collect_kg_paths(args.data_dir, args.subset_transforms)
            config = MergeConfig(
                name=args.merge_label,
                output_directory=args.output,
                sources=[SourceConfig(name=n, nodes=n) for n in node_paths]
                + [SourceConfig(name=e, edges=e) for e in edge_paths],
                ontologies=[SourceConfig(name=k, nodes=v) for k, v in onto_nodes.items()],
                edge_provenance=args.edge_provenance,
            )
        result = merge_from_config(config)
        print(json.dumps({k: v for k, v in result.items() if isinstance(v, (str, int, float, list))}))
        return 0

    if args.cmd == "construct":
        _ensure_ray(args.num_cpus)
        from kgray.pipelines.construct import construct_kg

        counters = construct_kg(args.pages, args.aliases, args.out, resume=not args.no_resume)
        print(json.dumps(counters))
        return 0

    if args.cmd == "download":
        from kgray.sources.download import download, plan_downloads

        plan = plan_downloads(args.config)
        print(json.dumps([vars(i) for i in plan]))
        if args.fetch:
            paths = download(args.config, args.output_dir,
                             snippet_only=args.snippet_only)
            print(json.dumps(paths))
        return 0

    if args.cmd == "holdouts":
        _ensure_ray(args.num_cpus)
        import os

        from kgray.sources.kgx_tsv import load_kgx_files
        from kgray.stages.holdout import edge_holdout

        edges = load_kgx_files([args.edges])
        out = edge_holdout(edges, src="subject", dst="object",
                           train_fraction=args.train_fraction,
                           seed=args.seed, validation=args.validation,
                           neg_train=True)
        os.makedirs(args.output_dir, exist_ok=True)
        df = out.to_pandas().sort_values(["split", "u", "v"])
        name_map = {"pos_train": "pos_train_edges.tsv",
                    "pos_test": "pos_test_edges.tsv",
                    "pos_valid": "pos_valid_edges.tsv",
                    "neg_train": "neg_train.tsv",
                    "neg_test": "neg_test.tsv",
                    "neg_valid": "neg_valid.tsv"}
        written = {}
        for split, g in df.groupby("split"):
            path = os.path.join(args.output_dir, name_map[str(split)])
            g[["u", "v"]].rename(columns={"u": "subject", "v": "object"}).to_csv(
                path, sep="\t", index=False)
            written[str(split)] = len(g)
        print(json.dumps(written))
        return 0

    if args.cmd == "convert":
        _ensure_ray(args.num_cpus)
        ds = _load_any(args.input)
        if args.to == "tsv":
            from kgray.sources.kgx_tsv import dataset_to_sorted_tsv

            cols = list(ds.schema().names)
            dataset_to_sorted_tsv(ds, args.output, columns=cols, sort_keys=[cols[0]])
        elif args.to == "jsonl":
            from kgray.sources.jsonl import write_jsonl

            write_jsonl(ds, args.output)
        else:
            ds.write_parquet(args.output)
        print(args.output)
        return 0

    if args.cmd in ("import", "test-query", "show-schema"):
        from kgray.state.kgstore import (import_kg_duckdb, sample_query,
                                         show_schema)

        if args.database != "duckdb":
            p.error(f"database {args.database!r} requires external packages "
                    "not present in this environment; use duckdb")
        if args.cmd == "import":
            counts = import_kg_duckdb(args.data_dir)
            print(json.dumps(counts))
        elif args.cmd == "test-query":
            for row in sample_query(args.data_dir):
                print(json.dumps(row))
        else:
            print(json.dumps(show_schema(args.data_dir)))
        return 0

    if args.cmd in ("app", "chat", "qna"):
        # mirror of the reference's conditional registration: these wrap
        # an external LLM chat package (reference: "kg-chat must be
        # installed for these CLI commands to work")
        try:
            import kg_chat  # noqa: F401
        except ImportError:
            p.error(f"'{args.cmd}' requires the external kg-chat package, "
                    "which is not installed; the data commands "
                    "(import / test-query / show-schema) work without it")
        p.error(f"'{args.cmd}' is not wired to an LLM backend in this build")

    if args.cmd == "query":
        from kgray.sources.sparql import result_dict_to_tsv, run_query

        if args.endpoint:
            if not args.query:
                p.error("--endpoint requires --query")
            result = run_query(args.query, args.endpoint)
        else:
            if not args.input_json:
                p.error("provide --input-json or --endpoint/--query")
            with open(args.input_json) as f:
                result = json.load(f)
        result_dict_to_tsv(result, args.output_tsv)
        print(args.output_tsv)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
