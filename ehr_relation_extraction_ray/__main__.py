"""CLI entry points (the reference's script surface, Dataset-native).

    python -m ehr_relation_extraction_ray run        --input T --out DIR
    python -m ehr_relation_extraction_ray export-ner --input T --out DIR
    python -m ehr_relation_extraction_ray export-re  --input T --out DIR
    python -m ehr_relation_extraction_ray graph      --input T --out DIR
    python -m ehr_relation_extraction_ray annotate   --text "..." [--html]

``--input`` is a transcripts parquet file or a conversation-partitioned
directory (the directory layout selects the shuffle-free pipeline).
Mirrors: ``generate_data.py`` (NER/RE export CLIs), the predict path
(triples), ``fast_api.py`` (annotate). This CLI owns its Ray session
(guarded init; the driver-contract module never initializes Ray).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ehr_relation_extraction_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_io(p, out_required=True):
        p.add_argument("--input", required=True, help="transcripts parquet file or dir")
        p.add_argument("--out", required=out_required, help="output directory")

    add_io(sub.add_parser("run", help="transcripts -> deduped triples parquet"))
    p = sub.add_parser("run-checkpointed", help="resumable flagship run")
    add_io(p)
    p.add_argument("--checkpoint-dir", required=True)
    add_io(sub.add_parser("export-ner", help="CoNLL train/dev shards"))
    add_io(sub.add_parser("export-re", help="RE TSV train/dev/test shards"))
    add_io(sub.add_parser("graph", help="materialize nodes/edges parquet"))
    p = sub.add_parser("annotate", help="one document, no cluster")
    p.add_argument("--text", help="document text (default: read stdin)")
    p.add_argument("--html", action="store_true", help="print span HTML instead of JSON")
    args = ap.parse_args(argv)

    if args.cmd == "annotate":
        from .pipelines.serve import annotate_document

        text = args.text if args.text is not None else sys.stdin.read()
        out = annotate_document(text, html=args.html)
        if args.html:
            print(out["html"])
        else:
            print(
                json.dumps(
                    {
                        "mentions": out["mentions"].to_pylist(),
                        "edges": out["edges"].to_pylist(),
                        "triples": out["triples"].to_pylist(),
                    }
                )
            )
        return 0

    _init_ray()
    import ray

    from .pipelines import export, kg

    os.makedirs(args.out, exist_ok=True)
    if args.cmd == "run":
        run = kg.run_partitioned if os.path.isdir(args.input) else kg.run
        ds = run(args.input)
        ds.write_parquet(os.path.join(args.out, "triples"))
        print(json.dumps({"out": os.path.join(args.out, "triples")}))
    elif args.cmd == "run-checkpointed":
        ds = kg.run_checkpointed(args.input, args.checkpoint_dir)
        ds.write_parquet(os.path.join(args.out, "triples"))
        print(json.dumps({"out": os.path.join(args.out, "triples"),
                          "checkpoints": args.checkpoint_dir}))
    elif args.cmd == "export-ner":
        docs = kg.documents(args.input)
        info = export.export_ner(docs, args.out)
        print(json.dumps(info))
    elif args.cmd == "export-re":
        docs = kg.documents(args.input)
        info = export.export_re(docs, args.out)
        print(json.dumps(info))
    elif args.cmd == "graph":
        info = kg.materialize_graph(args.input, args.out)
        print(json.dumps({k: str(v) for k, v in info.items()}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
