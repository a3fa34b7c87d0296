"""CLI — the headless equivalent of the reference's GUI workflow
(load corpus -> index -> search, /root/reference/main.py + interface/).

Usage:
  python -m searchengine_ray build  --corpus PATH --index DIR [--analyzer reference|whitespace|spanish]
  python -m searchengine_ray query  --index DIR "raw query" [--mode bm25|default|bool] [-k 10]
  python -m searchengine_ray spell  --index DIR "misspelled words"
  python -m searchengine_ray vocab  --index DIR [--limit 20]
  python -m searchengine_ray merge  --out DIR PART_DIR [PART_DIR ...]
  python -m searchengine_ray verify --corpus PATH --index DIR [--no-ids]

Owns its Ray session (guarded init) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)


def cmd_build(args) -> int:
    _ensure_ray()
    import ray.data

    from .build import IndexBuildConfig, build_index

    cfg = IndexBuildConfig(analyzer=args.analyzer)
    corpus = ray.data.read_parquet(args.corpus)
    manifest = build_index(
        corpus, args.index, cfg, input_description=args.corpus
    )
    print(json.dumps(
        {k: manifest[k] for k in
         ("num_docs", "total_tokens", "avg_doc_length", "build_seconds")}
    ))
    return 0


def cmd_query(args) -> int:
    from .query.engine import QueryEngine

    eng = QueryEngine(args.index)
    if args.mode == "bool":
        docs = eng.boolean_query(args.query)
        for d in docs[: args.k]:
            print(f"{d}\t{eng.index.get_title(int(d))}")
        print(f"# {docs.size} matching documents", file=sys.stderr)
    else:
        ranked = eng.ranked_query(
            args.query, use_okapi=(args.mode == "bm25"), top_k=args.k
        )
        for d, s in ranked:
            print(f"{d}\t{s:.6f}\t{eng.index.get_title(d)}")
    return 0


def cmd_spell(args) -> int:
    from .query.engine import QueryEngine
    from .query.spelling import SpellingCorrection

    eng = QueryEngine(args.index)
    print(SpellingCorrection(eng.index).suggest(args.query))
    return 0


def cmd_vocab(args) -> int:
    from .query.engine import QueryEngine

    eng = QueryEngine(args.index)
    vocab = eng.index.get_vocabulary()
    for t in vocab[: args.limit]:
        print(f"{t}\t{eng.index.df(t)}")
    print(f"# {len(vocab)} terms", file=sys.stderr)
    return 0


def cmd_merge(args) -> int:
    _ensure_ray()
    from .merge import merge_indexes

    manifest = merge_indexes(args.parts, args.out)
    print(json.dumps(
        {k: manifest[k] for k in
         ("num_docs", "total_tokens", "avg_doc_length", "build_seconds")}
    ))
    return 0


def cmd_verify(args) -> int:
    _ensure_ray()
    from .verify import verify_index_content

    report = verify_index_content(
        args.corpus, args.index, check_ids=not args.no_ids
    )
    print(json.dumps(report))
    return 0 if report["passed"] else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="searchengine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from a parquet corpus")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--analyzer", default="reference",
                   choices=["reference", "whitespace", "spanish"])
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="query an index")
    q.add_argument("--index", required=True)
    q.add_argument("query")
    q.add_argument("--mode", default="bm25",
                   choices=["bm25", "default", "bool"])
    q.add_argument("-k", type=int, default=10)
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("spell", help="spelling suggestions from the vocab")
    s.add_argument("--index", required=True)
    s.add_argument("query")
    s.set_defaults(fn=cmd_spell)

    v = sub.add_parser("vocab", help="dump vocabulary with df")
    v.add_argument("--index", required=True)
    v.add_argument("--limit", type=int, default=20)
    v.set_defaults(fn=cmd_vocab)

    mg = sub.add_parser(
        "merge",
        help="fold generation indexes (base + doc_id_base deltas) into "
             "one servable index",
    )
    mg.add_argument("parts", nargs="+",
                    help="generation index dirs (any order; doc ranges "
                         "must tile 0..N-1)")
    mg.add_argument("--out", required=True)
    mg.set_defaults(fn=cmd_merge)

    vf = sub.add_parser(
        "verify",
        help="check per-row content sha256 equality: index vs source corpus",
    )
    vf.add_argument("--corpus", required=True)
    vf.add_argument("--index", required=True)
    vf.add_argument("--no-ids", action="store_true",
                    help="skip the doc_id binding check (content multiset only)")
    vf.set_defaults(fn=cmd_verify)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
