"""Smoke tests for the headless CLI (`python -m searchengine_ray ...`) —
the `ray job submit` entry surface.  main(argv) is invoked in-process
inside the session Ray fixture (_ensure_ray's guarded init is a no-op
there), so the whole build -> query -> spell -> vocab -> verify chain
runs once without extra Ray sessions."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from searchengine_ray.__main__ import main


@pytest.fixture(scope="module")
def cli_env(ray_session, small_corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus_dir = str(root / "corpus")
    os.makedirs(corpus_dir)
    pq.write_table(small_corpus, os.path.join(corpus_dir, "part0.parquet"))
    index_dir = str(root / "index")
    return corpus_dir, index_dir


def test_build_then_query_chain(cli_env, capsys):
    corpus_dir, index_dir = cli_env

    assert main(["build", "--corpus", corpus_dir,
                 "--index", index_dir]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["num_docs"] == 300
    assert built["total_tokens"] > 0

    assert main(["query", "--index", index_dir, "the", "-k", "5"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert 0 < len(out) <= 5
    doc, score, _title = out[0].split("\t")
    assert float(score) > 0 and int(doc) >= 0

    assert main(["query", "--index", index_dir, "--mode", "bool",
                 "the"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert all(int(line.split("\t")[0]) >= 0 for line in out)

    assert main(["spell", "--index", index_dir, "teh"]) == 0
    assert capsys.readouterr().out.strip()

    assert main(["vocab", "--index", index_dir, "--limit", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
    term, df = out[0].split("\t")
    assert term and int(df) >= 1


def test_verify_subcommand(cli_env, capsys):
    corpus_dir, index_dir = cli_env
    assert main(["verify", "--corpus", corpus_dir,
                 "--index", index_dir]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["passed"] is True
