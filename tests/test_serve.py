"""End-to-end drive of the transport shell (doc_agent_spark/serve.py):
real subprocesses, real stdin/stdout — the surface a user invokes, analog
of the reference CLI (cli.ts:22-68) and MCP stdio server (server.ts:12-60).

Subprocesses get their own small SparkSession (local[2]); both modes are
exercised in one test each to keep session spin-up cost bounded.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "SPARK_GRAFT_CPUS": "2", "PYTHONPATH": REPO}


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    from doc_agent_spark import corpus
    from doc_agent_spark.schema import DOCUMENTS_SPANS

    p = str(tmp_path_factory.mktemp("serve") / "docs.parquet")
    spark.createDataFrame(list(corpus.gen_docs(30)), DOCUMENTS_SPANS).write.parquet(p)
    return p


def test_cli_mode_prints_json_rows(corpus_path):
    proc = subprocess.run(
        [sys.executable, "-m", "doc_agent_spark.serve", "extract_document",
         "--input-path", corpus_path, "--row-limit", "7"],
        capture_output=True, text=True, timeout=300, env=ENV, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(ln) for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(rows) == 7
    assert {"doc_id", "order", "kind"} <= set(rows[0])


def test_stdio_mode_serves_multiple_requests(corpus_path):
    requests = "\n".join([
        json.dumps({"id": 1, "op": "list_operations"}),
        json.dumps({"id": 2, "op": "no_such_op", "params": {}}),
        json.dumps({"id": 3, "op": "search_documents",
                    "params": {"input_path": "/root/testdata/sf0.001/documents.parquet",
                               "query": "spark join", "limit": 3}}),
    ]) + "\n"
    proc = subprocess.run(
        [sys.executable, "-m", "doc_agent_spark.serve", "--stdio"],
        input=requests, capture_output=True, text=True, timeout=300,
        env=ENV, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    resps = {r["id"]: r for ln in proc.stdout.splitlines() if ln.startswith("{")
             for r in [json.loads(ln)]}
    assert resps[1]["ok"] and any(
        o["name"] == "extract_document" for o in resps[1]["operations"]
    )
    # a bad request errors WITHOUT killing the server (request 3 still served)
    assert not resps[2]["ok"] and "KeyError" in resps[2]["error"]
    assert resps[3]["ok"] and len(resps[3]["rows"]) <= 3
