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


def test_rag_cli_mode(corpus_path):
    """`search_documents --rag` (the roadmap's `doc search --rag`) returns
    answer + citation + debug rows through the same CLI shell."""
    proc = subprocess.run(
        [sys.executable, "-m", "doc_agent_spark.serve", "search_documents",
         "--rag", "--input-path",
         "/root/testdata/sf0.001/documents.parquet",
         "--query", "spark join window", "--limit", "3"],
        capture_output=True, text=True, timeout=300, env=ENV, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    parts = {}
    for r in rows:
        parts.setdefault(r["part"], []).append(r)
    assert len(parts["citation"]) == 3
    answer = parts["answer"][0]["content"]
    # the answer stitches every citation's snippet behind its [n] marker
    for c in parts["citation"]:
        assert f"[{c['rank']}] {c['content']}" in answer
    assert parts["debug"][0]["content"].startswith("vector=")


def test_mcp_jsonrpc_mode(corpus_path):
    """A real MCP client flow: JSON-RPC 2.0 initialize -> tools/list ->
    tools/call (good + bad), one message per line. Protocol framing is
    what the round-3 verdict flagged as missing (the custom line-JSON
    protocol couldn't serve an MCP client)."""
    requests = "\n".join([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {"protocolVersion": "2024-11-05"}}),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/cancelled",
                    "params": {"requestId": 99}}),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}),
        json.dumps({"jsonrpc": "2.0", "id": 3, "method": "tools/call",
                    "params": {"name": "search_documents",
                               "arguments": {
                                   "input_path":
                                       "/root/testdata/sf0.001/documents.parquet",
                                   "query": "spark", "limit": 2}}}),
        json.dumps({"jsonrpc": "2.0", "id": 4, "method": "tools/call",
                    "params": {"name": "no_such_tool", "arguments": {}}}),
        json.dumps({"jsonrpc": "2.0", "id": 5, "method": "bogus/method"}),
    ]) + "\n"
    proc = subprocess.run(
        [sys.executable, "-m", "doc_agent_spark.serve", "--mcp"],
        input=requests, capture_output=True, text=True, timeout=300,
        env=ENV, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    resps = {r["id"]: r for ln in proc.stdout.splitlines()
             if ln.startswith("{") for r in [json.loads(ln)]}
    assert resps[1]["result"]["serverInfo"]["name"] == "doc-agent-spark"
    # negotiation answers OUR version; notifications draw NO response
    assert resps[1]["result"]["protocolVersion"] == "2024-11-05"
    assert None not in resps
    tools = {t["name"]: t for t in resps[2]["result"]["tools"]}
    assert "rag_search" in tools and "extract_document" in tools
    assert tools["search_documents"]["inputSchema"]["properties"]["limit"] == {
        "type": "integer"}
    assert "limit" not in tools["search_documents"]["inputSchema"]["required"]
    rows = json.loads(resps[3]["result"]["content"][0]["text"])
    assert rows and {"id", "score", "snippet"} <= set(rows[0])
    # tool error -> isError result (MCP convention), not a protocol error
    assert resps[4]["result"]["isError"] is True
    # unknown method -> JSON-RPC error object
    assert resps[5]["error"]["code"] == -32601


def test_http_mode_serves_search_and_rag(corpus_path):
    """`doc serve --port` analog: real HTTP requests against the running
    server — GET /operations, POST /search_documents, POST /rag, and a
    bad op returning ok:false without killing the server."""
    import time
    import urllib.error
    import urllib.request

    proc = subprocess.Popen(
        [sys.executable, "-m", "doc_agent_spark.serve", "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=ENV, cwd=REPO,
    )
    try:
        line = proc.stdout.readline()          # {"ok": true, "listening": N}
        port = json.loads(line)["listening"]
        base = f"http://127.0.0.1:{port}"

        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        with urllib.request.urlopen(base + "/operations", timeout=60) as r:
            ops = json.loads(r.read())
        assert any(o["name"] == "rag_search" for o in ops["operations"])

        docs = "/root/testdata/sf0.001/documents.parquet"
        code, body = post("/search_documents",
                          {"input_path": docs, "query": "spark", "limit": 2})
        assert code == 200 and len(body["rows"]) == 2
        assert {"id", "score", "snippet"} <= set(body["rows"][0])

        code, body = post("/rag", {"input_path": docs,
                                   "query": "spark join", "limit": 2})
        assert code == 200
        parts = {r["part"] for r in body["rows"]}
        assert parts == {"citation", "answer", "debug"}

        code, body = post("/no_such_op", {})
        assert code == 404 and not body["ok"]          # unknown op -> 404
        code, body = post("/search_documents", {"query": "x"})
        assert code == 400 and not body["ok"]          # missing params -> 400
        # server survived the bad request
        with urllib.request.urlopen(base + "/operations", timeout=60) as r:
            assert json.loads(r.read())["ok"]
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_eval_cli_flags(tmp_path):
    """evaluate_dataset is reachable from ONE-SHOT CLI mode via
    --dataset-path/--compare (review finding: it previously only worked
    through stdio/mcp/http)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ds = str(tmp_path / "ds.parquet")
    pq.write_table(pa.table({
        "query_id": pa.array([0, 1], pa.int64()),
        "query": ["spark join", "window scan"],
        "relevant_ids": pa.array([[1, 2], [3]], pa.list_(pa.int64())),
        "category": ["a", "b"],
    }), ds)
    proc = subprocess.run(
        [sys.executable, "-m", "doc_agent_spark.serve", "evaluate_dataset",
         "--input-path", "/root/testdata/sf0.001/documents.parquet",
         "--dataset-path", ds, "--compare", "ollama"],
        capture_output=True, text=True, timeout=300, env=ENV, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    scopes = {r["scope"] for r in rows}
    assert scopes == {"query", "category", "overall", "provider"}


def test_rag_rejects_incompatible_flags(corpus_path):
    proc = subprocess.run(
        [sys.executable, "-m", "doc_agent_spark.serve", "search_documents",
         "--rag", "--mode", "vector", "--input-path", corpus_path,
         "--query", "x"],
        capture_output=True, text=True, timeout=120, env=ENV, cwd=REPO,
    )
    assert proc.returncode != 0
    assert "--mode/--rerank do not apply" in proc.stderr


def test_result_cache_hit_miss_invalidation(tmp_path):
    """Roadmap :348 query caching: same request twice through --stdio with
    --cache-dir = miss then hit (same key, identical rows); touching the
    input parquet (snapshot fingerprint change) = miss with a NEW key."""
    import shutil

    corpus = str(tmp_path / "docs.parquet")
    shutil.copytree("/root/testdata/sf0.001", tmp_path / "tier")
    shutil.copy(tmp_path / "tier" / "documents.parquet", corpus)
    cache_dir = str(tmp_path / "cache")

    req = json.dumps({"id": 1, "op": "search_documents",
                      "params": {"input_path": corpus,
                                 "query": "spark join", "limit": 3}}) + "\n"

    def run(n_reqs):
        reqs = "".join(
            req.replace('"id": 1', f'"id": {i + 1}') for i in range(n_reqs)
        )
        proc = subprocess.run(
            [sys.executable, "-m", "doc_agent_spark.serve", "--stdio",
             "--cache-dir", cache_dir],
            input=reqs, capture_output=True, text=True, timeout=300,
            env=ENV, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return [json.loads(ln) for ln in proc.stdout.splitlines()
                if ln.startswith("{")]

    first, second = run(2)
    assert first["ok"] and second["ok"]
    assert first["cache"]["hit"] is False and second["cache"]["hit"] is True
    assert first["cache"]["key"] == second["cache"]["key"]
    assert first["rows"] == second["rows"] and len(first["rows"]) == 3
    assert second["cache"] == {**second["cache"], "hits": 1, "misses": 1}

    # cache persists across processes: a fresh server hits immediately
    (third,) = run(1)
    assert third["cache"]["hit"] is True and third["rows"] == first["rows"]

    # invalidation: any change to the input snapshot (here: mtime bump)
    # changes the fingerprint, hence the key — stale entry never served
    os.utime(corpus)
    (fourth,) = run(1)
    assert fourth["cache"]["hit"] is False
    assert fourth["cache"]["key"] != first["cache"]["key"]
    assert fourth["rows"] == first["rows"]
