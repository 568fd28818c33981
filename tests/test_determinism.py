"""SURVEY §5.2 item 5: two runs of the extraction pipeline at different
parallelism levels produce byte-identical sorted output (evidences the
north_rule identical-results-at-N-and-4N clause locally).

Each run happens in its own subprocess (own JVM + SparkSession at the
requested master); the sorted flat span output is hashed and compared.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_SRC = r"""
import hashlib, sys
sys.path.insert(0, {repo!r})
from doc_agent_spark.session import get_spark
from doc_agent_spark.operators import extractor
from doc_agent_spark import corpus
from doc_agent_spark.schema import DOCUMENTS_SPANS

spark = get_spark(app="determinism", master={master!r}, shuffle_partitions={parts})
docs = spark.createDataFrame(list(corpus.gen_docs(300)), DOCUMENTS_SPANS)
# spread so partitioning actually differs between the two runs
docs = docs.repartition({parts})
rows = extractor.extracted_spans(docs).collect()
h = hashlib.sha256()
for r in sorted((r.doc_id, r.order, r.kind, r.text, r.media_ref) for r in rows):
    h.update(repr(r).encode())
print("HASH:" + h.hexdigest())
spark.stop()
"""


def _run(master: str, parts: int) -> str:
    src = _RUN_SRC.format(repo=REPO, master=master, parts=parts)
    proc = subprocess.run(
        [sys.executable, "-c", src], capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for line in proc.stdout.splitlines():
        if line.startswith("HASH:"):
            return line[5:]
    raise AssertionError(f"no hash in output: {proc.stdout[-500:]}")


def test_output_identical_across_parallelism():
    h2 = _run("local[2]", 2)
    h8 = _run("local[8]", 8)
    assert h2 == h8
