"""Execute the real-model embedding branch (M1) without downloads.

``make_embed_udf(model_name=...)`` (search.py) mirrors the reference's
lazy module-global + ``encode(batch_size=32)`` shape
(reference embeddings.py:12-33, 79-103), but the real
``sentence_transformers`` package is absent from this container, so
the branch would otherwise never execute in CI — a typo in its
null-handling or dtype conversion would ship unnoticed (round-2
verdict item 2).

Fix: ship a deterministic FAKE ``sentence_transformers`` module to the
Python workers via ``sc.addPyFile`` (monkeypatching ``sys.modules`` in
the test process would not reach the worker processes where the UDF
imports it). The fake exposes the same ``SentenceTransformer.encode``
surface and returns shaped float32 arrays, so the entire production
code path — worker-side lazy import, load-once cache, batch encode,
null masking, dtype conversion, Arrow transfer — runs for real.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

FAKE_MODULE = '''
"""Deterministic stand-in for sentence_transformers (test-only)."""
import hashlib

import numpy as np

DIM = 384


class SentenceTransformer:
    def __init__(self, model_name):
        self.model_name = model_name

    def encode(self, texts, batch_size=32, convert_to_numpy=True):
        out = np.zeros((len(texts), DIM), dtype=np.float32)
        for i, t in enumerate(texts):
            h = hashlib.md5(t.encode("utf-8")).digest()
            pos = int.from_bytes(h[:4], "big") % DIM
            out[i, pos] = 1.0
            out[i, (pos + 1) % DIM] = float(len(t))
        return out
'''


@pytest.fixture(scope="module")
def fake_st(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("fake_st") / "sentence_transformers.py"
    p.write_text(FAKE_MODULE)
    spark.sparkContext.addPyFile(str(p))
    return p


def _expected_vec(text: str) -> list[float]:
    import hashlib

    import numpy as np
    v = np.zeros(384, dtype=np.float32)
    h = hashlib.md5(text.encode("utf-8")).digest()
    pos = int.from_bytes(h[:4], "big") % 384
    v[pos] = 1.0
    v[(pos + 1) % 384] = float(len(text))
    return [float(x) for x in v]


def test_model_branch_executes_with_fake_module(spark, fake_st):
    from openalex_neo4j_spark.search import embed_text_column

    df = spark.createDataFrame(
        [("a", "graph neural networks"), ("b", ""), ("c", "   "),
         ("d", None), ("e", "entity linking at scale")],
        ["id", "txt"],
    )
    out = embed_text_column(df, "txt", model_name="fake-model-branch")
    rows = {r["id"]: r["embedding"] for r in out.collect()}

    # null contract: empty / whitespace-only / null text -> null
    # embedding (reference embeddings.py:45-46)
    assert rows["b"] is None and rows["c"] is None and rows["d"] is None
    # 384-dim float contract on the real-model path
    for k in ("a", "e"):
        assert len(rows[k]) == 384
        assert all(isinstance(x, float) for x in rows[k][:4])
    assert rows["a"] == _expected_vec("graph neural networks")
    assert rows["e"] == _expected_vec("entity linking at scale")


def test_model_branch_batching_many_rows(spark, fake_st):
    """>1 Arrow batch and a mixed null pattern: the worker-side mask
    indexing (out[nonempty] = ...) must align positions correctly."""
    from openalex_neo4j_spark.search import embed_text_column

    data = [(str(i), f"title {i}" if i % 3 else "") for i in range(997)]
    df = spark.createDataFrame(data, ["id", "txt"]).repartition(4)
    out = embed_text_column(df, "txt", model_name="fake-model-branch")
    got = out.select(
        "id",
        F.col("embedding").isNull().alias("is_null"),
        F.element_at("embedding", 1).alias("e0"),
    ).collect()
    assert len(got) == 997
    for r in got:
        if int(r["id"]) % 3 == 0:
            assert r["is_null"]
        else:
            assert not r["is_null"]


def test_driver_side_udf_function_null_handling():
    """Driver-side execution of the same wrapped function via a stubbed
    module: pins the pandas indexing/fillna logic without Spark."""
    import sys
    import types

    import numpy as np

    fake = types.ModuleType("sentence_transformers")

    class _ST:
        def __init__(self, name):
            pass

        def encode(self, texts, batch_size=32, convert_to_numpy=True):
            return np.ones((len(texts), 384), dtype=np.float32)

    fake.SentenceTransformer = _ST
    old = sys.modules.get("sentence_transformers")
    sys.modules["sentence_transformers"] = fake
    try:
        import openalex_neo4j_spark.search as search
        search._MODEL_CACHE.clear()
        udf = search.make_embed_udf("driver-side-fake")
        fn = udf.func  # the iterator function inside the pandas_udf
        (res,) = list(fn(iter([pd.Series(["x", None, " ", "y"])])))
        assert res[0] is not None and len(res[0]) == 384
        assert res[1] is None and res[2] is None
        assert res[3] is not None
    finally:
        search._MODEL_CACHE.clear()
        if old is None:
            del sys.modules["sentence_transformers"]
        else:
            sys.modules["sentence_transformers"] = old
