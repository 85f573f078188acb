"""Connected-components operator unit tests (hash-to-min)."""

from openalex_neo4j_spark.operators.cc import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_chain_converges(spark):
    # long path exercises multi-iteration propagation
    pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {"n00"}


def test_self_loop_and_duplicate_edges(spark):
    got = _cc(spark, [("a", "a"), ("a", "b"), ("b", "a")])
    assert got["b"] == "a"


def test_star(spark):
    pairs = [("hub", f"leaf{i}") for i in range(20)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {"hub"}
