"""Unit tests for the pure merge kernels (pandas oracle, no Ray needed)
plus kernel/oracle agreement on the reference fixtures."""

import pandas as pd
import pytest

from kgray.kernels.kgx_agg import (
    _sorted_unique_concat_series,
    merge_edges_pandas,
    merge_nodes_pandas,
)


def test_sorted_unique_concat_basic():
    s = pd.Series(["b", "a", "b", None])
    assert _sorted_unique_concat_series(s) == "a|b"


def test_sorted_unique_concat_all_null():
    assert _sorted_unique_concat_series(pd.Series([None, None])) is None


def test_sorted_unique_concat_value_level_distinct():
    # Values containing '|' are distinct at the VALUE level, not token level
    # (STRING_AGG semantics, reference duckdb_utils.py:332).
    s = pd.Series(["A|B", "B|C", "A|B"])
    assert _sorted_unique_concat_series(s) == "A|B|B|C"


def test_merge_nodes_priority_name():
    df = pd.DataFrame(
        {
            "id": ["X:1", "X:1"],
            "name": ["zzz-nonpriority", "aaa-priority"],
            "provided_by": ["other", "onto.json"],
            "category": ["c2", "c1"],
        }
    )
    out = merge_nodes_pandas(df, priority_sources=["onto.json"])
    assert out.loc[0, "name"] == "aaa-priority"  # priority beats lexicographic max
    assert out.loc[0, "category"] == "c1|c2"
    out2 = merge_nodes_pandas(df, priority_sources=[])
    assert out2.loc[0, "name"] == "zzz-nonpriority"  # MAX fallback


def test_merge_nodes_trailing_space_preserved():
    df = pd.DataFrame(
        {"id": ["X:1"], "name": ["Kynureninase "], "provided_by": ["s"], "category": ["c"]}
    )
    out = merge_nodes_pandas(df)
    assert out.loc[0, "name"] == "Kynureninase "


def test_merge_edges_distinct_sorted():
    df = pd.DataFrame(
        {
            "subject": ["b", "a", "b"],
            "predicate": ["p", "p", "p"],
            "object": ["y", "x", "y"],
            "knowledge_source": ["k1", "k2", "k3"],
        }
    )
    out = merge_edges_pandas(df)
    assert list(out.columns) == ["subject", "predicate", "object"]
    assert out["subject"].tolist() == ["a", "b"]


def test_merge_edges_provenance():
    df = pd.DataFrame(
        {
            "subject": ["a", "a"],
            "predicate": ["p", "p"],
            "object": ["x", "x"],
            "knowledge_source": ["k2", "k1"],
        }
    )
    out = merge_edges_pandas(df, provenance=True)
    assert len(out) == 1
    assert out.loc[0, "knowledge_source"] == "k1|k2"
