"""Byte-golden conformance against the reference's test fixtures.

Mirrors reference tests/test_duckdb_utils.py:40-92: merge the two node
files / two edge files and byte-compare the outputs to the reference's
golden TSVs (filecmp.cmp shallow=False equivalent)."""

import filecmp
import os

import pytest

from kgray.pipelines.kgx_merge import merge_kg

# Priority list fixed exactly as the reference test does
# (tests/test_duckdb_utils.py:31).
PRIORITY = ["ncbitaxon_removed_subset.json", "chebi.json", "uniprot.json"]


@pytest.fixture(scope="module")
def merged(tmp_path_factory, data_dir, ray_session):
    out = tmp_path_factory.mktemp("merged")
    nodes_out = str(out / "nodes.tsv")
    edges_out = str(out / "edges.tsv")
    merge_kg(
        node_paths=[os.path.join(data_dir, "test_nodes_1.tsv"), os.path.join(data_dir, "test_nodes_2.tsv")],
        edge_paths=[os.path.join(data_dir, "test_edges_1.tsv"), os.path.join(data_dir, "test_edges_2.tsv")],
        nodes_out_tsv=nodes_out,
        edges_out_tsv=edges_out,
        priority_sources=PRIORITY,
    )
    return nodes_out, edges_out


def test_nodes_merged_byte_identical(merged, data_dir):
    nodes_out, _ = merged
    expected = os.path.join(data_dir, "expected_nodes_merged.tsv")
    with open(nodes_out) as f1, open(expected) as f2:
        got, want = f1.read(), f2.read()
    assert got == want
    assert filecmp.cmp(nodes_out, expected, shallow=False)


def test_edges_merged_byte_identical(merged, data_dir):
    _, edges_out = merged
    expected = os.path.join(data_dir, "expected_edges_merged.tsv")
    assert filecmp.cmp(edges_out, expected, shallow=False)


def test_edges_provenance_merged_byte_identical(tmp_path, data_dir, ray_session):
    """The provenance-preserving edge variant against the reference's
    historical golden (expected_edges_merged_full.tsv)."""
    nodes_out = str(tmp_path / "nodes.tsv")
    edges_out = str(tmp_path / "edges_full.tsv")
    merge_kg(
        node_paths=[os.path.join(data_dir, "test_nodes_1.tsv"), os.path.join(data_dir, "test_nodes_2.tsv")],
        edge_paths=[os.path.join(data_dir, "test_edges_1.tsv"), os.path.join(data_dir, "test_edges_2.tsv")],
        nodes_out_tsv=nodes_out,
        edges_out_tsv=edges_out,
        priority_sources=PRIORITY,
        edge_provenance=True,
    )
    expected = os.path.join(data_dir, "expected_edges_merged_full.tsv")
    assert filecmp.cmp(edges_out, expected, shallow=False)


def test_sorted_tsv_sanitizes_embedded_separators(tmp_path, ray_session):
    """Values with embedded tabs/newlines (free-text description columns
    in real KGX dumps) must not crash the QUOTE_NONE writer — they are
    collapsed to single spaces (KGX TSV has no quoting convention)."""
    import pyarrow as pa
    import ray.data

    from kgray.sources.kgx_tsv import dataset_to_sorted_tsv

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": ["B:2", "A:1"],
                "name": ["has\ttab", "has\nnewline and\r\ncrlf"],
            }
        )
    )
    out = str(tmp_path / "out.tsv")
    dataset_to_sorted_tsv(ds, out, ["id", "name"], ["id"])
    lines = open(out, encoding="utf-8").read().splitlines()
    assert lines == ["id\tname", "A:1\thas newline and crlf", "B:2\thas tab"]
