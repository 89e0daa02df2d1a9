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


def test_discovery_sniff_merge_end_to_end(tmp_path, data_dir, ray_session):
    """Full planner→merge composition over the reference's
    naming-convention layout (reference file_utils.py:91-162 +
    merge.py:81-92 composed): the fixture rows are re-laid-out into an
    ``ontologies/`` tree whose per-file first rows sniff to the golden
    priority order, then collect_kg_paths → priority_sniff → merge_kg
    must reproduce the byte-goldens exactly."""
    import filecmp
    import os

    from kgray.pipelines.kgx_merge import merge_kg
    from kgray.sources.discovery import collect_kg_paths
    from kgray.sources.kgx_tsv import priority_sniff

    raw = tmp_path / "raw"
    onto = raw / "ontologies"
    onto.mkdir(parents=True)
    misc = raw / "misc"
    misc.mkdir()

    # Partition the two fixture node files by provided_by: each priority
    # source becomes its own ontology file (sorted prefix fixes the
    # sniff order to the golden's priority list); everything else stays
    # a plain source. Row multiset is untouched — merge is set-based.
    routes = {
        "ncbitaxon_removed_subset.json": onto / "01_ncbitaxon_nodes.tsv",
        "chebi.json": onto / "02_chebi_nodes.tsv",
        "uniprot.json": onto / "03_uniprot_nodes.tsv",
    }
    buckets = {p: [] for p in routes.values()}
    misc_rows = []
    header = None
    for src in ("test_nodes_1.tsv", "test_nodes_2.tsv"):
        lines = open(os.path.join(data_dir, src), encoding="utf-8").read().split("\n")
        header = lines[0]
        for line in lines[1:]:
            if not line:
                continue
            pb = line.split("\t")[5]
            (buckets[routes[pb]] if pb in routes else misc_rows).append(line)
    for path, rows in buckets.items():
        path.write_text("\n".join([header] + rows) + "\n", encoding="utf-8")
    (misc / "nodes.tsv").write_text("\n".join([header] + misc_rows) + "\n", encoding="utf-8")

    # The two edge fixtures have DIFFERENT headers (schema drift is the
    # union-by-name test surface) — keep them as two plain sources.
    import shutil

    shutil.copy(os.path.join(data_dir, "test_edges_1.tsv"), misc / "edges.tsv")
    misc2 = raw / "misc2"
    misc2.mkdir()
    shutil.copy(os.path.join(data_dir, "test_edges_2.tsv"), misc2 / "edges.tsv")

    node_paths, edge_paths, onto_nodes = collect_kg_paths(str(raw))
    priorities = priority_sniff(onto_nodes)
    assert priorities == [
        "ncbitaxon_removed_subset.json", "chebi.json", "uniprot.json",
    ]

    nodes_out = str(tmp_path / "nodes.tsv")
    edges_out = str(tmp_path / "edges.tsv")
    merge_kg(
        node_paths=node_paths,
        edge_paths=edge_paths,
        nodes_out_tsv=nodes_out,
        edges_out_tsv=edges_out,
        priority_sources=priorities,
    )
    assert filecmp.cmp(nodes_out, os.path.join(data_dir, "expected_nodes_merged.tsv"), shallow=False)
    assert filecmp.cmp(edges_out, os.path.join(data_dir, "expected_edges_merged.tsv"), shallow=False)
