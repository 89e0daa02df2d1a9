"""End-to-end tests for the KG construction pipeline on the synthetic
deterministic corpus (FIXTURES.md §B)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from kgray.sources.pages import (
    build_alias_table,
    canonical_curie,
    generate_page,
    _render_html,
    write_corpus,
)
from kgray.stages.extract import extract_text
from kgray.stages.linking import EntityLinker
from kgray.pipelines.construct import construct_kg, triple_prf

N_PAGES = 300
N_ENTITIES = 60


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    paths = write_corpus(d, N_PAGES, num_entities=N_ENTITIES, seed=42, n_files=6)
    return paths


def test_extract_byte_identical_goldens(corpus):
    """Per-row invariant: extracted text byte-identical per url."""
    pages = pq.read_table(os.path.join(corpus["pages"]))
    expected = pq.read_table(corpus["expected_text"])
    exp = dict(zip(expected.column("url").to_pylist(), expected.column("expected_text").to_pylist()))
    for url, html in zip(pages.column("url").to_pylist(), pages.column("html").to_pylist()):
        assert extract_text(html) == exp[url], url


def test_linker_exact_and_fuzzy():
    aliases = build_alias_table(N_ENTITIES)
    linker = EntityLinker(aliases)
    assert linker.resolve("Taxon 3") == "TAX:3"
    assert linker.resolve("T-0") == "ALT:0"  # alt-CURIE alias
    assert linker.resolve("Taxxon 3") == "TAX:3"  # fuzzy via MinHash
    assert linker.resolve("Chemcial 1") == "CHEM:1"
    assert linker.resolve("Taxon 999999") is None  # unknown → dropped


def test_construct_end_to_end(corpus, tmp_path, ray_session):
    out = str(tmp_path / "kg")
    counters = construct_kg(
        corpus["pages"],
        corpus["aliases"],
        out,
        shard_group_size=2,
        actor_concurrency=(1, 2),
    )
    prf = triple_prf(os.path.join(out, "edges"), corpus["expected_triples"])
    assert prf["precision"] >= 0.95, prf
    assert prf["recall"] >= 0.95, prf
    # predicate-partitioned layout
    parts = [p for p in os.listdir(os.path.join(out, "edges")) if p.startswith("predicate=")]
    assert len(parts) >= 3
    # nodes: canonical ids only — ALT-merged entity present once
    nodes = pq.read_table(os.path.join(out, "nodes"))
    ids = nodes.column("id").to_pylist()
    assert len(ids) == len(set(ids))
    assert canonical_curie(0) == "ALT:0"
    assert "ALT:0" in ids and "TAX:0" not in ids
    # manifest recorded every shard + the materialize stage
    mf = json.load(open(os.path.join(out, "manifest.json")))
    assert len(mf["shards"]) == 3
    assert mf["stages"]["materialize"]["status"] == "done"
    assert counters["triples_rows"] > 0


def test_resume_skips_done_shards(corpus, tmp_path, ray_session, monkeypatch):
    out = str(tmp_path / "kg2")
    construct_kg(corpus["pages"], corpus["aliases"], out, shard_group_size=2, actor_concurrency=(1, 2))
    edges_before = pq.read_table(os.path.join(out, "edges"))

    # Re-run: every shard fingerprint matches → no shard re-executes.
    import kgray.pipelines.construct as C

    calls = []
    orig = C.extract_and_link_shard

    def spy(files, *a, **kw):
        calls.append(files)
        return orig(files, *a, **kw)

    monkeypatch.setattr(C, "extract_and_link_shard", spy)
    C.construct_kg(corpus["pages"], corpus["aliases"], out, shard_group_size=2, actor_concurrency=(1, 2))
    assert calls == []

    # Delete one shard's manifest entry → exactly that shard re-runs,
    # output identical (idempotent).
    from kgray.state.manifest import Manifest

    mf = Manifest(os.path.join(out, "manifest.json"))
    del mf.data["shards"]["shard=0001"]
    del mf.data["stages"]["materialize"]
    mf.save()
    C.construct_kg(corpus["pages"], corpus["aliases"], out, shard_group_size=2, actor_concurrency=(1, 2))
    assert len(calls) == 1
    edges_after = pq.read_table(os.path.join(out, "edges"))

    def rows(t):
        # `predicate` partition column reads back dictionary-encoded.
        return sorted(
            zip(
                t.column("subject").to_pylist(),
                [str(p) for p in t.column("predicate").to_pylist()],
                t.column("object").to_pylist(),
                t.column("primary_knowledge_source").to_pylist(),
            )
        )

    assert rows(edges_before) == rows(edges_after)


def test_construct_giant_kb_join_path(corpus, tmp_path, ray_session):
    """cc_broadcast_limit=0 forces the giant-KB back half: the label map
    is never collected to the driver — canonical ids are applied by hash
    join (apply_canonical_join) for both edges and nodes. Output must
    match the broadcast path's invariants exactly."""
    out = str(tmp_path / "kg_giant")
    counters = construct_kg(
        corpus["pages"],
        corpus["aliases"],
        out,
        shard_group_size=2,
        actor_concurrency=(1, 2),
        distributed_cc=True,
        cc_broadcast_limit=0,
        num_partitions=4,
    )
    prf = triple_prf(os.path.join(out, "edges"), corpus["expected_triples"])
    assert prf["precision"] >= 0.95, prf
    assert prf["recall"] >= 0.95, prf
    nodes = pq.read_table(os.path.join(out, "nodes"))
    ids = nodes.column("id").to_pylist()
    assert len(ids) == len(set(ids))
    assert "ALT:0" in ids and "TAX:0" not in ids
    assert counters["materialize.edges_rows"] > 0


def test_distributed_cc_matches_driver_uf(tmp_path, ray_session):
    """Label propagation and driver union-find agree on the alias KB."""
    import pyarrow as pa
    import ray.data
    from kgray.stages.canonical import (
        canonical_map_from_aliases,
        connected_components_distributed,
        sameas_pairs_from_alias_table,
    )

    aliases = build_alias_table(50)
    expected = canonical_map_from_aliases(aliases)
    pairs = sameas_pairs_from_alias_table(aliases)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs]),
                "dst": pa.array([p[1] for p in pairs]),
            }
        )
    )
    labels = connected_components_distributed(ds, num_partitions=2)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    # union_find omits identity entries; both maps are applied with
    # .get(x, x) — compare the effective mapping over all touched nodes.
    nodes = set(got) | set(expected)
    for n in nodes:
        assert got.get(n, n) == expected.get(n, n), n


def test_construct_empty_language_slice(corpus, tmp_path, ray_session):
    """A lang filter that matches nothing must produce a valid empty
    edges output and a KB-only node table — not crash in the reduce."""
    out = str(tmp_path / "kg_empty")
    counters = construct_kg(
        corpus["pages"],
        corpus["aliases"],
        out,
        lang="zz",  # no such pages
        shard_group_size=2,
        actor_concurrency=(1, 2),
    )
    assert counters["materialize.edges_rows"] == 0
    nodes = pq.read_table(os.path.join(out, "nodes"))
    assert nodes.num_rows > 0  # KB nodes still materialize
    ids = nodes.column("id").to_pylist()
    assert len(ids) == len(set(ids))


def test_distributed_cc_raises_on_nonconvergence(ray_session):
    """A chain whose diameter exceeds max_iters must raise loudly, not
    silently return split components (ADVICE r1)."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data
    from kgray.stages.canonical import connected_components_distributed

    n = 12
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([f"N:{i}" for i in range(n - 1)]),
                "dst": pa.array([f"N:{i+1}" for i in range(n - 1)]),
            }
        )
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components_distributed(ds, num_partitions=2, max_iters=2).take_all()
    # and with enough rounds the same chain converges to one label
    labels = connected_components_distributed(ds, num_partitions=2, max_iters=16)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert set(got.values()) == {"N:0"}


def test_distributed_cc_long_chain_log_rounds(ray_session):
    """Pointer-jump shortcutting: a 60-node chain converges well inside
    25 rounds (plain min-label propagation would need 60 — this exact
    input raised non-convergence before the shortcut)."""
    import pyarrow as pa
    import ray.data
    from kgray.stages.canonical import connected_components_distributed

    n = 60
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([f"N:{i:03d}" for i in range(n - 1)]),
                "dst": pa.array([f"N:{i+1:03d}" for i in range(n - 1)]),
            }
        )
    )
    labels = connected_components_distributed(ds, num_partitions=2, max_iters=25)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert len(got) == n and set(got.values()) == {"N:000"}


def test_linker_non_ascii_curie():
    """UTF-8 curies/aliases survive the vectorized exact path (ADVICE
    r2: numpy .astype(str) decoded as ASCII and crashed)."""
    import pyarrow as pa

    aliases = pa.table(
        {
            "alias": pa.array(["café bacterium", "Taxon 1"], type=pa.string()),
            "curie": pa.array(["TAXé:1", "TAX:1"], type=pa.string()),
            "same_as": pa.array([None, None], type=pa.string()),
            "provided_by": pa.array(["kb", "kb"], type=pa.string()),
        }
    )
    linker = EntityLinker(aliases)
    assert linker.resolve("café bacterium") == "TAXé:1"
    assert linker.resolve("Taxon 1") == "TAX:1"


def test_probe_rewrite_column_matches_dict():
    """canonical_state + probe_rewrite_column == dict .get(x, x), incl.
    values longer than any key (no truncation false-hits) and UTF-8."""
    import pyarrow as pa

    from kgray.stages.canonical import canonical_state, probe_rewrite_column

    cmap = {"TAX:10": "ALT:0", "CHEM:2": "ALT:1", "Gé:5": "ALT:2"}
    st = canonical_state(cmap)
    vals = ["TAX:10", "TAX:100", "CHEM:2", "Gé:5", "UNMAPPED:999999999", "x"]
    col = pa.chunked_array([pa.array(vals, type=pa.string())])
    got = probe_rewrite_column(col, st["key"], st["val"]).to_pylist()
    assert got == [cmap.get(v, v) for v in vals]
    assert canonical_state({}) is None


def test_cc_max_iters_validated(ray_session):
    import pytest
    import pyarrow as pa
    import ray.data

    from kgray.stages.canonical import connected_components_distributed

    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(["a"]), "dst": pa.array(["b"])})
    )
    with pytest.raises(ValueError, match="max_iters"):
        connected_components_distributed(edges, max_iters=0)
