"""Dataset-consumption audit: an operator that consumes the same input
Dataset more than once without materializing it either re-executes the
caller's lazy upstream per consumer or — when both consumptions land in
one DAG (a union of two selections) — forks the DAG and can deadlock
Ray's sort-boundary sampling on small CPU budgets (the round-3 README
hang). This test pins the KNOWN multi-pass operators (sequential
statistics-pass → broadcast → scoring-pass designs, each consumption
its own execution) so any NEW multi-consumption site must either
materialize its input or be consciously added here with a docstring
consumption contract."""

import ast
import pathlib

SRC_METHODS = {"map_batches", "select_columns", "filter", "union", "groupby",
               "flat_map", "drop_columns", "rename_columns", "sort", "join"}

# (path, function, param): documented sequential multi-pass operators.
ALLOWED = {
    ("kgray/stages/integrity.py", "missing_endpoints", "nodes"),   # count + broadcast read (sequential)
    ("kgray/stages/relational.py", "grouped_zscore", "ds"),        # moments pass -> broadcast -> score
    ("kgray/stages/relational.py", "skyline", "ds"),               # local frontier -> membership filter
    ("kgray/stages/dedup.py", "minhash_lsh_pairs", "ds"),          # bands -> verify semi-filter (contract in minhash_lsh_dedup)
    ("kgray/stages/dedup.py", "embedding_near_dup", "ds"),         # size probe + pass
    ("kgray/stages/dedup.py", "cross_minhash_flag", "corpus"),     # union side (materialized) + final flag pass
    ("kgray/stages/corpus.py", "decontaminate", "corpus"),         # gram pass + flag pass
    ("kgray/stages/corpus.py", "unigram_nll", "ds"),               # vocab pass -> score pass
    ("kgray/stages/corpus.py", "dsir_score", "ds"),                # two model passes -> score pass
    ("kgray/stages/corpus.py", "quantile_outlier_flag", "ds"),     # quantile pass -> flag pass
    ("kgray/stages/sketch.py", "approx_quantiles", "ds"),          # sketch pass + count
    ("kgray/stages/sketch.py", "exact_quantiles_cont", "ds"),      # iterative refinement passes BY DESIGN
    ("kgray/stages/similarity.py", "knn_graph", "ds"),             # corpus broadcast + query stream
    ("kgray/kernels/hashagg.py", "grouped_apply", "ds"),           # false positive: if/else branches, one runs
}


def _scan():
    found = set()
    root = pathlib.Path(__file__).resolve().parent.parent
    for p in sorted((root / "kgray").rglob("*.py")):
        tree = ast.parse(p.read_text())
        rel = str(p.relative_to(root))
        for fn in [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]:
            params = {a.arg for a in fn.args.args
                      if a.annotation and "Dataset" in ast.unparse(a.annotation)}
            if not params:
                continue
            uses: dict = {}
            materialized = set()
            for node in ast.walk(fn):
                if (isinstance(node, ast.Attribute)
                        and isinstance(node.value, ast.Name)
                        and node.value.id in params):
                    if node.attr in SRC_METHODS:
                        uses[node.value.id] = uses.get(node.value.id, 0) + 1
                    if node.attr == "materialize":
                        materialized.add(node.value.id)
                if isinstance(node, ast.Assign):
                    for t in node.targets:
                        if isinstance(t, ast.Name) and t.id in params:
                            materialized.add(t.id)
            for name, n in uses.items():
                if n >= 2 and name not in materialized:
                    found.add((rel, fn.name, name))
    return found


def test_no_new_unmaterialized_multi_consumption():
    found = _scan()
    new = found - ALLOWED
    assert not new, (
        "New multi-consumption of a Dataset parameter without materialize "
        f"(fork/re-execution risk — see module docstring): {sorted(new)}")


def test_allowlist_is_not_stale():
    # Entries that no longer scan positive should be pruned so the
    # allowlist stays an honest inventory.
    found = _scan()
    stale = ALLOWED - found
    assert not stale, f"Prune fixed entries from ALLOWED: {sorted(stale)}"
