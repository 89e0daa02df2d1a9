"""Distributed k-means over an embedding column — the clustering step
of SemDeDup-style semantic dedup and domain-mixing pipelines.

Lloyd's iterations, Ray-Data-shaped:

* **Centroids broadcast, data never moves.** Each iteration `ray.put`s
  the (k×d) centroid matrix once; every map task computes its batch's
  nearest centroids with one matmul and emits only (k×d sums, k counts)
  partials — the reduction the driver folds is O(k·d·num_batches),
  independent of corpus size. No shuffle in the whole algorithm.
* **Deterministic.** Init takes the k ROWS WITH THE SMALLEST IDS (a
  seeded-sample init would also work, but smallest-ids makes reruns and
  tests byte-stable with no RNG in the data path).
* The assignment pass at the end is one more map over the corpus.

At 100 TB: iterations stream the corpus from storage each time — cache
the (id, embedding) projection on disk/object store once (the caller
can `.materialize()` a column-pruned read) and k·d stays a few MB even
at k=64k, d=1k.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data import Dataset


def _batch_vecs(t: pa.Table, vec_col: str) -> np.ndarray:
    col = t.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    return flat.reshape(len(col), -1)


def kmeans(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iters: int = 20,
    tol: float = 1e-4,
) -> Tuple[Dataset, np.ndarray, list]:
    """Returns ``(assignments, centroids, inertia_history)`` where
    ``assignments`` is a Dataset of ``(id_col, cluster)``, ``centroids``
    is the final (k, d) float32 matrix and ``inertia_history`` the
    per-iteration total within-cluster squared distance (monotone
    non-increasing — asserted, since Lloyd's guarantees it and a
    violation means a reduction bug)."""
    proj = ds.select_columns([id_col, vec_col]).materialize()

    # Deterministic farthest-point init (greedy k-center) on a
    # content-hash sample: spread seeds across the data's extent —
    # smallest-id or first-k init degenerates when ids correlate with
    # cluster structure (all seeds in one cluster → Lloyd's collapses).
    # The sample is a deterministic hash filter (no RNG, no ordering
    # dependence), capped so the driver-side greedy is O(sample·k·d).
    n_rows = proj.count()
    if n_rows < k:
        raise ValueError(f"k={k} exceeds dataset rows ({n_rows})")
    target = max(k * 8, 2048)
    every = max(n_rows // target, 1)

    def _sample(t: pa.Table) -> pa.Table:
        import pandas as pd

        h = pd.util.hash_pandas_object(
            t.column(id_col).to_pandas(), index=False
        ).to_numpy()
        return t.filter(pa.array(h % np.uint64(every) == 0))

    samp = proj.map_batches(_sample, batch_format="pyarrow").take_all()
    if len(samp) < k:  # tiny inputs: hash filter too aggressive
        samp = proj.take_all()
    svecs = np.stack([np.asarray(r[vec_col], dtype=np.float32) for r in samp])
    sids = np.asarray([r[id_col] for r in samp])
    order = np.argsort(sids, kind="stable")  # block-order independence
    svecs = svecs[order]
    chosen = [0]
    d2min = ((svecs - svecs[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(d2min.argmax())
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((svecs - svecs[nxt]) ** 2).sum(axis=1))
    cents = svecs[chosen]

    inertia_hist: list = []
    for it in range(max_iters):
        cref = ray.put(cents)

        def _partial(t: pa.Table) -> pa.Table:
            c = ray.get(cref)  # zero-copy float32 (k, d)
            v = _batch_vecs(t, vec_col)
            # ||v-c||² = ||v||² - 2 v·cᵀ + ||c||²; argmin over c.
            d2 = (
                (v * v).sum(axis=1, keepdims=True)
                - 2.0 * (v @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            a = d2.argmin(axis=1)
            inert = float(d2[np.arange(len(v)), a].sum())
            sums = np.zeros_like(c)
            np.add.at(sums, a, v)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            # One row per centroid, tagged with its centroid id so the
            # driver fold never depends on block/batch boundaries.
            inert_col = np.zeros(len(c), np.float64)
            inert_col[0] = inert
            return pa.table({
                "cid": pa.array(np.arange(len(c), dtype=np.int64)),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.reshape(-1)), c.shape[1]),
                "counts": pa.array(counts),
                "inertia": pa.array(inert_col),
            })

        # Fold the O(k·d) partials on the driver: num_batches tiny rows.
        new_sums = np.zeros(cents.shape, dtype=np.float64)
        new_counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for b in proj.map_batches(_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            s = b.column("sums").combine_chunks().flatten().to_numpy(
                zero_copy_only=False).reshape(-1, cents.shape[1])
            cid = b.column("cid").to_numpy()
            np.add.at(new_sums, cid, s)
            np.add.at(new_counts, cid, b.column("counts").to_numpy())
            inertia += float(np.sum(b.column("inertia").to_numpy()))
        inertia_hist.append(inertia)
        if len(inertia_hist) > 1 and inertia > inertia_hist[-2] * (1 + 1e-6):
            raise AssertionError(
                f"k-means inertia increased ({inertia_hist[-2]} -> {inertia}) — "
                "partial-reduction bug")
        nonempty = new_counts > 0
        moved = cents.copy()
        moved[nonempty] = (new_sums[nonempty] / new_counts[nonempty, None]).astype(np.float32)
        shift = float(np.linalg.norm(moved - cents))
        cents = moved
        if shift < tol:
            break

    cref = ray.put(cents)

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        v = _batch_vecs(t, vec_col)
        d2 = (v * v).sum(axis=1, keepdims=True) - 2.0 * (v @ c.T) + (c * c).sum(axis=1)[None, :]
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
        })

    return proj.map_batches(_assign, batch_format="pyarrow"), cents, inertia_hist


def semantic_dedup(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    threshold: float = 0.99,
    max_iters: int = 10,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): L2-normalize, k-means-cluster, then within each
    cluster drop all but the smallest id of every connected component of
    the exact-cosine >= ``threshold`` pair graph. Returns the SURVIVOR
    ids as a Dataset of ``(id_col,)``.

    Scale shape:

    * Clustering is the shuffle-free :func:`kmeans` above (centroids
      broadcast; the corpus never moves).
    * The dedup pass is ONE hash exchange keyed on cluster id
      (``grouped_apply``): each partition receives whole clusters, so
      the exact pairwise verify + union-find is local to a task and the
      transitive-closure semantics never need a global fixpoint.
    * Per-cluster work is an (m x m) matmul — k bounds the expected
      cluster size m to n/k; pick k so m fits a task (SemDeDup uses
      k ~ sqrt(n)..n/1e4 at web scale for exactly this reason).
    * Exact-direction duplicates normalize to identical unit vectors,
      so they ALWAYS land in the same cluster — within-cluster dedup
      misses only borderline cross-cluster pairs, the documented
      SemDeDup approximation.
    """
    from kgray.kernels.hashagg import auto_partitions, grouped_apply

    def _normalize(t: pa.Table) -> pa.Table:
        v = _batch_vecs(t, vec_col).astype(np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        return pa.table({
            id_col: t.column(id_col),
            vec_col: pa.FixedSizeListArray.from_arrays(
                pa.array(v.reshape(-1), type=pa.float32()), v.shape[1]),
        })

    unit = ds.select_columns([id_col, vec_col]).map_batches(
        _normalize, batch_format="pyarrow"
    ).materialize()

    _, cents, _ = kmeans(unit, vec_col=vec_col, id_col=id_col, k=k, max_iters=max_iters)
    cref = ray.put(cents)

    def _with_cluster(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        v = _batch_vecs(t, vec_col)
        d2 = (v * v).sum(axis=1, keepdims=True) - 2.0 * (v @ c.T) + (c * c).sum(axis=1)[None, :]
        return t.append_column("cluster", pa.array(d2.argmin(axis=1).astype(np.int64)))

    tagged = unit.map_batches(_with_cluster, batch_format="pyarrow")
    nparts = num_partitions or auto_partitions(unit.size_bytes())

    def _dedup_part(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("cluster", sort=False):
            ids = g[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            m = np.stack(g[vec_col].to_numpy())[order].astype(np.float64)
            adj = (m @ m.T) >= threshold
            # Tiny union-find over local indices (transitive closure).
            parent = np.arange(len(ids))

            def find(i):
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            ra, ca = np.nonzero(np.triu(adj, 1))
            for i, j in zip(ra.tolist(), ca.tolist()):
                pi, pj = find(i), find(j)
                if pi != pj:
                    parent[max(pi, pj)] = min(pi, pj)
            roots = np.array([find(i) for i in range(len(ids))])
            # ids ascend with index, so the root IS the min-id member.
            out.append(pd.DataFrame({id_col: ids[np.unique(roots)]}))
        return pd.concat(out) if out else pd.DataFrame({id_col: df[id_col].iloc[:0]})

    return grouped_apply(tagged, ["cluster"], _dedup_part, num_partitions=nparts)


def label_centroids(
    ds,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 6,
):
    """Per-label mean embedding (class centroids) — the prototype
    vectors behind nearest-centroid classifiers, SemDeDup cluster
    summaries and drift monitors. Output: one row per (label, dim)
    with the mean value, 1-based ``dim`` (SQL array indexing).

    Scale shape: each batch folds to one (d,) sum + count per label —
    O(labels × d) driver state, no shuffle; dividing once at the end
    keeps the float behavior identical to a single AVG.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from kgray.kernels.hashagg import stable_round

    def _partials(t: pa.Table) -> pa.Table:
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        labels = t.column(label_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), vecs.shape[1] if vecs.ndim == 2 else 0))
        np.add.at(sums, inv, vecs)
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "label": pa.array(uniq),
            "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
            "n": pa.array(counts, type=pa.int64()),
        })

    acc: dict = {}
    for b in ds.select_columns([label_col, vec_col]).map_batches(
            _partials, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        ls = b.column("label").to_pylist()
        ss = b.column("sum").to_pylist()
        ns = b.column("n").to_pylist()
        for l, s, n in zip(ls, ss, ns):
            if l in acc:
                acc[l] = (acc[l][0] + np.asarray(s), acc[l][1] + n)
            else:
                acc[l] = (np.asarray(s, dtype=np.float64), n)
    rows_label, rows_dim, rows_val = [], [], []
    for l in sorted(acc):
        s, n = acc[l]
        m = s / n
        rows_label.extend([l] * len(m))
        rows_dim.extend(range(1, len(m) + 1))
        rows_val.extend(m.tolist())
    t = pa.table({
        "label": pa.array(rows_label),
        "dim": pa.array(rows_dim, type=pa.int64()),
        "mean_val": pa.array(rows_val, type=pa.float64()),
    })
    return t.set_column(2, "mean_val", stable_round(t.column("mean_val"), round_digits))
