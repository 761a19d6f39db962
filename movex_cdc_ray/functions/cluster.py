"""Duplicate-cluster assignment: connected components over a near-dup pair
graph, fully distributed (min-label propagation), plus the composed
"pairs → clusters → canonical doc" operator a dedup pipeline ends with.

A near-dup stage (MinHash/LSH, SimHash, embedding) emits PAIRS; training
pipelines need CLUSTERS (keep one doc per group of transitively-linked
dups). The component id is the MIN doc id in the component, so the
canonical survivor is ``doc_id == cluster_id``.

Scale shape: every iteration is two ``groupby`` exchanges over *edge-sized*
data (the dup graph, tiny vs the corpus), never over the corpus itself;
the corpus is touched exactly once at the end to fold in singletons.
Min-label propagation converges in ``diameter(component)`` rounds —
near-dup clusters are shallow (a hub doc links its variants), so 3-5
rounds is typical. Convergence is detected with a one-scalar aggregate:
labels only ever decrease, so the global label sum is strictly monotone
and equality between rounds == fixpoint (no expensive diff join).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min, Sum

MAX_ITERS = 50  # diameter backstop; real dup graphs converge in < 6
N_BUCKETS = 256  # coarse co-location buckets: every per-group body below is
# ONE vectorized pandas merge/filter — never a per-node/per-doc Python call


def _edge_labels(edges: rd.Dataset, labels: rd.Dataset) -> rd.Dataset:
    """Reduce-side join: for every directed edge (s, d), emit (d, lab(s)).

    Edge rows (keyed by s) and label rows (keyed by node) co-locate in
    coarse hash buckets; inside each bucket ONE vectorized pandas merge
    attaches labels to out-edges (a per-node map_groups would pay a Python
    call per graph node per round). Self-labels (node, lab) are re-emitted
    so isolated pair-nodes keep their label through the min-reduce."""

    def tag_edges(b: pa.Table) -> pa.Table:
        k = b["s"].cast(pa.int64())
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        kb = pa.array(k.to_numpy(zero_copy_only=False) % N_BUCKETS)
        return pa.table(
            {
                "k": k,
                "kb": kb,
                "d": b["d"].cast(pa.int64()),
                "lab": pa.nulls(len(b), pa.int64()),
            }
        )

    def tag_labels(b: pa.Table) -> pa.Table:
        k = b["node"].cast(pa.int64())
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        kb = pa.array(k.to_numpy(zero_copy_only=False) % N_BUCKETS)
        return pa.table(
            {
                "k": k,
                "kb": kb,
                "d": pa.nulls(len(b), pa.int64()),
                "lab": b["lab"].cast(pa.int64()),
            }
        )

    both = edges.map_batches(tag_edges, batch_format="pyarrow").union(
        labels.map_batches(tag_labels, batch_format="pyarrow")
    )

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        lab_tbl = g.loc[g["lab"].notna(), ["k", "lab"]]
        edge_tbl = g.loc[g["d"].notna(), ["k", "d"]]
        out = lab_tbl.rename(columns={"k": "node"})  # self-labels
        if not edge_tbl.empty and not lab_tbl.empty:
            m = edge_tbl.merge(lab_tbl, on="k", how="inner")
            out = pd.concat(
                [out, m[["d", "lab"]].rename(columns={"d": "node"})],
                ignore_index=True,
            )
        return out.astype({"node": "int64", "lab": "int64"})

    return both.groupby("kb").map_groups(propagate, batch_format="pandas")


def _components_local(edges: rd.Dataset) -> rd.Dataset:
    """Small-graph fast path: one bounded collect of the (already
    symmetric) edge list, then vectorized min-label propagation with
    pointer jumping in numpy — microseconds per round vs one Ray shuffle
    round, fixpoint in O(log n) rounds. Exact same result as the
    distributed path (min node id per component)."""
    import numpy as np

    tbl = pa.concat_tables(
        list(edges.iter_batches(batch_format="pyarrow"))
        or [pa.table({"s": pa.array([], pa.int64()), "d": pa.array([], pa.int64())})]
    )
    s = tbl["s"].to_numpy(zero_copy_only=False)
    d = tbl["d"].to_numpy(zero_copy_only=False)
    nodes, codes = np.unique(np.concatenate([s, d]), return_inverse=True)
    src, dst = codes[: len(s)], codes[len(s) :]
    lab = np.arange(len(nodes), dtype=np.int64)
    for _ in range(MAX_ITERS):
        new = lab.copy()
        np.minimum.at(new, dst, lab[src])  # edge relax (both directions present)
        new = np.minimum(new, new[new])  # pointer jump: label of my label
        if np.array_equal(new, lab):
            break
        lab = new
    else:
        raise RuntimeError(f"local components did not converge in {MAX_ITERS} rounds")
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "cluster_id": pa.array(nodes[lab], pa.int64()),
            }
        )
    )


def connected_components(
    pairs: rd.Dataset,
    a_col: str = "a_id",
    b_col: str = "b_id",
    local_edge_threshold: int = 2_000_000,
) -> rd.Dataset:
    """(node, cluster_id) for every node that appears in ``pairs``; the
    cluster id is the smallest node id in the connected component.

    ``pairs`` is an undirected edge list (one row per pair, either order).
    Iterates min-label propagation to fixpoint; each round shuffles only
    edge-sized data. The per-round driver cost is ONE scalar aggregate
    (the monotone label-sum convergence check).

    Dup graphs are EDGE-bounded (LSH emits few pairs relative to the
    corpus), so below ``local_edge_threshold`` symmetric edges (~32 MB of
    int64 pairs) the graph collapses to the driver-local numpy fixpoint —
    each Ray round costs ~1 s of shuffle latency that a tiny graph never
    amortizes. Set the threshold to 0 to force the distributed path."""

    def sym(b: pa.Table) -> pa.Table:
        a = b[a_col].cast(pa.int64())
        bb = b[b_col].cast(pa.int64())
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        bb = bb.combine_chunks() if isinstance(bb, pa.ChunkedArray) else bb
        return pa.table(
            {
                "s": pa.concat_arrays([a, bb]),
                "d": pa.concat_arrays([bb, a]),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()
    if edges.count() <= local_edge_threshold:
        return _components_local(edges)

    def init_labels(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["s"], "lab": b["s"]})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("lab", alias_name="lab"))
        .materialize()
    )
    prev_sum = labels.aggregate(Sum("lab", alias_name="s"))["s"]
    for _ in range(MAX_ITERS):
        labels = (
            _edge_labels(edges, labels)
            .groupby("node")
            .aggregate(Min("lab", alias_name="lab"))
            .materialize()
        )
        cur_sum = labels.aggregate(Sum("lab", alias_name="s"))["s"]
        if cur_sum == prev_sum:  # labels are non-increasing: equal sum == fixpoint
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ITERS} rounds "
            "(pathological graph diameter — raise MAX_ITERS)"
        )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "cluster_id": b["lab"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def semi_join_ids(data: rd.Dataset, ids: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """Keep ``data`` rows whose id appears in ``ids`` — a reduce-side
    distributed semi-join (tagged union + one groupby), for when the id set
    is too large to broadcast. Preserves ``data``'s columns."""
    sch = data.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        col_types = {n: base.field(n).type for n in base.names}
    else:  # pandas-block schema: numpy dtypes → arrow types (object == string)
        def _to_pa(t):
            if isinstance(t, pa.DataType):
                return t
            import numpy as np

            if t == np.dtype("O"):
                return pa.string()
            return pa.from_numpy_dtype(t)

        col_types = {n: _to_pa(t) for n, t in zip(sch.names, sch.types)}
    data_cols = [c for c in sch.names if c != id_col]

    def _kb(b: pa.Table):
        k = b[id_col].cast(pa.int64())
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return k, pa.array(k.to_numpy(zero_copy_only=False) % N_BUCKETS)

    def tag_data(b: pa.Table) -> pa.Table:
        k, kb = _kb(b)
        cols = {id_col: k, "_kb": kb, "_is_id": pa.nulls(len(b), pa.bool_())}
        for c in data_cols:
            cols[c] = b[c]
        return pa.table(cols)

    def tag_ids(b: pa.Table) -> pa.Table:
        k, kb = _kb(b)
        cols = {id_col: k, "_kb": kb, "_is_id": pa.array([True] * len(b), pa.bool_())}
        for c in data_cols:
            cols[c] = pa.nulls(len(b), col_types[c])
        return pa.table(cols)

    both = data.map_batches(tag_data, batch_format="pyarrow").union(
        ids.map_batches(tag_ids, batch_format="pyarrow")
    )

    def keep_matched(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized isin per coarse bucket — never a per-doc group call
        present = g.loc[g["_is_id"].notna(), id_col].unique()
        data_rows = g[g["_is_id"].isna()]
        return data_rows[data_rows[id_col].isin(present)].drop(columns=["_is_id", "_kb"])

    return both.groupby("_kb").map_groups(keep_matched, batch_format="pandas")


def assign_clusters(
    docs: rd.Dataset, pairs: rd.Dataset, id_col: str = "doc_id"
) -> rd.Dataset:
    """(doc_id, cluster_id, is_canonical) for EVERY document: docs in the
    dup graph get their component id, singletons are their own cluster, and
    exactly one doc per cluster (the min id) is the canonical survivor.

    One corpus-sized groupby folds the (tiny) component labels into the
    full doc set — a reduce-side left join, no broadcast of the label set."""
    comp = connected_components(pairs)

    def tag_docs(b: pa.Table) -> pa.Table:
        ids = b[id_col].cast(pa.int64())
        return pa.table({"node": ids, "lab": pa.nulls(len(b), pa.int64())})

    def tag_comp(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "lab": b["cluster_id"]})

    both = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        comp.map_batches(tag_comp, batch_format="pyarrow")
    )
    # per node: the doc row contributes node, the (optional) component row
    # contributes the label; min-reduce keeps the label when present
    # (cluster_id <= node id by construction)
    folded = both.groupby("node").aggregate(Min("lab", alias_name="clab"))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        node = b["node"]
        clab = b["clab"]
        if pa.types.is_null(clab.type):  # partition of singletons only
            clab = clab.cast(pa.int64())
        lab = pc.coalesce(clab, node)
        return pa.table(
            {
                id_col: node,
                "cluster_id": lab,
                "is_canonical": pc.equal(node, lab),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")
