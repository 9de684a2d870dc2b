"""Export surface: dense/sparse adjacency, NetworkX, torch-geometric.

These are driver-side escape hatches for small graphs (the reference is
a single-process library, so *everything* there is "driver-side"); each
is size-guarded so the API cannot silently OOM the driver at scale.
The scale-native adjacency form is ``NetworkFrame.aggregated_edges`` —
a (source, target, weight) DataFrame with parallel edges collapsed.
"""

from __future__ import annotations

from typing import Optional

_MAX_DENSE_NODES = 20_000


def _guard(n: int, what: str, limit: int = _MAX_DENSE_NODES) -> None:
    if n > limit:
        raise ValueError(
            f"{what} would materialize {n} nodes driver-side (limit {limit}); "
            "use NetworkFrame.aggregated_edges() for the distributed form"
        )


def to_adjacency(frame, weight_col: str = "weight", aggfunc: str = "sum"):
    """Dense adjacency as a pandas DataFrame indexed by node id, zero
    fill, parallel edges aggregated (reference: networkframe.py:500-543
    pivot).  Driver-side, size-guarded."""
    import pandas as pd

    n = len(frame)
    _guard(n, "to_adjacency")
    agg = frame.aggregated_edges(
        weight_col=weight_col if weight_col in frame.edges.columns else None,
        aggfunc=aggfunc,
    ).toPandas()
    ids = [r["id"] for r in frame.nodes.select("id").collect()]
    mat = agg.pivot_table(
        index="source", columns="target", values="weight", aggfunc="sum"
    )
    mat = mat.reindex(index=ids, columns=ids).fillna(0)
    mat.index.name = None
    mat.columns.name = None
    return mat


class SparseAdjacency:
    """Minimal COO sparse matrix (numpy arrays), used when scipy is not
    installed.  Parallel edges are already collapsed upstream."""

    def __init__(self, rows, cols, vals, shape):
        self.rows, self.cols, self.vals = rows, cols, vals
        self.shape = shape
        self.nnz = len(vals)

    def toarray(self):
        import numpy as np

        out = np.zeros(self.shape)
        out[self.rows, self.cols] = self.vals
        return out

    def __getitem__(self, key):
        i, j = key
        import numpy as np

        hit = (self.rows == i) & (self.cols == j)
        return float(self.vals[hit].sum()) if hit.any() else 0.0


def to_sparse_adjacency(
    frame,
    weight_col: Optional[str] = None,
    aggfunc: str = "sum",
    format: str = "csr",
):
    """Sparse adjacency in node-id order (reference:
    networkframe.py:592-672).  The aggregation happens distributed
    (groupBy source,target); only the collapsed COO triples are
    collected.  Returns (matrix, index): a scipy matrix when scipy is
    installed, else a numpy-backed :class:`SparseAdjacency`."""
    import numpy as np

    n = len(frame)
    _guard(n, "to_sparse_adjacency", limit=5_000_000)
    ids = [r["id"] for r in frame.nodes.select("id").collect()]
    pos = {v: i for i, v in enumerate(ids)}
    agg = frame.aggregated_edges(weight_col=weight_col, aggfunc=aggfunc).collect()
    rows = np.fromiter((pos[r["source"]] for r in agg), dtype=np.int64, count=len(agg))
    cols = np.fromiter((pos[r["target"]] for r in agg), dtype=np.int64, count=len(agg))
    vals = np.fromiter((r["weight"] for r in agg), dtype=np.float64, count=len(agg))
    try:
        from scipy import sparse
    except ImportError:
        return SparseAdjacency(rows, cols, vals, (n, n)), ids
    mat = sparse.coo_matrix((vals, (rows, cols)), shape=(n, n))
    if format == "csr":
        mat = mat.tocsr()
    elif format == "lil":
        mat = mat.tolil()
    elif format == "coo":
        pass
    else:
        raise ValueError(f"unknown sparse format '{format}'")
    return mat, ids


def to_networkx(frame, create_using=None):
    """Driver-side NetworkX export with all node+edge attributes,
    including isolated nodes (reference: networkframe.py:545-590;
    default MultiDiGraph/MultiGraph)."""
    import networkx as nx

    _guard(len(frame), "to_networkx")
    if create_using is None:
        create_using = nx.MultiDiGraph if frame.directed else nx.MultiGraph
    g = nx.from_pandas_edgelist(
        frame.edges.toPandas(),
        source="source",
        target="target",
        edge_attr=True,
        create_using=create_using,
    )
    nodes_pdf = frame.nodes.toPandas().set_index("id")
    g.add_nodes_from(nodes_pdf.index)  # isolated nodes too
    nx.set_node_attributes(g, nodes_pdf.to_dict(orient="index"))
    return g


def torch_geometric_arrays(
    frame, directed: bool = True, weight_col: Optional[str] = None
):
    """The Spark-side half of :func:`to_torch_geometric`, torch-free
    so it is testable without torch installed: positional edge index
    (2 x E int64), node-id order, zero-filled numeric feature matrix
    (N x F float32), and the optional edge-weight vector.  Returns
    ``(edge_index, x, edge_weight_or_None, ids)`` as numpy arrays —
    :func:`to_torch_geometric` wraps these in tensors verbatim, so
    asserting on them covers everything up to the tensor boundary
    (reference semantics: networkframe.py:677-719)."""
    import numpy as np

    _guard(len(frame), "to_torch_geometric", limit=5_000_000)
    ids = [r["id"] for r in frame.nodes.select("id").collect()]
    pos = {v: i for i, v in enumerate(ids)}
    edges_pdf = frame.edges.toPandas()
    src = edges_pdf["source"].map(pos).to_numpy(dtype="int64")
    dst = edges_pdf["target"].map(pos).to_numpy(dtype="int64")
    if not directed:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    edge_index = np.stack([src, dst])
    nodes_pdf = frame.nodes.toPandas().set_index("id").loc[ids]
    num = nodes_pdf.select_dtypes("number").fillna(0)
    x = num.to_numpy(dtype="float32")
    edge_weight = None
    if weight_col is not None:
        w = edges_pdf[weight_col].to_numpy(dtype="float32")
        edge_weight = np.concatenate([w, w]) if not directed else w
    return edge_index, x, edge_weight, ids


def to_torch_geometric(frame, directed: bool = True, weight_col: Optional[str] = None):
    """torch-geometric export (reference: networkframe.py:677-719).
    torch is not installed in this environment; the Spark-side work
    (positional edge index, optional undirected doubling, zero-filled
    feature matrix) is done in :func:`torch_geometric_arrays` — tested
    torch-free — and handed to torch here if importable."""
    edge_index, x, edge_weight, _ = torch_geometric_arrays(
        frame, directed=directed, weight_col=weight_col
    )
    try:
        import torch
        from torch_geometric.data import Data
    except ImportError as err:  # pragma: no cover - torch absent in env
        raise NotImplementedError(
            "torch_geometric is not available in this environment"
        ) from err

    data = Data(
        x=torch.tensor(x),
        edge_index=torch.tensor(edge_index, dtype=torch.long),
    )
    if edge_weight is not None:
        data.edge_weight = torch.tensor(edge_weight)
    return data
