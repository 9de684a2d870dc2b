"""Multilayer networks: named layers over the two-table model.

The reference DECLARES this class but ships it entirely ``pass``-bodied
and unusable (reference: networkframe/multilayer.py:4-23 — every method
body is ``pass``).  There is therefore no behavior to match; this is a
functional design in the same spirit as the rest of the engine: a
multilayer network is a dict of named :class:`NetworkFrame` layers
sharing one node-ID space, with per-layer operations, cross-layer
flattening (edges tagged with their layer — the long-format analog of a
supra-adjacency matrix), and layer-wise filtering that keeps every
operation a lazy DataFrame transformation.

Scale note: ``flatten`` is a union of edge DataFrames plus one
``row_number``-free node dedup (groupBy-min on the layer tag, keyed on
``id`` — no global window); per-layer operators delegate to the
single-layer engine and inherit its plans.
"""

from __future__ import annotations

from typing import Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .frame import NetworkFrame


class MultilayerNetworkFrame:
    """An ordered mapping of layer name -> :class:`NetworkFrame`.

    Layers share a node-ID space; a node may appear in any subset of
    layers (its attributes may differ per layer — ``flatten`` keeps the
    attributes from the alphabetically-first layer containing it, a
    deterministic choice).
    """

    def __init__(self, layers: Mapping[str, NetworkFrame]):
        if not layers:
            raise ValueError("at least one layer is required")
        self._layers = dict(sorted(layers.items()))

    # -- mapping surface ------------------------------------------------
    @property
    def layer_names(self) -> list[str]:
        return list(self._layers)

    def layer(self, name: str) -> NetworkFrame:
        return self._layers[name]

    def __getitem__(self, name: str) -> NetworkFrame:
        return self._layers[name]

    def __iter__(self) -> Iterator[tuple[str, NetworkFrame]]:
        return iter(self._layers.items())

    def __len__(self) -> int:
        return len(self._layers)

    def __repr__(self) -> str:
        parts = ", ".join(
            f"{name}={frame.n_edges}e" for name, frame in self._layers.items()
        )
        return f"MultilayerNetworkFrame({len(self._layers)} layers: {parts})"

    def add_layer(self, name: str, frame: NetworkFrame) -> "MultilayerNetworkFrame":
        if name in self._layers:
            raise ValueError(f"layer {name!r} already exists")
        return MultilayerNetworkFrame({**self._layers, name: frame})

    def drop_layer(self, name: str) -> "MultilayerNetworkFrame":
        if name not in self._layers:
            raise KeyError(name)
        remaining = {k: v for k, v in self._layers.items() if k != name}
        return MultilayerNetworkFrame(remaining)

    # -- cross-layer operations -----------------------------------------
    def flatten(self, layer_col: str = "layer") -> NetworkFrame:
        """Collapse to one :class:`NetworkFrame`: edges are the union
        of all layers tagged with ``layer_col``; nodes are deduped on
        ``id`` keeping the alphabetically-first layer's attributes
        (groupBy-min tag + semi-join back — no global window)."""
        tagged_nodes = None
        tagged_edges = None
        for name, frame in self._layers.items():
            n = frame.nodes.withColumn(layer_col, F.lit(name))
            e = frame.edges.withColumn(layer_col, F.lit(name))
            tagged_nodes = n if tagged_nodes is None else tagged_nodes.unionByName(
                n, allowMissingColumns=True
            )
            tagged_edges = e if tagged_edges is None else tagged_edges.unionByName(
                e, allowMissingColumns=True
            )
        first = tagged_nodes.groupBy("id").agg(
            F.min(layer_col).alias(layer_col)
        )
        nodes = tagged_nodes.join(first, on=["id", layer_col]).drop(layer_col)
        return NetworkFrame(nodes, tagged_edges)

    def query_nodes(self, expr: str, **kwargs) -> "MultilayerNetworkFrame":
        """Per-layer induced node filter (same expression language as
        :meth:`NetworkFrame.query_nodes`)."""
        return MultilayerNetworkFrame(
            {k: v.query_nodes(expr, **kwargs) for k, v in self._layers.items()}
        )

    def query_edges(self, expr: str, **kwargs) -> "MultilayerNetworkFrame":
        return MultilayerNetworkFrame(
            {k: v.query_edges(expr, **kwargs) for k, v in self._layers.items()}
        )

    def layer_summary(self) -> DataFrame:
        """One row per layer: ``(layer, n_nodes, n_edges)`` — lazy
        union of per-layer one-row aggregates."""
        out = None
        for name, frame in self._layers.items():
            row = (
                frame.nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
                .crossJoin(frame.edges.agg(F.count(F.lit(1)).alias("n_edges")))
                .select(F.lit(name).alias("layer"), "n_nodes", "n_edges")
            )
            out = row if out is None else out.unionByName(row)
        return out
