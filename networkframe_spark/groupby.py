"""NodeGroupBy: grouped-subgraph iteration and block edge aggregation.

Spark-native re-expression of the reference's ``NodeGroupBy``
(reference: networkframe/groupby.py:4-161).  The aggregating consumer
(``apply_edges``) compiles to one join + one hash aggregate — Catalyst
plans partial+final aggregation with a single shuffle on the group-pair
key.  Literal iteration (``__iter__``) collects the distinct group keys
to the driver and yields lazily-built subframes; it exists for parity
and small-graph workflows, not the 100 TB path.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STRING_AGGS = {
    "size": lambda cols: [F.count(F.lit(1)).alias("size")],
    "sum": lambda cols: [F.sum(c).alias(c) for c in cols],
    "mean": lambda cols: [F.avg(c).alias(c) for c in cols],
    "max": lambda cols: [F.max(c).alias(c) for c in cols],
    "min": lambda cols: [F.min(c).alias(c) for c in cols],
    "any": lambda cols: [F.max(F.col(c).cast("boolean")).alias(c) for c in cols],
    "count": lambda cols: [F.count(c).alias(c) for c in cols],
    "std": lambda cols: [F.stddev_samp(c).alias(c) for c in cols],
}


class NodeGroupBy:
    """A grouping of a NetworkFrame by node label column(s).

    Reference: networkframe/groupby.py:4-161; created by
    ``NetworkFrame.groupby_nodes`` (networkframe.py:1000-1073).
    """

    def __init__(self, frame, by: Any, axis: str = "both", induced: bool = False):
        self._frame = frame
        self.by = by
        self._axis = axis
        self._induced = induced
        if induced and axis != "both":
            raise ValueError("Induced groupby requires axis='both'")

    # -- group metadata (reference: groupby.py:37-62, 147-161) ----------
    # The *_group_names properties enumerate distinct group keys on the
    # driver — fine for a categorical `by`, a driver OOM for a
    # high-cardinality one — so they share a loud size guard (same
    # convention as exports._MAX_DENSE_NODES).  The distributed form is
    # the `source_groups` / `target_groups` DataFrames.
    _MAX_GROUP_NAMES = 100_000

    def _group_names(self, nodes) -> list:
        by = self.by if isinstance(self.by, list) else [self.by]
        cap = self._MAX_GROUP_NAMES
        # limit(cap+1) plans as TakeOrderedAndProject: the driver never
        # receives more than cap+1 keys regardless of cardinality
        rows = (
            nodes.select(*by).distinct().orderBy(*by).limit(cap + 1).collect()
        )
        if len(rows) > cap:
            raise ValueError(
                f"group_names: more than {cap} distinct group keys for "
                f"by={self.by!r} — enumerating them driver-side would not "
                "scale; use the source_groups/target_groups DataFrames, or "
                "raise NodeGroupBy._MAX_GROUP_NAMES explicitly"
            )
        return [r[0] if len(by) == 1 else tuple(r) for r in rows]

    @property
    def source_group_names(self) -> list:
        return self._group_names(self._frame.source_nodes)

    @property
    def target_group_names(self) -> list:
        return self._group_names(self._frame.target_nodes)

    @property
    def has_source_groups(self) -> bool:
        return self._axis in ("source", "both")

    @property
    def has_target_groups(self) -> bool:
        return self._axis in ("target", "both")

    @property
    def source_groups(self) -> DataFrame:
        """Group membership: one row per group with collected node ids."""
        by = self.by if isinstance(self.by, list) else [self.by]
        return self._frame.source_nodes.groupBy(*by).agg(
            F.collect_list("id").alias("ids")
        )

    @property
    def target_groups(self) -> DataFrame:
        by = self.by if isinstance(self.by, list) else [self.by]
        return self._frame.target_nodes.groupBy(*by).agg(
            F.collect_list("id").alias("ids")
        )

    def __len__(self) -> int:
        """Group count: cartesian source x target when axis='both'
        (diagonal when induced); reference: groupby.py:42-53."""
        if self._axis == "source":
            return len(self.source_group_names)
        if self._axis == "target":
            return len(self.target_group_names)
        n_s = len(self.source_group_names)
        n_t = len(self.target_group_names)
        return n_s if self._induced else n_s * n_t

    def __iter__(self):
        """Yield ((source_group, target_group), subframe) over the
        cartesian product of groups (diagonal only when induced).

        Reference: groupby.py:64-81.  Driver-side loop over collected
        group keys; each subframe is a lazy ``loc`` block selection.
        """
        by = self.by if isinstance(self.by, list) else [self.by]
        if len(by) != 1:
            raise NotImplementedError("iteration supports a single `by` column")
        col = by[0]
        src_names = self.source_group_names
        tgt_names = self.target_group_names
        frame = self._frame
        nodes = frame.nodes

        def ids_for(val):
            return nodes.filter(F.col(col) == F.lit(val)).select("id")

        if self._axis == "source":
            for s in src_names:
                yield s, frame.loc[ids_for(s), nodes.select("id")]
        elif self._axis == "target":
            for t in tgt_names:
                yield t, frame.loc[nodes.select("id"), ids_for(t)]
        else:
            for s in src_names:
                for t in tgt_names:
                    if self._induced and s != t:
                        continue
                    yield (s, t), frame.loc[ids_for(s), ids_for(t)]

    # -- block aggregation (reference: groupby.py:91-121) ---------------
    def apply_edges(
        self, func: Union[str, Callable], columns: Optional[Any] = None
    ) -> DataFrame:
        """Aggregate edges per (source-group, target-group) block.

        String funcs compile to built-in JVM aggregates (one shuffle,
        partial+final hash agg).  Arbitrary callables run per group via
        ``applyInPandas`` — the Arrow-batched slow path.

        Returns a DataFrame keyed by ``source_{by}``/``target_{by}``.
        """
        by = self.by
        if isinstance(by, list):
            raise ValueError("Currently can only apply edges to a single group in `by`.")
        if self._axis != "both":
            raise ValueError("Currently can only apply edges when groupby is 'both'.")

        decorated = self._frame.apply_node_features(by, axis="both").edges
        keys = [f"source_{by}", f"target_{by}"]
        if columns is not None and not isinstance(columns, list):
            columns = [columns]

        if isinstance(func, str):
            if func not in _STRING_AGGS:
                raise ValueError(f"unknown aggregation '{func}'")
            if func == "size":
                cols: list = []
            elif columns is not None:
                cols = columns
            else:
                # aggregate every non-key edge attribute column
                cols = [
                    c
                    for c in self._frame.edges.columns
                    if c not in ("source", "target")
                ]
            return decorated.groupBy(*keys).agg(*_STRING_AGGS[func](cols))

        # arbitrary python callable: Arrow-batched grouped map
        import pandas as pd

        agg_cols = columns or [
            c for c in self._frame.edges.columns if c not in ("source", "target")
        ]
        sample = func(pd.DataFrame({c: [1.0] for c in agg_cols}))
        if hasattr(sample, "items"):  # Series-like: one value per column
            out_fields = ", ".join(f"`{c}` double" for c in agg_cols)
        else:  # scalar
            out_fields = "`value` double"
        key_schema = ", ".join(
            f"`{k}` {self._frame.nodes.schema[by].dataType.simpleString()}" for k in keys
        )
        schema = f"{key_schema}, {out_fields}"

        def wrap(key, pdf: pd.DataFrame) -> pd.DataFrame:
            res = func(pdf[agg_cols])
            if hasattr(res, "items"):
                row = {k: key[i] for i, k in enumerate(keys)}
                row.update({c: float(v) for c, v in res.items()})
                return pd.DataFrame([row])
            return pd.DataFrame(
                [{**{k: key[i] for i, k in enumerate(keys)}, "value": float(res)}]
            )

        return decorated.groupBy(*keys).applyInPandas(wrap, schema=schema)

    def size_edges(self) -> DataFrame:
        """Edge count per group-pair (reference: groupby.py:123-124)."""
        return self.apply_edges("size")
