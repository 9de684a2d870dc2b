"""networkframe_spark — a PySpark-native graph-as-two-DataFrames engine.

Re-expresses the capabilities of the reference library
``bdpedigo/networkframe`` (a pandas NetworkFrame) on Spark: lazy
DataFrame transformations, Catalyst-optimized joins/aggregates, and
driver-orchestrated iterative loops for graph algorithms — designed for
cluster scale, tested locally.

Public surface mirrors the reference's ``__init__`` exports
(reference: networkframe/__init__.py:6) plus the scale extensions
(dedup / similarity / text analysis / streaming).
"""

from .algorithms import aggregate_over_graph
from .frame import LocIndexer, NetworkFrame
from .groupby import NodeGroupBy
from .multilayer import MultilayerNetworkFrame
from .session import get_spark
from .sources import load_graph, read_table, save_graph

__all__ = [
    "NetworkFrame",
    "NodeGroupBy",
    "LocIndexer",
    "MultilayerNetworkFrame",
    "aggregate_over_graph",
    "get_spark",
    "read_table",
    "save_graph",
    "load_graph",
]

__version__ = "0.1.0"
