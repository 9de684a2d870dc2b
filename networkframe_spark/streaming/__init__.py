"""Streaming extension over the temporal `events` table.

The reference is purely batch (SURVEY §2.9); this layer adds the
Structured-Streaming-native operations a temporal edge stream needs.
The transformation functions in :mod:`.ops` are defined on generic
DataFrames so the exact same code runs in batch (correctness oracle)
and behind ``readStream`` (production path) — the Structured Streaming
unified-API contract.
"""

from .ops import (
    session_stats,
    sessionize,
    windowed_edge_condense,
    windowed_event_counts,
)
from .stream import (
    stream_deduplicate,
    stream_edge_condense,
    stream_events_windowed,
    stream_index_add,
    stream_unique_users,
)

__all__ = [
    "sessionize",
    "session_stats",
    "windowed_event_counts",
    "windowed_edge_condense",
    "stream_events_windowed",
    "stream_edge_condense",
    "stream_deduplicate",
    "stream_unique_users",
    "stream_index_add",
]
