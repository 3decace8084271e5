from .incremental import stream_nodes_jsonl, stream_upsert_orders, windowed_order_counts  # noqa: F401
from .dedup_stream import stream_dedup_docs  # noqa: F401
