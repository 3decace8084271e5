from .incremental import stream_nodes_jsonl, stream_upsert_orders, windowed_order_counts  # noqa: F401
