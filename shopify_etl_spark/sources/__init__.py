from .json_raw import read_envelope, read_jsonl  # noqa: F401
