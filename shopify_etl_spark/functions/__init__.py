from .scalars import (  # noqa: F401
    bool_str,
    clean_id,
    get_money,
    iso_ts,
    non_empty,
    norm_sku,
    safe_num,
    strip_hash,
    tags_csv,
)
