from .normalize import (  # noqa: F401
    PAGE_KEY_UDF_RETURNS,
    decode_domain,
    format_page_key,
    item_to_id,
    make_page_key_udf,
    parse_item,
)
