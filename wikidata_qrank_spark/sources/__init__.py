from .interleaved import (  # noqa: F401
    dictionary,
    docs_with_spans,
    redirects,
    spans,
)
from .tables import TABLES, load_table, load_tables  # noqa: F401
