from .linking import resolve_redirects  # noqa: F401
from .links import triples  # noqa: F401
from .mentions import media_mentions, text_mentions, text_mentions_arrow  # noqa: F401
from .qrank import qrank, qviews, salted_sum  # noqa: F401
from .rank import global_row_number  # noqa: F401
from .signals import item_signals  # noqa: F401
