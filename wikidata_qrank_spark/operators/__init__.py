from .linking import resolve_redirects  # noqa: F401
from .links import triples  # noqa: F401
from .mentions import media_mentions, text_mentions, text_mentions_arrow  # noqa: F401
from .qrank import qrank, qviews, salted_sum  # noqa: F401
from .rank import global_row_number  # noqa: F401
from .signals import item_signals  # noqa: F401
from .bloom import bloom_build, bloom_prune  # noqa: F401
from .compaction import (  # noqa: F401
    changelog_intervals,
    compact_changelog,
    merge_upsert,
)
from .quality import constraint_summary  # noqa: F401
from .sampling import hash_sample, stratified_sample  # noqa: F401
from .sketches import hll_distinct, kmv_overlap_pairs  # noqa: F401
from .skewjoin import salted_join  # noqa: F401
