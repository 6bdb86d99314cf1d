"""Sources: Parquet/text readers and the deterministic transcript generator.

Reference parity: stanza input operators + receivers (SURVEY.md §2.1).
The file tail/checkpoint machinery of the filelog receiver
(/root/reference/pkg/stanza/fileconsumer/file.go:23-36) maps to
``ray.data.read_parquet``/``read_text`` over immutable shards plus the
partition manifests in ``state.checkpoint``; ``generate_input``
(pkg/stanza/operator/input/generate/config.go:14) maps to the seeded
generator in ``transcripts.py``.
"""

from .transcripts import (  # noqa: F401
    generate_transcripts,
    transcripts_dataset,
    ensure_transcripts_parquet,
    rows_for_sf,
)
from .readers import (  # noqa: F401
    read_table,
    read_transcripts,
    transcripts_from_events,
    TRANSCRIPTS_FROM_EVENTS_SQL,
)
