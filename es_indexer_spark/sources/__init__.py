from .readers import (  # noqa: F401
    read_stream_transcripts,
    read_transcripts,
)
from .sinks import write_corpus, write_dead_letter  # noqa: F401
