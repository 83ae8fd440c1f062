from .readers import (  # noqa: F401
    read_stream_transcripts,
    read_transcripts,
)
