"""Input source readers for the transcripts schema."""

from .transcripts import read_transcripts  # noqa: F401
