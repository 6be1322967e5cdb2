"""Streaming jobs: the WordCount parity pipeline over the live source."""

from .wordcount_stream import start_wordcount_stream

__all__ = ["start_wordcount_stream"]
