"""Flagship pipelines: the batched WSPR window decoder."""

from .decoder import Spot, WsprDecoder, decode_window  # noqa: F401
