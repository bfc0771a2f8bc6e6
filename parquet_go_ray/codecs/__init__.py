"""Codec registry — importing this package registers all codecs.

Registry pattern after the reference's compressor registry
(reference: compress/compress.go:8-30).
"""

from . import bss, delta, dictionary, fsst, plain, rle  # noqa: F401  (register side effects)
from .base import codec_names, decode, encode, get_decoder, get_encoder, register

__all__ = [
    "codec_names",
    "decode",
    "encode",
    "get_decoder",
    "get_encoder",
    "register",
]
