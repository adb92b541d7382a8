"""Conversion engine — the TPU-native replacement for the reference's
``rdsd2pcm::Rdsd2Pcm`` (reference API surface: src/main.rs:27-31, 325-345,
361-393, 429; src/bin/dsd_levels/main.rs:214-223, 252).

Placeholder for M1: filled in once the device decimation core lands.
"""

from __future__ import annotations


class Converter:
    """Engine handle mirroring ``Rdsd2Pcm`` (new / from_container /
    new_level_check / do_conversion / check_level / file_name)."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("engine lands with milestone M1")
