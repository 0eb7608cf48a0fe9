"""Decoding & picking: spots -> genomic loci -> chromosome traces."""

from .picking import naive_pick_spots

__all__ = ["naive_pick_spots"]
