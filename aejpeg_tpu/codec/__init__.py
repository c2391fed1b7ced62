"""Codec core: quadtree planning, bitstream container, encode/decode
pipeline."""
