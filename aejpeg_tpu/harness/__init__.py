"""Offline analysis harness: metric sweeps, comparison vs standard JPEG
anchors, aggregation/plots, normalization-constant derivation, quadtree
visualization (parity with the reference's test/analysis suite)."""
