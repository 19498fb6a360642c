"""Chordal decomposition of sparse PSD constraints (host-side setup).

Reference: src/chordal_decomposition/ (trees.jl, clique_graph.jl,
clique_merging.jl, transformations.jl, chordal_decomposition.jl).
"""
