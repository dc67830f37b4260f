"""Numeric operator layer: block-sparse storage, SpMM, spectral solvers."""
