"""Multi-chip parallelism: mesh setup, minimizer all-to-all, halo exchange."""
