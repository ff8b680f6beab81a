"""Command-line entry points (parity with ``learn_nerf/scripts/``)."""
