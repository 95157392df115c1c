"""Command-line drivers mirroring the reference's binaries."""
