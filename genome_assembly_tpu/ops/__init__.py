"""Device-side compute ops: codecs, minimizer scans, counting, extension."""
