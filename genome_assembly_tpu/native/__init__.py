"""Native (C++) host-side components: parity replay engine, fast readers."""
