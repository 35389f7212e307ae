"""Host-side IO: read loading with parity quirk emulation, data generation."""
