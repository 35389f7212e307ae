"""Bit-parity mode: exact replication of the reference binary's behavior."""
