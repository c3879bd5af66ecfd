"""Distributed state: sharded cuckoo-filter seen-set, per-host politeness."""
