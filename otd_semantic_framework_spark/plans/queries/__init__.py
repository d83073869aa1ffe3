"""Per-domain driver query modules (see _shared.py header)."""
