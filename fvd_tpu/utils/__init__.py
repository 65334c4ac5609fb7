"""Host-side utilities (I/O, assets)."""
