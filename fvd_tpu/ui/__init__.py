"""Frontends: terminal status UI (and, later, a web UI)."""
