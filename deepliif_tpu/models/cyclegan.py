"""Placeholder: implemented later this round (see models/deepliif.py for the
flagship pattern)."""
