"""Placeholder API module (filled in with RegionEHelper in the api milestone)."""
RegionEHelper = None
BACKEND_DEFAULTS = {}
