"""Host-side utilities: torch weight conversion, image io helpers."""
