"""Environment-compatibility helpers (optional-dependency shims)."""
