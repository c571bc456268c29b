"""Reference import-path compatibility package for ``transform.*``."""
