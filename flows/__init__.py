"""Reference import-path compatibility package for ``flows.*``."""
