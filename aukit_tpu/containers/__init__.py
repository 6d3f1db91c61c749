"""containers subpackage."""
