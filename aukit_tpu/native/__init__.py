"""Native (C++) host components, loaded via ctypes with pure-Python fallback."""
