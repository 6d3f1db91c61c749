"""codecs subpackage."""
