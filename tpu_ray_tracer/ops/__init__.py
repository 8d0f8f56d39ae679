"""Math ops subpackage."""
