"""oracle subpackage."""
